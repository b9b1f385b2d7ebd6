"""The v1.5 CBAM variant (custom_dataset.py:17-252), NHWC.

4-level U-Net with CBAM (channel + spatial attention) after each down
block. Differences from v2 (new_scripy.py): simpler UnetDown (ResConv +
conv4x4s2 + GN(8) + GELU, custom_dataset.py:98-113), ConvTranspose(2,2) up
blocks, to_vec pools down4 (S/16) to a 1x1 hidden, and up0 is
ConvTranspose(kernel=S/16). The LocalEnhancementModule has the same Q3
context-mask wiring bug as v2 (custom_dataset.py:249) — we take the spatial
mask instead.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from diffusionmodel_tpu.nn.blocks import (
    EmbedFC,
    LocalEnhancer,
    Norm,
    ResConvBlock,
    conv,
    gelu,
    gn_groups,
)
from diffusionmodel_tpu.nn.init import make_bias_init, torch_conv_kernel_init


class ChannelAttention(nn.Module):
    """avg+max pool -> shared 1x1-conv MLP -> sigmoid
    (custom_dataset.py:17-33)."""

    channels: int
    ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        red = max(1, self.channels // self.ratio)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)  # [B,1,1,C]
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        mlp1 = conv(red, 1, self.channels, use_bias=False, dtype=self.dtype,
                    name="mlp1")
        mlp2 = conv(self.channels, 1, red, use_bias=False, dtype=self.dtype,
                    name="mlp2")
        a = mlp2(nn.relu(mlp1(avg)))
        m = mlp2(nn.relu(mlp1(mx)))
        return nn.sigmoid(a + m)


class SpatialAttention(nn.Module):
    """channel-mean/max cat -> 7x7 conv -> sigmoid
    (custom_dataset.py:35-46)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = conv(1, 7, 2, dtype=self.dtype, name="conv7")(s)
        return nn.sigmoid(s)


class CBAM(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ChannelAttention(self.channels, dtype=self.dtype,
                             name="channel_attention")(x) * x
        x = SpatialAttention(dtype=self.dtype, name="spatial_attention")(x) * x
        return x


class _Down(nn.Module):
    """ResConv + conv4x4s2 + GN(8) + GELU (custom_dataset.py:98-113)."""

    in_ch: int
    out_ch: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = ResConvBlock(self.in_ch, self.out_ch, use_se=False, norm=self.norm,
                         dtype=self.dtype)(x, train)
        x = conv(self.out_ch, 4, self.out_ch, strides=2, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=gn_groups(self.out_ch, 8), epsilon=1e-5,
                         dtype=self.dtype)(x)
        return gelu(x)


class _Up(nn.Module):
    """cat -> ConvTranspose(2,2) -> 2x ResConv (custom_dataset.py:116-132)."""

    in_ch: int
    out_ch: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train=False):
        x = jnp.concatenate([x, skip], axis=-1)
        x = nn.ConvTranspose(
            self.out_ch, (2, 2), strides=(2, 2), padding="VALID",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_bias_init(self.out_ch * 4), dtype=self.dtype,
        )(x)
        x = ResConvBlock(self.out_ch, self.out_ch, use_se=False, norm=self.norm,
                         dtype=self.dtype)(x, train)
        x = ResConvBlock(self.out_ch, self.out_ch, use_se=False, norm=self.norm,
                         dtype=self.dtype)(x, train)
        return x


class CbamContextUnet(nn.Module):
    in_ch: int = 3
    n_feat: int = 128
    n_classes: int = 10
    img_size: int = 128
    norm: str = "group"
    high_thresh: float = 1.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, t, ctx_mask, attn_mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        nf = self.n_feat
        # custom_dataset.py:188 hardcodes AvgPool2d(8): at 128px the 8x8
        # down4 pools to 1x1; generalized as min(8, img/16).
        d4 = self.img_size // 16
        pool = min(8, d4)
        assert self.img_size % 16 == 0 and d4 % pool == 0

        x0 = ResConvBlock(self.in_ch, nf, is_res=True, use_se=False,
                          norm=self.norm, dtype=self.dtype,
                          name="init_conv")(x, train)
        downs = []
        h = x0
        chans = [nf, 2 * nf, 4 * nf, 8 * nf]
        in_chans = [nf, nf, 2 * nf, 4 * nf]
        for i, (ci, co) in enumerate(zip(in_chans, chans)):
            h = _Down(ci, co, norm=self.norm, dtype=self.dtype,
                      name=f"down{i+1}")(h, train)
            h = CBAM(co, dtype=self.dtype, name=f"cbam{i+1}")(h)
            downs.append(h)
        down1, down2, down3, down4 = downs

        hidden = nn.avg_pool(down4, (pool, pool), strides=(pool, pool))
        hidden = gelu(hidden)

        c1h = (c[:, None] == jnp.arange(self.n_classes)[None, :]).astype(
            self.dtype)
        cvec = c1h * ctx_mask.astype(self.dtype)[:, None]

        t = jnp.asarray(t, dtype=self.dtype).reshape(-1)
        if t.shape[0] == 1 and x.shape[0] > 1:
            t = jnp.broadcast_to(t, (x.shape[0],))

        cemb1 = EmbedFC(self.n_classes, 8 * nf, dtype=self.dtype,
                        name="contextembed1")(cvec)[:, None, None, :]
        temb1 = EmbedFC(1, 8 * nf, dtype=self.dtype,
                        name="timeembed1")(t[:, None])[:, None, None, :]
        cemb2 = EmbedFC(self.n_classes, 4 * nf, dtype=self.dtype,
                        name="contextembed2")(cvec)[:, None, None, :]
        temb2 = EmbedFC(1, 4 * nf, dtype=self.dtype,
                        name="timeembed2")(t[:, None])[:, None, None, :]

        up1 = nn.ConvTranspose(
            8 * nf, (pool, pool), strides=(pool, pool), padding="VALID",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_bias_init(8 * nf * pool * pool),
            dtype=self.dtype, name="up0_convt")(hidden)
        up1 = nn.GroupNorm(num_groups=gn_groups(8 * nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="up0_gn")(up1)
        up1 = nn.relu(up1)

        up2 = _Up(16 * nf, 4 * nf, norm=self.norm, dtype=self.dtype,
                  name="up1")(cemb1 * up1 + temb1, down4, train)
        up3 = _Up(8 * nf, 2 * nf, norm=self.norm, dtype=self.dtype,
                  name="up2")(cemb2 * up2 + temb2, down3, train)
        up4 = _Up(4 * nf, nf, norm=self.norm, dtype=self.dtype,
                  name="up3")(up3, down2, train)
        up5 = _Up(2 * nf, nf, norm=self.norm, dtype=self.dtype,
                  name="up4")(up4, down1, train)

        up5 = LocalEnhancer(nf, self.high_thresh, dtype=self.dtype,
                            act="relu",  # custom_dataset.py:160 uses ReLU
                            name="local_enhance")(up5, attn_mask)

        out = jnp.concatenate([up5, x0], axis=-1)
        out = conv(nf, 3, 2 * nf, dtype=self.dtype, name="out_conv1")(out)
        out = nn.GroupNorm(num_groups=gn_groups(nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="out_gn")(out)
        out = nn.relu(out)
        out = conv(self.in_ch, 3, nf, dtype=self.dtype, name="out_conv2")(out)
        return out
