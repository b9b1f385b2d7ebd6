"""The minimal 2-level MNIST ContextUnet (MNIST_script.py:119-187), NHWC.

28x28 -> down (14) -> down (7) -> AvgPool(7) -> 1x1 hidden ->
ConvTranspose(7,7) -> up x2 with skips -> out. Down blocks are
ResConvBlock + MaxPool(2); up blocks ConvTranspose(2,2) + 2x ResConvBlock.
Context masking uses the MNIST-style flip (MNIST_script.py:170): the kept
one-hot is multiplied by -1, dropped context is zeroed.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diffusionmodel_tpu.nn.blocks import (
    EmbedFC,
    ResConvBlock,
    conv,
    gelu,
    gn_groups,
)
from diffusionmodel_tpu.nn.init import make_bias_init, torch_conv_kernel_init


def _convt(features, kernel, in_features, name, dtype):
    return nn.ConvTranspose(
        features, (kernel, kernel), strides=(kernel, kernel), padding="VALID",
        kernel_init=torch_conv_kernel_init,
        bias_init=make_bias_init(features * kernel * kernel),
        dtype=dtype, name=name,
    )


class MnistContextUnet(nn.Module):
    in_ch: int = 1
    n_feat: int = 128
    n_classes: int = 10
    img_size: int = 28
    norm: str = "batch"
    mnist_style_ctx_flip: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c, t, ctx_mask, attn_mask=None, train: bool = False):
        nf = self.n_feat
        pool = self.img_size // 4  # 28 -> 7 after two downs

        x0 = ResConvBlock(self.in_ch, nf, is_res=True, use_se=False,
                          norm=self.norm, dtype=self.dtype,
                          name="init_conv")(x, train)

        # UnetDown (MNIST): ResConvBlock + MaxPool(2).
        d = ResConvBlock(nf, nf, use_se=False, norm=self.norm, dtype=self.dtype,
                         name="down1_res")(x0, train)
        down1 = nn.max_pool(d, (2, 2), strides=(2, 2))
        d = ResConvBlock(nf, 2 * nf, use_se=False, norm=self.norm,
                         dtype=self.dtype, name="down2_res")(down1, train)
        down2 = nn.max_pool(d, (2, 2), strides=(2, 2))

        hidden = nn.avg_pool(down2, (pool, pool), strides=(pool, pool))
        hidden = gelu(hidden)

        c1h = (c[:, None] == jnp.arange(self.n_classes)[None, :]).astype(self.dtype)
        m = ctx_mask.astype(self.dtype)[:, None]
        if self.mnist_style_ctx_flip:
            # MNIST_script.py:170: flip 0<->1 then negate — ctx_mask==1 drops.
            m = -1.0 * (1.0 - m)
        cvec = c1h * m

        t = jnp.asarray(t, dtype=self.dtype).reshape(-1)
        if t.shape[0] == 1 and x.shape[0] > 1:
            t = jnp.broadcast_to(t, (x.shape[0],))

        cemb1 = EmbedFC(self.n_classes, 2 * nf, dtype=self.dtype,
                        name="contextembed1")(cvec)[:, None, None, :]
        temb1 = EmbedFC(1, 2 * nf, dtype=self.dtype,
                        name="timeembed1")(t[:, None])[:, None, None, :]
        cemb2 = EmbedFC(self.n_classes, nf, dtype=self.dtype,
                        name="contextembed2")(cvec)[:, None, None, :]
        temb2 = EmbedFC(1, nf, dtype=self.dtype,
                        name="timeembed2")(t[:, None])[:, None, None, :]

        up1 = _convt(2 * nf, pool, 2 * nf, "up0_convt", self.dtype)(hidden)
        up1 = nn.GroupNorm(num_groups=gn_groups(2 * nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="up0_gn")(up1)
        up1 = nn.relu(up1)

        # UnetUp (MNIST): cat -> ConvTranspose(2,2) -> 2x ResConvBlock.
        h = jnp.concatenate([cemb1 * up1 + temb1, down2], axis=-1)
        h = _convt(nf, 2, 4 * nf, "up1_convt", self.dtype)(h)
        h = ResConvBlock(nf, nf, use_se=False, norm=self.norm, dtype=self.dtype,
                         name="up1_res1")(h, train)
        up2 = ResConvBlock(nf, nf, use_se=False, norm=self.norm, dtype=self.dtype,
                           name="up1_res2")(h, train)

        h = jnp.concatenate([cemb2 * up2 + temb2, down1], axis=-1)
        h = _convt(nf, 2, 2 * nf, "up2_convt", self.dtype)(h)
        h = ResConvBlock(nf, nf, use_se=False, norm=self.norm, dtype=self.dtype,
                         name="up2_res1")(h, train)
        up3 = ResConvBlock(nf, nf, use_se=False, norm=self.norm, dtype=self.dtype,
                           name="up2_res2")(h, train)

        out = jnp.concatenate([up3, x0], axis=-1)
        out = conv(nf, 3, 2 * nf, dtype=self.dtype, name="out_conv1")(out)
        out = nn.GroupNorm(num_groups=gn_groups(nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="out_gn")(out)
        out = nn.relu(out)
        out = conv(self.in_ch, 3, nf, dtype=self.dtype, name="out_conv2")(out)
        return out
