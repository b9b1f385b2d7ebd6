"""The full ContextUnet denoiser (new_scripy.py:270-356), NHWC / flax.

Architecture (n_feat=192, img 256):
  init ResConvBlock(res) -> [UnetDown -> CoordAttn] x4
  (192@256 -> 192@128 -> 384@64 -> 768@32 -> 1536@16)
  -> to_vec = AvgPool(img/32) + GELU (16 -> 2)
  -> FiLM embeddings: cemb*h + temb at two scales (raw-scalar t/T, Q9)
  -> up0 ConvTranspose(k=img/32) + GN(8) + ReLU (2 -> 16)
  -> UnetUp x4 with skips -> LocalEnhancer (spatial mask, Q3 fix)
  -> out: cat(up5, init_x) -> conv+GN(8)+ReLU+conv -> in_ch

``pool = min(8, img_size // 16)`` generalizes the hardcoded AvgPool2d(8) /
ConvTranspose(8,8) pair: it reproduces the reference exactly at both 256px
(16x16 down4 -> 2x2 hidden) and 128px (8x8 -> 1x1), and scales the same
recipe down for the small sizes used by CPU tests and the multi-chip
dry-run.

The v1 variant (scripy_old.py:124-324) is this network without the
LocalEnhancer (``use_local_enhancer=False``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.nn.blocks import (
    EmbedFC,
    LocalEnhancer,
    Norm,
    ResConvBlock,
    UnetDown,
    UnetUp,
    conv,
    gelu,
    gn_groups,
)
from diffusionmodel_tpu.nn.coord_attn import CoordAttn
from diffusionmodel_tpu.parallel.spatial import constrain_spatial
from diffusionmodel_tpu.nn.init import make_bias_init, torch_conv_kernel_init


class ContextUnet(nn.Module):
    in_ch: int = 3
    n_feat: int = 192
    n_classes: int = 10
    img_size: int = 256
    norm: str = "group"
    attn_reduction: int = 16
    use_coord_attn: bool = True
    use_se: bool = True
    use_local_enhancer: bool = True
    high_thresh: float = 1.2
    mnist_style_ctx_flip: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    fused_upsample: bool = False
    # >0: insert spatial (H-axis) sharding constraints for big-image mesh
    # forwards — H stays split over the 'spatial' mesh axis on large maps
    # and is gathered on small ones (see parallel.spatial.constrain_spatial;
    # sub-kernel halo shards are numerically unsafe in XLA). Requires
    # tracing under a ('data','model','spatial') mesh context.
    spatial_shards: int = 0

    @nn.compact
    def __call__(self, x, c, t, ctx_mask, attn_mask: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """x: [B,H,W,C] noisy image; c: [B] int labels; t: [B] or scalar
        normalized timestep t/T; ctx_mask: [B] (1 = keep context);
        attn_mask: optional [B,H,W] spatial attention mask (training only)."""
        nf = self.n_feat
        # Reference hardcodes AvgPool2d(8) + ConvTranspose(8,8)
        # (new_scripy.py:290,298): at 256px the 16x16 down4 pools to 2x2, at
        # 128px the 8x8 down4 pools to 1x1 — both reproduced by
        # pool = min(8, img/16); smaller sizes scale the same recipe down.
        d4 = self.img_size // 16
        pool = min(8, d4)
        assert self.img_size % 16 == 0 and d4 % pool == 0, \
            "img_size must be a multiple of 16"

        x0 = ResConvBlock(self.in_ch, nf, is_res=True, use_se=self.use_se,
                          norm=self.norm, attn_reduction=self.attn_reduction,
                          dtype=self.dtype, use_pallas=self.use_pallas,
                          name="init_conv")(x, train)
        x0 = constrain_spatial(x0, self.spatial_shards)

        downs = []
        h = x0
        chans = [nf, 2 * nf, 4 * nf, 8 * nf]
        in_chans = [nf, nf, 2 * nf, 4 * nf]
        for i, (ci, co) in enumerate(zip(in_chans, chans)):
            h = UnetDown(ci, co, use_se=self.use_se, norm=self.norm,
                         attn_reduction=self.attn_reduction, dtype=self.dtype,
                         use_pallas=self.use_pallas,
                         name=f"down{i+1}")(h, train)
            if self.use_coord_attn:
                h = CoordAttn(co, self.attn_reduction, norm=self.norm,
                              dtype=self.dtype, use_pallas=self.use_pallas,
                              name=f"ca{i+1}")(h, train)
            h = constrain_spatial(h, self.spatial_shards)
            downs.append(h)
        down1, down2, down3, down4 = downs

        # to_vec: AvgPool(pool) + GELU  (16 -> 2 at img 256)
        hidden = nn.avg_pool(down4, (pool, pool), strides=(pool, pool))
        hidden = gelu(hidden)

        # Context one-hot, masked (v2: multiply by keep-mask; MNIST style
        # flips 0<->1 and negates the kept one-hot, MNIST_script.py:170).
        c1h = jnp.asarray(
            (c[:, None] == jnp.arange(self.n_classes)[None, :]), dtype=self.dtype
        )
        m = ctx_mask.astype(self.dtype)[:, None]
        if self.mnist_style_ctx_flip:
            m = -1.0 * (1.0 - m)
        cvec = c1h * m

        t = jnp.asarray(t, dtype=self.dtype).reshape(-1)
        if t.shape[0] == 1 and x.shape[0] > 1:
            t = jnp.broadcast_to(t, (x.shape[0],))

        cemb1 = EmbedFC(self.n_classes, 8 * nf, dtype=self.dtype,
                        name="ctx_emb1")(cvec)[:, None, None, :]
        temb1 = EmbedFC(1, 8 * nf, dtype=self.dtype,
                        name="time_emb1")(t[:, None])[:, None, None, :]
        cemb2 = EmbedFC(self.n_classes, 4 * nf, dtype=self.dtype,
                        name="ctx_emb2")(cvec)[:, None, None, :]
        temb2 = EmbedFC(1, 4 * nf, dtype=self.dtype,
                        name="time_emb2")(t[:, None])[:, None, None, :]

        # up0: ConvTranspose(8nf, kernel=pool, stride=pool) + GN(8) + ReLU.
        up1 = nn.ConvTranspose(
            8 * nf, (pool, pool), strides=(pool, pool), padding="VALID",
            kernel_init=torch_conv_kernel_init,
            bias_init=make_bias_init(8 * nf * pool * pool),
            dtype=self.dtype, name="up0_convt",
        )(hidden)
        up1 = nn.GroupNorm(num_groups=gn_groups(8 * nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="up0_gn")(up1)
        up1 = nn.relu(up1)
        up1 = constrain_spatial(up1, self.spatial_shards)

        up2 = UnetUp(16 * nf, 4 * nf, norm=self.norm, dtype=self.dtype,
                     fused_upsample=self.fused_upsample, name="up1")(cemb1 * up1 + temb1, down4, train)
        up2 = constrain_spatial(up2, self.spatial_shards)
        up3 = UnetUp(8 * nf, 2 * nf, norm=self.norm, dtype=self.dtype,
                     fused_upsample=self.fused_upsample, name="up2")(cemb2 * up2 + temb2, down3, train)
        up3 = constrain_spatial(up3, self.spatial_shards)
        up4 = UnetUp(4 * nf, nf, norm=self.norm, dtype=self.dtype,
                     fused_upsample=self.fused_upsample, name="up3")(up3, down2, train)
        up4 = constrain_spatial(up4, self.spatial_shards)
        up5 = UnetUp(2 * nf, nf, norm=self.norm, dtype=self.dtype,
                     fused_upsample=self.fused_upsample, name="up4")(up4, down1, train)
        up5 = constrain_spatial(up5, self.spatial_shards)

        if self.use_local_enhancer:
            up5 = LocalEnhancer(nf, self.high_thresh, dtype=self.dtype,
                                name="local_enhance")(up5, attn_mask)

        out = jnp.concatenate([up5, x0], axis=-1)
        out = conv(nf, 3, 2 * nf, dtype=self.dtype, name="out_conv1")(out)
        out = nn.GroupNorm(num_groups=gn_groups(nf, 8), epsilon=1e-5,
                           dtype=self.dtype, name="out_gn")(out)
        out = nn.relu(out)
        out = conv(self.in_ch, 3, nf, dtype=self.dtype, name="out_conv2")(out)
        return out
