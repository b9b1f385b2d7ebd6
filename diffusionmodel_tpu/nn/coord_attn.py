"""Coordinate attention (new_scripy.py:70-140; annotated original
scripy_old.py:18-104), NHWC.

Directional pooled statistics (mean over W -> [B,H,1,C], mean over H ->
[B,1,W,C]) pass through 1x1 convs + Norm + GELU, exchange information via a
cross-direction projection (permute + torch-semantics adaptive average
pooling, which is a transpose on the square maps this net produces), and
produce two sigmoid attention maps combined with normalized learnable
weights sigmoid(alpha)/sigmoid(beta).

All 1x1 convs here are channel matmuls — XLA fuses the whole block into a
handful of MXU calls; a fully fused single-pass Pallas kernel lives in
``diffusionmodel_tpu.kernels.coord_attn``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from diffusionmodel_tpu.nn.blocks import Norm, conv, gelu
from diffusionmodel_tpu.ops.pool import adaptive_avg_pool_axis


class _ConvParams(nn.Module):
    """1x1-conv parameter holder (same tree entries as nn.Conv)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        from diffusionmodel_tpu.nn.init import (
            make_bias_init,
            torch_conv_kernel_init,
        )

        k = self.param("kernel", torch_conv_kernel_init,
                       (1, 1, self.in_dim, self.out_dim))
        b = self.param("bias", make_bias_init(self.in_dim), (self.out_dim,))
        return k, b


class _GNParams(nn.Module):
    """GroupNorm scale/bias holder nested as Norm/GroupNorm_0 (same tree as
    the Norm wrapper module)."""

    dim: int

    @nn.compact
    def __call__(self):
        class _Inner(nn.Module):
            dim: int

            @nn.compact
            def __call__(self):
                return (self.param("scale", nn.initializers.ones, (self.dim,)),
                        self.param("bias", nn.initializers.zeros, (self.dim,)))

        return _Inner(self.dim, name="GroupNorm_0")()


class CoordAttn(nn.Module):
    channels: int
    reduction: int = 16
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_pallas and self.norm == "group":
            return self._fused_path(x, train)
        identity = x
        n, h, w, c = x.shape
        red = max(1, self.channels // self.reduction)

        # Directional pools: pool_h keeps H (mean over W), pool_w keeps W.
        x_h = jnp.mean(x, axis=2, keepdims=True)  # [B, H, 1, C]
        x_w = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, W, C]

        x_h = conv(red, 1, c, dtype=self.dtype, name="conv1_h")(x_h)
        x_h = Norm(self.norm, dtype=self.dtype, name="bn1_h")(x_h, train)
        x_h = gelu(x_h)

        x_w = conv(red, 1, c, dtype=self.dtype, name="conv1_w")(x_w)
        x_w = Norm(self.norm, dtype=self.dtype, name="bn1_w")(x_w, train)
        x_w = gelu(x_w)

        # Cross-direction interaction.
        h2w = conv(red, 1, red, dtype=self.dtype, name="h2w_proj")(x_h)  # [B,H,1,R]
        w2h = conv(red, 1, red, dtype=self.dtype, name="w2h_proj")(x_w)  # [B,1,W,R]

        # torch permute(0,1,3,2) on NCHW swaps H<->W; in NHWC that is a
        # transpose of the two spatial axes.
        h2w_r = jnp.swapaxes(h2w, 1, 2)  # [B, 1, H, R]
        w2h_r = jnp.swapaxes(w2h, 1, 2)  # [B, W, 1, R]
        # adaptive_avg_pool2d(h2w_r, (1, w)): realign length H -> W.
        h2w_adapted = adaptive_avg_pool_axis(h2w_r, w, axis=2)  # [B, 1, W, R]
        w2h_adapted = adaptive_avg_pool_axis(w2h_r, h, axis=1)  # [B, H, 1, R]

        gamma_h = nn.sigmoid(self.param("gamma_h", nn.initializers.zeros, (1,)))
        gamma_w = nn.sigmoid(self.param("gamma_w", nn.initializers.zeros, (1,)))
        x_h = x_h + gamma_h * w2h_adapted
        x_w = x_w + gamma_w * h2w_adapted

        a_h = nn.sigmoid(conv(c, 1, red, dtype=self.dtype, name="conv_h")(x_h))
        a_w = nn.sigmoid(conv(c, 1, red, dtype=self.dtype, name="conv_w")(x_w))

        alpha = nn.sigmoid(self.param("alpha", nn.initializers.zeros, (1,)))
        beta = nn.sigmoid(self.param("beta", nn.initializers.zeros, (1,)))
        s = alpha + beta + 1e-8
        attention = (alpha / s) * a_h + (beta / s) * a_w  # broadcasts to [B,H,W,C]
        return identity * attention

    def _fused_path(self, x, train: bool):
        """Pallas-fused CoordAttn (kernels/coord_attn.py) with the identical
        parameter tree; training uses the differentiable XLA twin on the
        same parameters."""
        from diffusionmodel_tpu.kernels.coord_attn import (
            CoordAttnWeights,
            coord_attn_fused,
            coord_attn_xla,
        )
        from diffusionmodel_tpu.nn.blocks import gn_groups

        c = self.channels
        red = max(1, c // self.reduction)
        k1h, b1h = _ConvParams(c, red, name="conv1_h")()
        k1w, b1w = _ConvParams(c, red, name="conv1_w")()
        nh_s, nh_b = _GNParams(red, name="bn1_h")()
        nw_s, nw_b = _GNParams(red, name="bn1_w")()
        kh2w, bh2w = _ConvParams(red, red, name="h2w_proj")()
        kw2h, bw2h = _ConvParams(red, red, name="w2h_proj")()
        kh, bh = _ConvParams(red, c, name="conv_h")()
        kw, bw = _ConvParams(red, c, name="conv_w")()
        gamma_h = self.param("gamma_h", nn.initializers.zeros, (1,))
        gamma_w = self.param("gamma_w", nn.initializers.zeros, (1,))
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        beta = self.param("beta", nn.initializers.zeros, (1,))
        wts = CoordAttnWeights.from_arrays(
            k1h, b1h, k1w, b1w, nh_s, nh_b, nw_s, nw_b, kh2w, bh2w,
            kw2h, bw2h, kh, bh, kw, bw, gamma_h, gamma_w, alpha, beta)
        g = gn_groups(red, 8)
        if train:
            return coord_attn_xla(x, wts, "group", g)
        return coord_attn_fused(x, wts, "group", g)
