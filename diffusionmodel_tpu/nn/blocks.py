"""ContextUnet building blocks (NHWC, flax.linen).

Re-designs of the reference blocks (new_scripy.py:143-268) for TPU: NHWC
layout, GroupNorm default (BatchNorm behind the ``norm="batch"`` parity
flag, SURVEY Q2), exact GELU (torch nn.GELU default), align-corners bilinear
upsampling expressed as MXU matmuls.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from diffusionmodel_tpu.nn.init import (
    make_bias_init,
    torch_conv_kernel_init,
    torch_linear_kernel_init,
)
from diffusionmodel_tpu.ops.resize import upsample_bilinear_align_corners


def gelu(x):
    # torch nn.GELU() default is the exact erf formulation.
    return nn.gelu(x, approximate=False)


def gn_groups(channels: int, preferred: int = 8) -> int:
    """Largest divisor of ``channels`` that is <= preferred."""
    g = max(1, min(preferred, channels))
    while channels % g != 0:
        g -= 1
    return g


class Norm(nn.Module):
    """GroupNorm (TPU default) or BatchNorm (reference parity, Q2)."""

    kind: str = "group"
    groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "group":
            c = x.shape[-1]
            return nn.GroupNorm(
                num_groups=gn_groups(c, self.groups), epsilon=1e-5, dtype=self.dtype
            )(x)
        elif self.kind == "batch":
            # torch BatchNorm2d: momentum 0.1 (flax: 0.9), eps 1e-5.
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        raise ValueError(f"unknown norm kind {self.kind!r}")


def conv(features: int, kernel: int, in_features: int, *, strides=1, name=None,
         dtype=jnp.float32, use_bias: bool = True):
    """Conv2d with torch default init and SAME-style explicit padding."""
    pad = (kernel - 1) // 2 if kernel % 2 == 1 else max(kernel // 2 - 1, 0)
    fan_in = in_features * kernel * kernel
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(strides, strides),
        padding=((pad, pad), (pad, pad)),
        kernel_init=torch_conv_kernel_init,
        bias_init=make_bias_init(fan_in),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


def dense(features: int, in_features: int, *, use_bias=True, name=None,
          dtype=jnp.float32):
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=make_bias_init(in_features),
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )


class EmbedFC(nn.Module):
    """Linear -> GELU -> Linear over a flattened input (new_scripy.py:255-268).

    Used for the raw-scalar time embedding t/T (input_dim=1, SURVEY Q9 — no
    sinusoidal embedding in the main model) and the one-hot class embedding.
    """

    input_dim: int
    emb_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(-1, self.input_dim)
        x = dense(self.emb_dim, self.input_dim, dtype=self.dtype)(x)
        x = gelu(x)
        x = dense(self.emb_dim, self.emb_dim, dtype=self.dtype)(x)
        return x


class _DenseKernel(nn.Module):
    """Bias-free Dense parameter holder: registers the same tree entry as
    nn.Dense (name/kernel) but returns the raw kernel, so fused Pallas paths
    and the XLA path share one parameter layout."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", torch_linear_kernel_init,
                          (self.in_dim, self.out_dim))


class SEBlock(nn.Module):
    """Squeeze-excitation (new_scripy.py:143-158): global avg-pool ->
    Linear(C->C/r, no bias) -> GELU -> Linear(->C, no bias) -> sigmoid scale.

    With ``use_pallas`` the inference path runs the fused single-pass kernel
    (kernels/se_block.py); training keeps the XLA path (differentiable),
    sharing the identical parameter tree."""

    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        red = max(1, self.channels // self.reduction)
        k1 = _DenseKernel(self.channels, red, name="Dense_0")()
        k2 = _DenseKernel(red, self.channels, name="Dense_1")()
        if self.use_pallas and not train:
            from diffusionmodel_tpu.kernels.se_block import se_block_fused

            return se_block_fused(x, k1, k2)
        y = jnp.mean(x, axis=(1, 2)).astype(self.dtype)  # [B, C]
        y = gelu(y @ k1.astype(self.dtype))
        y = nn.sigmoid(y @ k2.astype(self.dtype))
        return x * y[:, None, None, :]


class LocalEnhancer(nn.Module):
    """High-attention region enhancement (new_scripy.py:161-174).

    ``x + conv3x3-GN(8)-GELU-conv3x3(x) * (mask > high_thresh)``.

    Q3 (SURVEY 2.10): the reference wires the [B, n_classes] *context* mask
    here, which cannot broadcast against the feature map (crashes as
    written). We take the spatial attention mask [B, H, W]; when ``mask`` is
    None (sampling — no bbox exists), the enhancement branch is gated off.
    """

    channels: int
    high_thresh: float = 1.2
    dtype: jnp.dtype = jnp.float32
    act: str = "gelu"  # v2 uses GELU (new_scripy.py:168); v1.5 ReLU

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        h = conv(self.channels, 3, self.channels, dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=gn_groups(self.channels, 8), epsilon=1e-5,
                         dtype=self.dtype)(h)
        h = gelu(h) if self.act == "gelu" else nn.relu(h)
        h = conv(self.channels, 3, self.channels, dtype=self.dtype)(h)
        if mask is None:
            return x
        gate = (mask > self.high_thresh).astype(x.dtype)[..., None]
        return x + h * gate


class ResConvBlock(nn.Module):
    """2x (conv3x3 + Norm + GELU) with optional SE + residual /1.414
    (new_scripy.py:176-209; MNIST variant has no SE)."""

    in_ch: int
    out_ch: int
    is_res: bool = False
    use_se: bool = True
    norm: str = "group"
    attn_reduction: int = 16
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x1 = conv(self.out_ch, 3, self.in_ch, dtype=self.dtype)(x)
        x1 = Norm(self.norm, dtype=self.dtype)(x1, train)
        x1 = gelu(x1)
        x2 = conv(self.out_ch, 3, self.out_ch, dtype=self.dtype)(x1)
        x2 = Norm(self.norm, dtype=self.dtype)(x2, train)
        x2 = gelu(x2)
        if self.is_res:
            if self.use_se:
                x2 = SEBlock(self.out_ch, self.attn_reduction,
                             dtype=self.dtype,
                             use_pallas=self.use_pallas)(x2, train)
            out = (x + x2) if self.in_ch == self.out_ch else (x1 + x2)
            return out / 1.414
        return x2


class UnetDown(nn.Module):
    """Down block (new_scripy.py:211-235): 1x1 compress (C/4) -> 1x1 adjust
    -> conv3x3 -> ResConvBlock(res) -> 4x4 stride-2 downsample."""

    in_ch: int
    out_ch: int
    compress_ratio: int = 4
    use_se: bool = True
    norm: str = "group"
    attn_reduction: int = 16
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cc = self.in_ch // self.compress_ratio
        x = conv(cc, 1, self.in_ch, dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        x = gelu(x)
        x = conv(self.out_ch, 1, cc, dtype=self.dtype)(x)
        x = conv(self.out_ch, 3, self.out_ch, dtype=self.dtype)(x)
        x = Norm(self.norm, dtype=self.dtype)(x, train)
        x = gelu(x)
        x = ResConvBlock(self.out_ch, self.out_ch, is_res=True, use_se=self.use_se,
                         norm=self.norm, attn_reduction=self.attn_reduction,
                         dtype=self.dtype, use_pallas=self.use_pallas)(x, train)
        x = conv(self.out_ch, 4, self.out_ch, strides=2, dtype=self.dtype)(x)
        return x


class _Conv3x3Params(nn.Module):
    """Registers kernel/bias with nn.Conv's exact tree layout and torch
    inits, for paths that consume the weights directly (fused upsample).
    Named "Conv_0" at the call site so checkpoints trained with either
    path load into the other unchanged."""

    out_ch: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_conv_kernel_init,
                            (3, 3, self.in_ch, self.out_ch), jnp.float32)
        bias = self.param("bias", make_bias_init(self.in_ch * 9),
                          (self.out_ch,), jnp.float32)
        return kernel, bias


class UnetUp(nn.Module):
    """Up block (new_scripy.py:237-253): cat(x, skip) -> bilinear x2
    (align_corners=True) -> conv3x3 -> 2x ResConvBlock.

    ``fused_upsample=True`` computes the SAME upsample+conv pair through
    the exact algebraic fusion in ops/fused_upconv.py (the 3x3 conv runs
    at half the rows; the 4x-resolution C_in intermediate is never
    materialized) — identical parameters, checkpoint-compatible."""

    in_ch: int
    out_ch: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        x = jnp.concatenate([x, skip], axis=-1)
        if self.fused_upsample:
            from diffusionmodel_tpu.ops.fused_upconv import (
                up2_conv3x3_align_corners,
            )

            kernel, bias = _Conv3x3Params(self.out_ch, self.in_ch,
                                          name="Conv_0")()
            x = up2_conv3x3_align_corners(
                x.astype(self.dtype), kernel.astype(self.dtype),
                bias.astype(self.dtype))
        else:
            x = upsample_bilinear_align_corners(x, 2)
            x = conv(self.out_ch, 3, self.in_ch, dtype=self.dtype,
                     name="Conv_0")(x)
        x = ResConvBlock(self.out_ch, self.out_ch, norm=self.norm,
                         dtype=self.dtype)(x, train)
        x = ResConvBlock(self.out_ch, self.out_ch, norm=self.norm,
                         dtype=self.dtype)(x, train)
        return x
