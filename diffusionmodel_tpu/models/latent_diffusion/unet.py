"""Stable-Diffusion-style conditional U-Net (capability mirror of
reference/stable_diffusion/model/unet.py + unet_attention.py), NHWC / flax.

UNetModel: base 320 channels, mults (1,2,4,4), SpatialTransformer at the
configured levels, 8 heads, d_cond 768; sinusoidal time embedding
(unet.py:139-155). SpatialTransformer = GN + 1x1 in/out proj around
pre-LN blocks of self-attn -> cross-attn(cond) -> GeGLU FFN
(unet_attention.py:26-115).

TPU-first: attention is batched einsum on the MXU; ``use_flash`` switches
the softmax-attention inner loop to the Pallas flash-attention kernel
(``diffusionmodel_tpu.kernels.flash_attn``) — the blockwise-softmax
analogue of the reference's optional CUDA FlashAttention
(unet_attention.py:192-235).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def swish(x):
    return x * nn.sigmoid(x)


def sinusoidal_time_emb(t, channels: int, max_period: int = 10000):
    half = channels // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class CrossAttention(nn.Module):
    """QKV attention; self-attention when cond is None
    (unet_attention.py:118-269).

    ``use_flash`` enables the Pallas flash kernel for self-attention, but
    only at sequence lengths >= ``flash_min_seq``: the kernel measures
    1.5-2.25x at N >= 4096 and 0.98x (a small LOSS) at N <= 1024, where
    XLA's fused einsum attention already fits VMEM (benchmarks/RESULTS.md
    flash table; VERDICT r3 #7 — the ungated default taxed 256px txt2img
    ~7%). Shapes are static under jit, so the gate is trace-time free.
    """

    d_model: int
    n_heads: int
    d_head: int
    use_flash: bool = True
    flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, x, cond=None):
        has_cond = cond is not None
        c = cond if has_cond else x
        q = nn.Dense(self.n_heads * self.d_head, use_bias=False, name="to_q")(x)
        k = nn.Dense(self.n_heads * self.d_head, use_bias=False, name="to_k")(c)
        v = nn.Dense(self.n_heads * self.d_head, use_bias=False, name="to_v")(c)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.n_heads, self.d_head)
        k = k.reshape(b, m, self.n_heads, self.d_head)
        v = v.reshape(b, m, self.n_heads, self.d_head)
        if self.use_flash and not has_cond and n >= self.flash_min_seq:
            from diffusionmodel_tpu.kernels.flash_attn import flash_attention

            out = flash_attention(q, k, v)
        else:
            scale = self.d_head ** -0.5
            attn = jnp.einsum("bihd,bjhd->bhij", q, k) * scale
            attn = nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhij,bjhd->bihd", attn, v)
        out = out.reshape(b, n, self.n_heads * self.d_head)
        return nn.Dense(self.d_model, name="to_out")(out)


class GeGLU(nn.Module):
    d_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.d_out * 2, name="proj")(x)
        x, gate = jnp.split(x, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    d_model: int
    n_heads: int
    d_head: int
    use_flash: bool = True
    flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, x, cond):
        x = x + CrossAttention(self.d_model, self.n_heads, self.d_head,
                               self.use_flash, self.flash_min_seq,
                               name="attn1")(
            nn.LayerNorm(name="norm1")(x))
        x = x + CrossAttention(self.d_model, self.n_heads, self.d_head,
                               name="attn2")(
            nn.LayerNorm(name="norm2")(x), cond)
        h = nn.LayerNorm(name="norm3")(x)
        h = GeGLU(self.d_model * 4, name="geglu")(h)
        h = nn.Dense(self.d_model, name="ff_out")(h)
        return x + h


class SpatialTransformer(nn.Module):
    channels: int
    n_heads: int
    n_layers: int = 1
    use_flash: bool = True
    flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, x, cond):
        b, h, w, c = x.shape
        g = 32 if c % 32 == 0 else 1
        xin = x
        x = nn.GroupNorm(num_groups=g, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(self.channels, (1, 1), name="proj_in")(x)
        x = x.reshape(b, h * w, self.channels)
        for i in range(self.n_layers):
            x = BasicTransformerBlock(
                self.channels, self.n_heads, self.channels // self.n_heads,
                self.use_flash, self.flash_min_seq,
                name=f"block_{i}")(x, cond)
        x = x.reshape(b, h, w, self.channels)
        x = nn.Conv(self.channels, (1, 1), name="proj_out")(x)
        return x + xin


class ResBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, t_emb):
        c = x.shape[-1]
        g = 32 if c % 32 == 0 else 1
        h = nn.GroupNorm(num_groups=g, name="in_norm")(x)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="in_conv")(h)
        t = nn.Dense(self.out_ch, name="emb")(swish(t_emb))
        h = h + t[:, None, None, :]
        g2 = 32 if self.out_ch % 32 == 0 else 1
        h = nn.GroupNorm(num_groups=g2, name="out_norm")(h)
        h = swish(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    name="out_conv")(h)
        if c != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="skip")(x)
        return x + h


class UNetModel(nn.Module):
    """Latent-space eps-predictor with text cross-attention."""

    in_channels: int = 4
    out_channels: int = 4
    channels: int = 320
    n_res_blocks: int = 2
    attention_levels: Tuple[int, ...] = (0, 1, 2)
    channel_multipliers: Tuple[int, ...] = (1, 2, 4, 4)
    n_heads: int = 8
    tf_layers: int = 1
    d_cond: int = 768
    use_flash: bool = True
    flash_min_seq: int = 2048

    @nn.compact
    def __call__(self, x, t, cond):
        t_emb = sinusoidal_time_emb(t, self.channels)
        t_emb = nn.Dense(self.channels * 4, name="time_0")(t_emb)
        t_emb = nn.Dense(self.channels * 4, name="time_2")(swish(t_emb))

        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="in_conv")(x)
        skips = [x]
        for i, mult in enumerate(self.channel_multipliers):
            ch = self.channels * mult
            for j in range(self.n_res_blocks):
                x = ResBlock(ch, name=f"down_{i}_{j}_res")(x, t_emb)
                if i in self.attention_levels:
                    x = SpatialTransformer(
                        ch, self.n_heads, self.tf_layers, self.use_flash,
                        self.flash_min_seq,
                        name=f"down_{i}_{j}_attn")(x, cond)
                skips.append(x)
            if i != len(self.channel_multipliers) - 1:
                x = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            name=f"down_{i}_downsample")(x)
                skips.append(x)

        ch = self.channels * self.channel_multipliers[-1]
        x = ResBlock(ch, name="mid_res1")(x, t_emb)
        x = SpatialTransformer(ch, self.n_heads, self.tf_layers,
                               self.use_flash, self.flash_min_seq,
                               name="mid_attn")(x, cond)
        x = ResBlock(ch, name="mid_res2")(x, t_emb)

        for i, mult in reversed(list(enumerate(self.channel_multipliers))):
            ch = self.channels * mult
            for j in range(self.n_res_blocks + 1):
                x = jnp.concatenate([x, skips.pop()], axis=-1)
                x = ResBlock(ch, name=f"up_{i}_{j}_res")(x, t_emb)
                if i in self.attention_levels:
                    x = SpatialTransformer(
                        ch, self.n_heads, self.tf_layers, self.use_flash,
                        self.flash_min_seq,
                        name=f"up_{i}_{j}_attn")(x, cond)
            if i != 0:
                b, hh, ww, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"up_{i}_upsample")(x)

        g = 32 if x.shape[-1] % 32 == 0 else 1
        x = nn.GroupNorm(num_groups=g, name="out_norm")(x)
        x = swish(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       name="out_conv")(x)
