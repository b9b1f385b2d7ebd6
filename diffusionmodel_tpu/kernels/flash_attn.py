"""Blockwise (flash) attention Pallas kernel.

The TPU analogue of the reference's optional CUDA FlashAttention in the
Stable-Diffusion cross-attention (reference/stable_diffusion/model/
unet_attention.py:157-235) and of its memory-saving half-batch softmax
fallback (:256-259): online-softmax over K/V blocks so the [N, N] score
matrix never materializes in HBM — O(N) memory in sequence length, MXU
matmuls per tile.

Layout: q, k, v are [B, N, H, D] (heads folded into the grid). Q is tiled
into blocks of ``block_q``; each program streams K/V in ``block_k`` chunks
with running (max, sum, acc) state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int):
    q = q_ref[0].astype(jnp.float32)  # [Bq, D]
    n_k = k_ref.shape[1]
    d = q.shape[-1]
    scale = d ** -0.5
    q = q * scale

    num_kb = pl.cdiv(n_k, block_k)

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [Bq, Bk]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc = jnp.zeros_like(q)
    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def attention_xla(q, k, v):
    """Reference einsum attention, [B,N,H,D] layout."""
    d = q.shape[-1]
    attn = jnp.einsum("bihd,bjhd->bhij", q, k) * (d ** -0.5)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhij,bjhd->bihd", attn, v)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "force_xla", "interpret"))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512,
                    force_xla: bool = False, interpret: bool = False):
    """q: [B,N,H,D]; k, v: [B,M,H,D]. Returns [B,N,H,D]."""
    b, n, h, d = q.shape
    m = k.shape[1]
    on_tpu = jax.devices()[0].platform == "tpu"
    block_q = min(block_q, n)
    block_k = min(block_k, m)
    divisible = n % block_q == 0 and m % block_k == 0
    use_pallas = _HAS_PALLAS and divisible and (on_tpu or interpret)
    if force_xla or not use_pallas:
        return attention_xla(q, k, v)

    # fold heads into batch: [B*H, N, D]
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, n, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, m, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, m, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct(qf.shape, q.dtype),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
