"""Fused squeeze-excitation Pallas kernel.

The XLA version of SEBlock (new_scripy.py:143-158) materializes the pooled
vector and re-reads x to apply the scale — two full passes over the
feature map. This kernel does pool -> MLP -> sigmoid -> scale in ONE pass
per (batch, H-strip) block: x is read once from HBM and written once.

Grid: (B,). Each program handles one batch element; the feature map block
[H, W, C] lives in VMEM (the largest map in the flagship model is
128x128x192 fp32 = 12.6 MB; bf16 halves it). The two MLP matmuls ride the
MXU. Falls back to plain XLA when shapes exceed VMEM.
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

VMEM_BUDGET = 12 * 1024 * 1024


def _erf_gelu(x):
    """GELU inside Pallas kernels: this TPU lowering implements neither erf
    nor erfc, so the tanh approximation is used. Max deviation from exact
    GELU is ~3e-3 absolute — below the bf16 precision of the fused
    inference path (the training path uses the exact-GELU XLA twin)."""
    return jax.nn.gelu(x, approximate=True)


def _se_kernel(x_ref, w1_ref, w2_ref, o_ref):
    x = x_ref[0]  # [H, W, C]
    h, w, c = x.shape
    pooled = jnp.mean(x.reshape(h * w, c), axis=0, keepdims=True)  # [1, C]
    y = jnp.dot(pooled, w1_ref[:], preferred_element_type=jnp.float32)
    y = _erf_gelu(y)
    y = jnp.dot(y, w2_ref[:], preferred_element_type=jnp.float32)
    scale = jax.nn.sigmoid(y)  # [1, C]
    o_ref[0] = (x * scale[0][None, None, :]).astype(o_ref.dtype)


def se_block_xla(x, w1, w2):
    """Reference XLA implementation (matches nn/blocks.py SEBlock math)."""
    pooled = jnp.mean(x, axis=(1, 2))
    y = jax.nn.gelu(pooled @ w1, approximate=False)
    y = jax.nn.sigmoid(y @ w2)
    return x * y[:, None, None, :]


@functools.partial(jax.jit, static_argnames=("force_xla", "interpret"))
def se_block_fused(x, w1, w2, force_xla: bool = False,
                   interpret: bool = False):
    """x: [B,H,W,C]; w1: [C,R]; w2: [R,C]. Returns x * sigmoid(MLP(pool(x)))."""
    b, h, w, c = x.shape
    itemsize = jnp.dtype(x.dtype).itemsize
    # in/out blocks + the reshape copy + the scaled temp live simultaneously
    too_big = h * w * c * itemsize * 4 > VMEM_BUDGET
    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas = _HAS_PALLAS and not too_big and (on_tpu or interpret)
    if force_xla or not use_pallas:
        return se_block_xla(x, w1, w2)
    return pl.pallas_call(
        _se_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w1, w2)
