"""Adaptive average pooling (torch semantics) as a matmul.

CoordAttn (new_scripy.py:119-120) applies ``F.adaptive_avg_pool2d`` to
realign the cross-direction projections from length H to length W (and vice
versa). Torch's adaptive pooling averages bins with edges
``start = floor(i*In/Out)``, ``end = ceil((i+1)*In/Out)``. On square feature
maps (the only case in this model family) it degenerates to identity, but we
implement the general op — as an (out, in) averaging matrix applied with a
matmul, which XLA maps onto the MXU.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = int(np.floor(i * in_size / out_size))
        end = int(np.ceil((i + 1) * in_size / out_size))
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """Adaptive average pool along one axis (torch bin semantics)."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    m = jnp.asarray(_adaptive_avg_matrix(in_size, out_size))
    x = jnp.moveaxis(x, axis, -1)
    x = jnp.einsum("oi,...i->...o", m, x)
    return jnp.moveaxis(x, -1, axis)
