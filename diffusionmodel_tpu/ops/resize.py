"""Bilinear resize with align_corners=True semantics, as matmuls.

The reference up-path uses ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` (new_scripy.py:242). ``jax.image.resize`` implements
half-pixel-center sampling only, so we build the (out, in) interpolation
matrix once per shape and apply it along H and W with two matmuls — which
rides the MXU instead of gather lanes, the TPU-friendly formulation.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=64)
def _align_corners_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix M [out, in]: y = M @ x matches torch's
    F.interpolate(mode='bilinear', align_corners=True) along one axis."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1:
        m[:, 0] = 1.0
        return m
    if out_size == 1:
        m[0, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        m[i, lo] += 1.0 - frac
        m[i, hi] += frac
    return m


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Upsample NHWC ``x`` by integer ``scale`` with align_corners=True."""
    n, h, w, c = x.shape
    mh = jnp.asarray(_align_corners_matrix(h, h * scale))
    mw = jnp.asarray(_align_corners_matrix(w, w * scale))
    # [N,H,W,C]: contract H then W on the MXU.
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("ow,nhwc->nhoc", mw, x)
    return x


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """General align_corners=True bilinear resize for NHWC tensors."""
    n, h, w, c = x.shape
    mh = jnp.asarray(_align_corners_matrix(h, out_h))
    mw = jnp.asarray(_align_corners_matrix(w, out_w))
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("ow,nhwc->nhoc", mw, x)
    return x
