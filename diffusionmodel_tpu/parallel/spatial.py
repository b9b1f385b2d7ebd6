"""Spatial (context-parallel analogue) sharding helpers.

The reference has no sequence axis; the long-context analogue for this
image family (SURVEY 5.7) is sharding the H axis of large feature maps
across the mesh and computing the global/per-axis pooled statistics that
SEBlock/CoordAttn need with ``psum`` collectives over ICI, via
``shard_map``. These helpers implement that pattern:

- ``sharded_global_mean``: mean over (H, W) with H sharded — each chip
  reduces its H-slab locally, then one psum.
- ``sharded_se_block``: the full SEBlock with H-sharded activations; the
  tiny MLP runs replicated, the scale applies locally (zero extra
  communication beyond the single psum).
- ``sharded_directional_pools``: CoordAttn's (H,1)/(1,W) pools with H
  sharded — the W-pool needs a psum over the H shards; the H-pool is
  purely local and stays sharded.

Role in the framework: the PRODUCTION path for spatially-sharded forwards
is GSPMD — ``parallel.mesh.image_sharding`` lays an NHWC batch out with H
over the 'spatial' mesh axis and XLA inserts the conv halo exchanges and
pooled-statistic psums automatically (wired into ``trainer.make_sampler``
via ``TrainConfig.mesh_spatial``). These shard_map helpers are the
EXECUTABLE SPEC of those collective semantics: tests assert the GSPMD
forward matches both the unsharded forward and these explicit-psum
formulations, and they remain the building blocks for custom Pallas
kernels that need explicit collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_global_mean(mesh: Mesh, x, axis_name: str = "data"):
    """x: [B, H, W, C] with H sharded over ``axis_name`` -> [B, C]."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(),
    )
    def f(xs):
        local = jnp.sum(xs, axis=(1, 2))  # [B, C] partial sums
        total = jax.lax.psum(local, axis_name)
        h_total = xs.shape[1] * jax.lax.psum(1, axis_name)
        return total / (h_total * xs.shape[2])

    return f(x)


def sharded_se_block(mesh: Mesh, x, w1, w2, axis_name: str = "data"):
    """SEBlock with H-sharded activations: one psum, local scale apply."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(), P()),
        out_specs=P(None, axis_name, None, None),
    )
    def f(xs, w1, w2):
        local = jnp.sum(xs, axis=(1, 2))
        total = jax.lax.psum(local, axis_name)
        h_total = xs.shape[1] * jax.lax.psum(1, axis_name)
        pooled = total / (h_total * xs.shape[2])
        y = jax.nn.gelu(pooled @ w1, approximate=False)
        y = jax.nn.sigmoid(y @ w2)
        return xs * y[:, None, None, :]

    return f(x, w1, w2)


def sharded_directional_pools(mesh: Mesh, x, axis_name: str = "data"):
    """CoordAttn pools with H sharded: returns (x_h [B,H,C] H-sharded,
    x_w [B,W,C] replicated)."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=(P(None, axis_name, None), P()),
    )
    def f(xs):
        x_h = jnp.mean(xs, axis=2)  # [B, h_local, C] — local, stays sharded
        partial_w = jnp.sum(xs, axis=1)  # [B, W, C]
        h_total = xs.shape[1] * jax.lax.psum(1, axis_name)
        x_w = jax.lax.psum(partial_w, axis_name) / h_total
        return x_h, x_w

    return f(x)


def constrain_spatial(x, spatial_shards: int, min_rows: int = 8):
    """Sharding constraint for NHWC activations inside a spatially-sharded
    forward: keep H split over the 'spatial' mesh axis while every shard
    holds >= ``min_rows`` rows; GATHER H (replicate over 'spatial') below
    that. Small maps are cheap to replicate, and XLA's conv halo exchange
    with sub-kernel shards (e.g. 1 row/chip under a 4x4 kernel) is both
    slow and NUMERICALLY WRONG (observed max|d|~1.9 on XLA:CPU; verified
    by tests/test_train_and_sharding.py). No-op when spatial_shards <= 1.

    Must be traced under a mesh context (``with mesh:``) whose axes include
    'data'/'spatial' — true for trainer.fit and make_sampler paths.
    """
    if spatial_shards <= 1:
        return x
    h = x.shape[1]
    spatial = "spatial" if h // spatial_shards >= min_rows else None
    return jax.lax.with_sharding_constraint(x, P("data", spatial))
