"""Device mesh + sharding rules.

The reference has no distributed support at all (SURVEY 2.9: single
"cuda:0", no torch.distributed). This module is the new TPU-native
parallelism layer:

- a 2-axis ``Mesh`` ``('data', 'model')``;
- batch tensors sharded on ``data`` (pjit inserts the gradient psum);
- large conv/linear kernels sharded on their output-channel dim across
  ``model`` (tensor parallelism); XLA's sharding propagation lays out the
  activations and inserts the collectives over ICI;
- optimizer state partitioned across ``data`` (ZeRO-1,
  ``opt_state_shardings``, enabled by ``train.zero1``): GSPMD turns the
  gradient psum into a reduce-scatter into each chip's moment shard and
  all-gathers the fresh params.

At the reference's 353M-param scale one v5e-8 slice holds everything, so
``model=1`` (pure DP) is the default; the TP axis exists and is exercised by
tests/dry-runs so scaling up is a config change, not a rewrite.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, spatial: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """3-axis mesh ('data', 'model', 'spatial'). The 'spatial' axis shards
    the H dimension of large feature maps (the context-parallel analogue,
    SURVEY 5.7): GSPMD spatially partitions the convolutions with halo
    exchanges and psums the global pooled statistics — semantics validated
    against the explicit shard_map helpers in ``parallel.spatial``."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (model * spatial) == 0, (
            f"{n} devices not divisible by model*spatial={model * spatial}")
        data = n // (model * spatial)
    assert data * model * spatial <= n, (
        f"mesh {data}x{model}x{spatial} needs more than {n} devices")
    dev = np.asarray(devices[: data * model * spatial]).reshape(
        data, model, spatial)
    return Mesh(dev, ("data", "model", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int, batch_axis: int = 0) -> NamedSharding:
    """Shard axis ``batch_axis`` over 'data', replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def image_sharding(mesh: Mesh, ndim: int = 4, batch_axis: int = 0,
                   h_axis: int = 1) -> NamedSharding:
    """Shard an NHWC image batch over 'data' (batch) AND 'spatial' (H) —
    the big-image forward layout: each chip holds an H-slab, XLA inserts
    conv halo exchanges and pooled-statistic psums over ICI."""
    spec = [None] * ndim
    spec[batch_axis] = "data"
    spec[h_axis] = "spatial"
    return NamedSharding(mesh, P(*spec))


def _leaf_spec(path: str, shape, model_size: int, min_channels: int) -> P:
    """Tensor-parallel rule: shard the output-feature dim of big kernels."""
    if model_size <= 1 or len(shape) < 2:
        return P()
    out = shape[-1]
    if out % model_size == 0 and out >= min_channels:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def opt_state_shardings(mesh: Mesh, opt_state: Any, min_size: int = 1 << 14):
    """ZeRO-1: partition optimizer-state leaves across the 'data' axis.

    The reference trains single-device (SURVEY 2.9) so this has no
    counterpart there; it is the TPU-native optimizer-state sharding of
    the scaling-book recipe. Adam's mu/nu (params-shaped) dominate train
    HBM after the params themselves (fp32 nu alone is 1.4 GB for the 353M
    flagship); annotating them with a data-axis-partitioned sharding makes
    GSPMD compute the optimizer update shard-wise — the gradient psum
    becomes a reduce-scatter into each chip's moment shard and the fresh
    params are all-gathered — cutting per-chip moment memory by the data-
    axis size with no change to the step function.

    Rule per leaf: partition the largest dim divisible by the data-axis
    size on leaves of >= ``min_size`` elements (collective overhead beats
    the savings on small leaves); replicate everything else (counts,
    biases, norm scales).
    """
    n_data = mesh.shape["data"]

    def to_sharding(leaf):
        shape = getattr(leaf, "shape", ())
        if (n_data > 1 and len(shape) >= 1
                and int(np.prod(shape)) >= min_size):
            cands = [d for d, s in enumerate(shape)
                     if s % n_data == 0 and s >= n_data]
            if cands:
                d = max(cands, key=lambda i: shape[i])
                spec = [None] * len(shape)
                spec[d] = "data"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(to_sharding, opt_state)


def param_shardings(mesh: Mesh, params: Any, min_channels: int = 256):
    """NamedSharding pytree for params: output-channel TP on wide kernels.

    Biases/scales stay replicated — they are tiny and XLA re-shards the
    activation math as needed.
    """
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        name = "/".join(str(p) for p in path)
        if leaf.ndim >= 2 and ("kernel" in name or name == ""):
            spec = _leaf_spec(name, leaf.shape, model_size, min_channels)
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
