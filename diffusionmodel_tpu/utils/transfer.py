"""Chunked, threaded device->host pytree fetch.

The tunneled TPU platform in this environment has a pathological
device->host path for LARGE single-array transfers: measured ~5.6 MB/s
for a 256 MB array vs ~36 MB/s for 16 MB slices and ~70 MB/s for trees
of ~1 MB leaves (probed 2026-08-17; see benchmarks/RESULTS.md).  The
flagship 353M-param model has a 604 MB dense kernel, so a naive
``jax.device_get(params)`` costs minutes to hours while a chunked fetch
costs seconds.

``fetch_tree`` replaces per-leaf ``np.asarray`` in every checkpoint /
early-stop / sampling fetch:

- leaves larger than ``chunk_bytes`` are sliced along their largest
  axis into ~``chunk_bytes`` pieces (device-side basic indexing — an
  O(chunk) copy, never a full-array copy, so it is HBM-safe mid-train),
- all leaves and slices are fetched concurrently by a thread pool
  (transfers release the GIL; concurrency hides per-RPC latency).

On non-tunneled backends (CPU tests, real local TPU) this is a no-op
performance-wise — it degrades to a threaded ``np.asarray``.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import Any

import jax
import numpy as np

_CHUNK_BYTES = 16 * 1024 * 1024


def _nbytes(x) -> int:
    try:
        return int(x.size) * int(x.dtype.itemsize)
    except Exception:
        return 0


def _fetch_leaf(x, chunk_bytes: int, pool: ThreadPoolExecutor):
    """Return a future-like callable resolving to np.ndarray for one leaf."""
    if not hasattr(x, "dtype") or isinstance(x, np.ndarray) or _nbytes(x) <= chunk_bytes:
        fut = pool.submit(np.asarray, x)
        return lambda: fut.result()

    shape = x.shape
    # slice along the largest axis so each piece is <= ~chunk_bytes
    ax = int(np.argmax(shape))
    n_chunks = min(shape[ax], max(2, math.ceil(_nbytes(x) / chunk_bytes)))
    step = math.ceil(shape[ax] / n_chunks)
    idx = [slice(None)] * len(shape)
    futs = []
    for start in range(0, shape[ax], step):
        sl = list(idx)
        sl[ax] = slice(start, min(start + step, shape[ax]))
        # device-side basic indexing: an O(chunk) device copy dispatched
        # eagerly; the fetch itself happens in the pool thread.
        piece = x[tuple(sl)]
        futs.append(pool.submit(np.asarray, piece))

    def resolve(ax=ax, futs=futs):
        return np.concatenate([f.result() for f in futs], axis=ax)

    return resolve


def fetch_tree(tree: Any, chunk_bytes: int = _CHUNK_BYTES,
               max_workers: int = 8) -> Any:
    """Device->host copy of a pytree; chunked + threaded (see module doc).

    Semantically identical to ``jax.device_get(tree)`` (returns numpy
    leaves, preserves structure), but orders of magnitude faster for
    large arrays on the tunneled platform.
    """
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        resolvers = [_fetch_leaf(l, chunk_bytes, pool) for l in leaves]
        out = [r() for r in resolvers]
    return jax.tree.unflatten(treedef, out)
