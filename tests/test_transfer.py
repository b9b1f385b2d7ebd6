"""fetch_tree must be semantically identical to jax.device_get.

The chunked/threaded fetch exists because the tunneled TPU platform
collapses to ~5 MB/s on large single-array device->host transfers
(utils/transfer.py module doc); these tests pin its equivalence on
every leaf shape class it special-cases.
"""

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.utils.transfer import fetch_tree


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        assert np.asarray(x).dtype == np.asarray(y).dtype


def test_fetch_tree_matches_device_get():
    key = jax.random.PRNGKey(0)
    tree = {
        "small": jnp.arange(7, dtype=jnp.int32),
        "scalar": jnp.float32(3.5),
        "nested": {
            "mat": jax.random.normal(key, (33, 129), jnp.float32),
            "bf16": jax.random.normal(key, (3, 3, 17, 5)).astype(jnp.bfloat16),
        },
        "empty": jnp.zeros((0, 4), jnp.float32),
    }
    _assert_tree_equal(fetch_tree(tree), jax.device_get(tree))


def test_fetch_tree_chunks_large_leaves():
    # chunk_bytes tiny so every path (chunked big leaf, largest-axis
    # selection, uneven tail slice) exercises on CPU-sized data
    key = jax.random.PRNGKey(1)
    tree = {
        "big_axis0": jax.random.normal(key, (101, 64), jnp.float32),
        "big_axis1": jax.random.normal(key, (4, 1001), jnp.float32),
        "big_mid": jax.random.normal(key, (2, 333, 8), jnp.float32),
    }
    got = fetch_tree(tree, chunk_bytes=1024, max_workers=4)
    _assert_tree_equal(got, jax.device_get(tree))


def test_fetch_tree_handles_numpy_and_python_leaves():
    tree = {"np": np.arange(10.0), "none_struct": [], "host_list": [1, 2]}
    got = fetch_tree(tree)
    np.testing.assert_array_equal(got["np"], np.arange(10.0))
    assert got["host_list"] == [1, 2]


def test_fetch_tree_empty_tree():
    assert fetch_tree({}) == {}
    assert fetch_tree(None) is None
