"""Pallas fused kernels vs XLA twins vs the flax modules.

On CPU the kernels run in interpreter mode (same kernel code, no Mosaic);
the real-TPU path is exercised by bench/benchmarks scripts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.kernels.coord_attn import (
    CoordAttnWeights,
    coord_attn_fused,
    coord_attn_xla,
)
from diffusionmodel_tpu.kernels.se_block import se_block_fused, se_block_xla
from diffusionmodel_tpu.nn.blocks import SEBlock
from diffusionmodel_tpu.nn.coord_attn import CoordAttn

pytestmark = pytest.mark.slow  # excluded from the quick tier (-m "not slow")


def test_se_kernel_matches_module():
    c = 64
    mod = SEBlock(c, reduction=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, c))
    variables = mod.init(jax.random.PRNGKey(1), x)
    want = np.asarray(mod.apply(variables, x))
    w1 = variables["params"]["Dense_0"]["kernel"]
    w2 = variables["params"]["Dense_1"]["kernel"]
    got_xla = np.asarray(se_block_xla(x, w1, w2))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-6)
    # kernel uses tanh-GELU (no erf in this Pallas lowering): ~3e-3 max dev
    got_pl = np.asarray(se_block_fused(x, w1, w2, interpret=True))
    np.testing.assert_allclose(got_pl, want, rtol=1e-3, atol=5e-3)


@pytest.mark.parametrize("norm", ["group", "batch"])
def test_coord_attn_kernel_matches_module(norm):
    c = 64
    mod = CoordAttn(c, reduction=16, norm=norm)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, c))
    variables = mod.init(jax.random.PRNGKey(3), x, train=False)
    want = np.asarray(mod.apply(variables, x, train=False))

    kind = "affine" if norm == "batch" else "group"
    wts = CoordAttnWeights(variables["params"],
                           variables.get("batch_stats"), norm_kind=kind)
    from diffusionmodel_tpu.nn.blocks import gn_groups

    g = gn_groups(c // 16, 8)
    got_xla = np.asarray(coord_attn_xla(x, wts, kind, g))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-5)
    # kernel uses tanh-GELU (no erf in this Pallas lowering): ~3e-3 max dev
    got_pl = np.asarray(coord_attn_fused(x, wts, kind, g, interpret=True))
    np.testing.assert_allclose(got_pl, want, rtol=1e-3, atol=5e-3)


def test_use_pallas_model_same_tree_and_output():
    """use_pallas=True must keep the identical param tree and (in train
    mode / interpret-eval) identical outputs to the standard path."""
    import jax

    from diffusionmodel_tpu.nn import ContextUnet

    kw = dict(in_ch=3, n_feat=16, n_classes=3, img_size=32, norm="group")
    m0 = ContextUnet(**kw)
    m1 = ContextUnet(**kw, use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    c = jnp.array([0, 2], jnp.int32)
    t = jnp.full((2,), 0.5)
    ctx = jnp.ones((2,))
    v0 = m0.init(jax.random.PRNGKey(1), x, c, t, ctx, train=False)
    v1 = m1.init(jax.random.PRNGKey(1), x, c, t, ctx, train=False)
    # identical tree structure and shapes
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        assert a.shape == b.shape
    # identical values given identical init keys
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # train path (XLA twin) matches the standard module exactly
    out0 = m0.apply(v0, x, c, t, ctx, train=True,
                    rngs={})
    out1 = m1.apply(v0, x, c, t, ctx, train=True, rngs={})
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0), rtol=2e-5,
                               atol=2e-5)
    # eval path off-TPU falls back to XLA twin -> also matches
    out0e = m0.apply(v0, x, c, t, ctx, train=False)
    out1e = m1.apply(v0, x, c, t, ctx, train=False)
    np.testing.assert_allclose(np.asarray(out1e), np.asarray(out0e),
                               rtol=2e-5, atol=2e-5)
