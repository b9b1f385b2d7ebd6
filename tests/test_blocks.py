"""Shape/dtype tests for each denoiser block and the full models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.config import preset
from diffusionmodel_tpu.nn import (
    ContextUnet,
    CoordAttn,
    EmbedFC,
    LocalEnhancer,
    MnistContextUnet,
    ResConvBlock,
    SEBlock,
    UnetDown,
    UnetUp,
    build_model,
)


def _init_and_run(mod, *args, train=False, **kw):
    key = jax.random.PRNGKey(0)
    variables = mod.init(key, *args, train=train, **kw)
    if "batch_stats" in variables:
        out, _ = mod.apply(variables, *args, train=train, mutable=["batch_stats"], **kw)
    else:
        out = mod.apply(variables, *args, train=train, **kw)
    return out, variables


def test_embed_fc():
    mod = EmbedFC(input_dim=1, emb_dim=64)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 1))
    variables = mod.init(key, x)
    out = mod.apply(variables, x)
    assert out.shape == (4, 64)


def test_se_block():
    x = jnp.ones((2, 8, 8, 32))
    mod = SEBlock(32, reduction=16)
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape


def test_local_enhancer_gating():
    mod = LocalEnhancer(16, high_thresh=1.2)
    x = jnp.ones((2, 8, 8, 16))
    mask = jnp.zeros((2, 8, 8))  # below thresh -> identity
    variables = mod.init(jax.random.PRNGKey(0), x, mask)
    out = mod.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)
    # mask None -> identity (sampling path, Q3)
    out2 = mod.apply(variables, x, None)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x), rtol=1e-6)
    # above thresh -> changed
    mask3 = jnp.full((2, 8, 8), 3.0)
    out3 = mod.apply(variables, x, mask3)
    assert not np.allclose(np.asarray(out3), np.asarray(x))


@pytest.mark.parametrize("norm", ["group", "batch"])
def test_resconv_block(norm):
    mod = ResConvBlock(8, 16, is_res=True, norm=norm)
    x = jnp.ones((2, 8, 8, 8))
    out, variables = _init_and_run(mod, x, train=True)
    assert out.shape == (2, 8, 8, 16)
    if norm == "batch":
        assert "batch_stats" in variables


def test_unet_down_up_shapes():
    x = jnp.ones((2, 32, 32, 16))
    down = UnetDown(16, 32)
    out, _ = _init_and_run(down, x)
    assert out.shape == (2, 16, 16, 32)
    up = UnetUp(64, 16)
    skip = jnp.ones((2, 16, 16, 32))
    out2, _ = _init_and_run(up, out, skip)
    assert out2.shape == (2, 32, 32, 16)


def test_coord_attn_shape_and_bounds():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32))
    mod = CoordAttn(32, reduction=16)
    out, _ = _init_and_run(mod, x)
    assert out.shape == x.shape
    # attention in (0,1): |out| <= |x|
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_context_unet_full_small():
    # img_size 64 (multiple of 32) for a fast CPU check of the full v2 graph.
    mod = ContextUnet(in_ch=3, n_feat=32, n_classes=5, img_size=64)
    b = 2
    x = jnp.ones((b, 64, 64, 3))
    c = jnp.array([0, 3], dtype=jnp.int32)
    t = jnp.full((b,), 0.5)
    ctx = jnp.ones((b,))
    mask = jnp.full((b, 64, 64), 3.0)
    out, variables = _init_and_run(mod, x, c, t, ctx, attn_mask=mask, train=True)
    assert out.shape == (b, 64, 64, 3)
    # sampling path: no attention mask
    out2 = mod.apply(variables, x, c, t, ctx, attn_mask=None, train=False)
    assert out2.shape == (b, 64, 64, 3)


def test_context_unet_fused_upsample_equivalence():
    """model.fused_upsample on the FULL v2 graph: identical param tree
    (checkpoint-compatible) and matching outputs vs the unfused model —
    the model-level guard over the op/block tests in test_ops.py.
    bench.py runs the flagship sampler with this flag ON (round 4)."""
    mod = ContextUnet(in_ch=3, n_feat=32, n_classes=5, img_size=64)
    modf = ContextUnet(in_ch=3, n_feat=32, n_classes=5, img_size=64,
                       fused_upsample=True)
    b = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (b, 64, 64, 3))
    c = jnp.array([0, 3], dtype=jnp.int32)
    t = jnp.full((b,), 0.5)
    ctx = jnp.ones((b,))
    variables = mod.init(jax.random.PRNGKey(1), x, c, t, ctx,
                         attn_mask=None, train=False)
    variables_f = modf.init(jax.random.PRNGKey(1), x, c, t, ctx,
                            attn_mask=None, train=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(variables_f))
    a = mod.apply(variables, x, c, t, ctx, attn_mask=None, train=False)
    f = modf.apply(variables, x, c, t, ctx, attn_mask=None, train=False)
    np.testing.assert_allclose(np.asarray(f), np.asarray(a),
                               atol=5e-5, rtol=1e-5)


def test_mnist_unet_shapes():
    mod = MnistContextUnet(in_ch=1, n_feat=32, n_classes=10, img_size=28)
    b = 4
    x = jnp.ones((b, 28, 28, 1))
    c = jnp.arange(b, dtype=jnp.int32)
    t = jnp.full((b,), 0.25)
    ctx = jnp.zeros((b,))
    out, _ = _init_and_run(mod, x, c, t, ctx, train=True)
    assert out.shape == (b, 28, 28, 1)


def test_factory_builds_presets():
    for name in ("full", "old", "mnist"):
        cfg = preset(name)
        m = build_model(cfg.model, cfg.diffusion.high_thresh)
        assert m is not None


def test_param_count_full_model():
    # The real 192-feature model is ~353M params (dominated by the
    # ConvTranspose2d(1536,1536,8,8) up0 at 151M and the 1536-channel down4
    # stack, new_scripy.py:283,297-301); guard against wiring regressions.
    mod = ContextUnet(in_ch=3, n_feat=192, n_classes=5, img_size=256)
    x = jnp.ones((1, 256, 256, 3))
    variables = jax.eval_shape(
        lambda: mod.init(
            jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
            jnp.ones((1,)), jnp.ones((1,)), attn_mask=None, train=False,
        )
    )
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(variables["params"]))
    assert 300_000_000 < n < 420_000_000, n
