"""ops: align-corners bilinear upsample & adaptive pooling vs torch."""

import numpy as np
import pytest

from diffusionmodel_tpu.ops.pool import adaptive_avg_pool_axis
from diffusionmodel_tpu.ops.resize import (
    resize_bilinear_align_corners,
    upsample_bilinear_align_corners,
)


def test_upsample_shapes():
    import jax.numpy as jnp

    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    y = upsample_bilinear_align_corners(x, 2)
    assert y.shape == (2, 8, 8, 3)
    # corners preserved under align_corners=True
    np.testing.assert_allclose(y[:, 0, 0, :], x[:, 0, 0, :], rtol=1e-6)
    np.testing.assert_allclose(y[:, -1, -1, :], x[:, -1, -1, :], rtol=1e-6)


def test_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7, 3).astype(np.f4 if hasattr(np, "f4") else np.float32)
    got = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 2))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        torch.nn.functional.interpolate(
            xt, scale_factor=2, mode="bilinear", align_corners=True
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_general_resize_matches_torch():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 16, 2).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 299, 299))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (
        torch.nn.functional.interpolate(
            xt, size=(299, 299), mode="bilinear", align_corners=True
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(7, 7), (16, 8), (10, 3), (5, 9)])
def test_adaptive_pool_matches_torch(in_size, out_size):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, in_size, 3).astype(np.float32)  # pool along axis=2
    got = np.asarray(adaptive_avg_pool_axis(jnp.asarray(x), out_size, axis=2))
    # torch adaptive_avg_pool2d over (H=4 fixed, W=in->out)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # [B,C,4,in]
    want = (
        torch.nn.functional.adaptive_avg_pool2d(xt, (4, out_size))
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fused_up2_conv3x3_matches_unfused_op():
    """ops/fused_upconv: conv3x3(up2(x)) computed at half the rows is
    EXACT vs the unfused pair (fp32), including the borders where the
    conv's zero padding interacts with align-corners interpolation."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from diffusionmodel_tpu.ops.fused_upconv import up2_conv3x3_align_corners

    for h, w, cin, cout in [(8, 8, 6, 5), (16, 12, 4, 7), (5, 9, 3, 2)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, w, cin))
        kern = jax.random.normal(jax.random.PRNGKey(1),
                                 (3, 3, cin, cout)) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(2), (cout,))
        up = upsample_bilinear_align_corners(x, 2)
        ref = lax.conv_general_dilated(
            up, kern, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = up2_conv3x3_align_corners(x, kern, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)


def test_unetup_fused_upsample_same_params_same_output():
    """UnetUp(fused_upsample=True) has the IDENTICAL parameter tree
    (checkpoint-compatible) and matches the unfused block's output."""
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.nn.blocks import UnetUp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 12))
    skip = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 12))
    plain = UnetUp(24, 16)
    fused = UnetUp(24, 16, fused_upsample=True)
    params = plain.init(jax.random.PRNGKey(2), x, skip)
    params_f = fused.init(jax.random.PRNGKey(2), x, skip)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, params_f)
    a = plain.apply(params, x, skip)
    b = fused.apply(params, x, skip)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_fused_up2_conv3x3_differentiable_bf16():
    """The fused pair must stay differentiable under bf16 compute — the
    train step runs it (bench.py round 4). Regression for the
    preferred_element_type VJP dtype mismatch (f32 cotangent vs bf16
    kernel inside conv_general_dilated's transpose)."""
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.ops.fused_upconv import up2_conv3x3_align_corners

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4),
                          dtype=jnp.bfloat16)
    kern = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6)) * 0.1
            ).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(2), (6,)).astype(jnp.bfloat16)

    def loss(kern, b):
        return jnp.sum(up2_conv3x3_align_corners(x, kern, b)
                       .astype(jnp.float32) ** 2)

    gk, gb = jax.grad(loss, argnums=(0, 1))(kern, b)
    assert gk.shape == kern.shape and gb.shape == b.shape
    assert np.isfinite(np.asarray(gk, np.float32)).all()
    assert np.isfinite(np.asarray(gb, np.float32)).all()
