"""Textbook DDPM family: UNet shapes, schedule, process math, sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.models.annotated_ddpm import (
    DdpmUNet,
    DenoiseDiffusion,
    textbook_schedule,
)


def test_textbook_schedule_matches_torch_formulation():
    torch = pytest.importorskip("torch")
    s = textbook_schedule(100)
    beta = torch.linspace(1e-4, 0.02, 100)
    np.testing.assert_allclose(np.asarray(s.beta), beta.numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.alpha_bar), torch.cumprod(1 - beta, 0).numpy(), rtol=1e-5)


def test_unet_shapes():
    m = DdpmUNet(image_channels=1, n_channels=16, ch_mults=(1, 2),
                 is_attn=(False, True), n_blocks=1)
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.array([3, 50], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(variables, x, t)
    assert out.shape == x.shape


def test_q_sample_and_p_x0_roundtrip():
    dd = DenoiseDiffusion(lambda x, t: jnp.zeros_like(x), n_steps=50)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 40], jnp.int32)
    xt = dd.q_sample(x0, t, eps)
    # inverting q_sample with the true eps recovers x0
    np.testing.assert_allclose(np.asarray(dd.p_x0(xt, t, eps)), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_p_sample_terminal_step_no_noise():
    dd = DenoiseDiffusion(lambda x, t: jnp.zeros_like(x), n_steps=10)
    x = jnp.ones((1, 4, 4, 1))
    t0 = jnp.zeros((1,), jnp.int32)
    out1 = dd.p_sample_step(x, t0, jax.random.PRNGKey(0))
    out2 = dd.p_sample_step(x, t0, jax.random.PRNGKey(99))
    # at t=0 no noise is added -> deterministic
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))


def test_full_sample_and_interpolate_with_tiny_net():
    m = DdpmUNet(image_channels=1, n_channels=8, ch_mults=(1, 2),
                 is_attn=(False, False), n_blocks=1)
    x = jnp.zeros((2, 8, 8, 1))
    t = jnp.zeros((2,), jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), x, t)

    def eps_fn(x, t):
        return m.apply(variables, x, t)

    dd = DenoiseDiffusion(eps_fn, n_steps=5)
    out = dd.sample(jax.random.PRNGKey(1), 2, (8, 8, 1))
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()

    out, x0s = dd.sample(jax.random.PRNGKey(2), 2, (8, 8, 1), track_x0=True)
    assert x0s.shape == (5, 2, 8, 8, 1)

    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.ones((1, 8, 8, 1))
    mix = dd.interpolate(jax.random.PRNGKey(3), a, b, lam=0.3, t_=3)
    assert mix.shape == (1, 8, 8, 1)

    loss = dd.loss(jax.random.PRNGKey(4), jnp.zeros((4, 8, 8, 1)))
    assert np.isfinite(float(loss))
