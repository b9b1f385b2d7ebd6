"""LDM train step (VERDICT r3 #9): frozen-VAE eps-loss training — the
capability the reference's inference-only stable-diffusion subtree never
shipped (training pattern: reference/ddpm/experiment.py:102-144; loss:
reference/ddpm/__init__.py:264-287)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffusionmodel_tpu.models.latent_diffusion import Autoencoder, UNetModel
from diffusionmodel_tpu.models.latent_diffusion.latent_diffusion import (
    ldm_schedule,
)
from diffusionmodel_tpu.models.latent_diffusion.training import (
    init_ldm_train_state,
    make_ldm_train_step,
)

D_COND = 16


def tiny_unet(**over):
    kw = dict(in_channels=4, out_channels=4, channels=32, n_res_blocks=1,
              attention_levels=(0,), channel_multipliers=(1, 2), n_heads=2,
              d_cond=D_COND, use_flash=False)
    kw.update(over)
    return UNetModel(**kw)


def test_latent_train_step_reduces_loss():
    unet = tiny_unet()
    tx = optax.adam(2e-3)
    state = init_ldm_train_state(unet, tx, jax.random.PRNGKey(0),
                                 latent_hw=8, d_cond=D_COND, max_length=7)
    step = jax.jit(make_ldm_train_step(unet, tx, ldm_schedule(100)))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 4)) * 0.2
    cond = jax.random.normal(jax.random.PRNGKey(2), (4, 7, D_COND))
    losses = []
    for i in range(8):
        state, loss = step(state, jax.random.PRNGKey(100 + i), z, cond)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert min(losses[4:]) < losses[0]
    assert int(state.step) == 8


def test_frozen_vae_path_trains_unet_only():
    unet = tiny_unet()
    ae = Autoencoder(channels=16, ch_mults=(1, 2, 2, 2), z_channels=4,
                     emb_channels=4)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    ae_params = ae.init(jax.random.PRNGKey(1), img, jax.random.PRNGKey(2))
    tx = optax.adam(1e-3)
    state = init_ldm_train_state(unet, tx, jax.random.PRNGKey(3),
                                 latent_hw=8, d_cond=D_COND, max_length=7)
    step = jax.jit(make_ldm_train_step(unet, tx, ldm_schedule(100), ae=ae))
    cond = jnp.zeros((2, 7, D_COND))
    before = jax.tree.map(lambda p: np.asarray(p).copy(), state.params)
    state, loss = step(state, jax.random.PRNGKey(4), img, cond,
                       ae_params=ae_params)
    assert np.isfinite(float(loss))
    # the UNet moved; the (frozen) VAE params are not even part of state
    moved = jax.tree.reduce(
        lambda a, b: a or b,
        jax.tree.map(lambda a, b: bool(np.any(a != np.asarray(b))),
                     before, state.params))
    assert moved


def test_frozen_vae_requires_params():
    unet = tiny_unet()
    ae = Autoencoder(channels=16, ch_mults=(1, 2), z_channels=4,
                     emb_channels=4)
    step = make_ldm_train_step(unet, optax.adam(1e-3), ldm_schedule(10),
                               ae=ae)
    tx = optax.adam(1e-3)
    state = init_ldm_train_state(unet, tx, jax.random.PRNGKey(0),
                                 latent_hw=8, d_cond=D_COND, max_length=7)
    with pytest.raises(ValueError, match="ae_params"):
        step(state, jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
             jnp.zeros((1, 7, D_COND)))


def test_remat_grads_match_plain():
    """remat must be a pure memory/FLOPs trade: same loss, same grads.
    (Compared pre-optimizer: Adam's rsqrt near v~0 would amplify fusion-
    order float noise up to ~lr in the params.)"""
    from diffusionmodel_tpu.models.latent_diffusion.training import ldm_loss

    unet = tiny_unet()
    sched = ldm_schedule(50)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 7, D_COND))
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), z,
                                jnp.zeros((2,)), cond)
    key = jax.random.PRNGKey(3)
    outs = []
    for remat in (False, True):
        apply = unet.apply if not remat else jax.checkpoint(unet.apply)
        loss, grads = jax.jit(jax.value_and_grad(
            lambda p: ldm_loss(apply, p, key, z, cond, sched)))(params)
        outs.append((float(loss), grads))
    assert outs[0][0] == pytest.approx(outs[1][0], abs=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-5), outs[0][1], outs[1][1])


def test_cfg_dropout_uses_uncond_embedding():
    """With uncond_prob=1 every sample trains against uncond_cond — the
    conditioned embedding must not influence the loss at all."""
    unet = tiny_unet()
    tx = optax.adam(1e-3)
    sched = ldm_schedule(50)
    state = init_ldm_train_state(unet, tx, jax.random.PRNGKey(0),
                                 latent_hw=8, d_cond=D_COND, max_length=7)
    step = jax.jit(make_ldm_train_step(unet, tx, sched, uncond_prob=1.0))
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    uncond = jnp.zeros((7, D_COND))
    key = jax.random.PRNGKey(9)
    _, l1 = step(state, key, z,
                 jax.random.normal(jax.random.PRNGKey(2), (2, 7, D_COND)),
                 uncond_cond=uncond)
    _, l2 = step(state, key, z,
                 jax.random.normal(jax.random.PRNGKey(3), (2, 7, D_COND)),
                 uncond_cond=uncond)
    assert float(l1) == float(l2)
