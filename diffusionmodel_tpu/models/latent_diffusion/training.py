"""LDM training: a jitted eps-loss train step with a frozen VAE.

The reference's stable-diffusion subtree is inference-only; its training
pattern lives in the labml DDPM experiment (reference/ddpm/experiment.py:
102-144 — Adam on the eps-model, loss.backward, step) with the simplified
loss L = E||eps - eps_theta(sqrt(abar_t) x0 + sqrt(1-abar_t) eps, t)||^2
(reference/ddpm/__init__.py:264-287). This module is the latent-space
version of that loop, the capability the reference never shipped:

- images are encoded by the FROZEN SD VAE (reparameterized sample x the
  0.18215 scaling, reference/stable_diffusion/latent_diffusion.py:119-127)
  under ``stop_gradient`` — only the UNet trains;
- t ~ U[0, T) per sample against the sqrt-linspace^2 LDM beta schedule
  (latent_diffusion.py:98-104);
- optional classifier-free-guidance conditioning dropout: each sample's
  text conditioning is replaced by ``uncond_cond`` with probability
  ``uncond_prob`` (how SD's CFG sampler gets a usable uncond branch);
- TPU-first: the whole step is one XLA program — loss, grads, optimizer
  update and the frozen encode all fuse; params are step ARGUMENTS (never
  jit closures: the remote-compile tunnel rejects >100MB constant
  payloads); ``remat=True`` wraps the UNet in ``jax.checkpoint`` so the
  backward fits HBM at SD scale; with ``use_flash`` the self-attention
  backward runs the streaming Pallas kernel (kernels/flash_attn.py) at
  sequence lengths where plain XLA attention OOMs.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from diffusionmodel_tpu.models.latent_diffusion.latent_diffusion import (
    LdmSchedule,
    ldm_schedule,
)


class LdmTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def init_ldm_train_state(unet, tx: optax.GradientTransformation, key,
                         latent_hw: int = 8, d_cond: int = 64,
                         max_length: int = 77) -> LdmTrainState:
    """Initialize UNet params (jitted — eager init dispatches per-op over
    the tunnel) and the optimizer state."""
    z0 = jnp.zeros((1, latent_hw, latent_hw, unet.in_channels))
    cond0 = jnp.zeros((1, max_length, d_cond))
    params = jax.jit(unet.init)(key, z0, jnp.zeros((1,)), cond0)
    return LdmTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))


def ldm_loss(unet_apply: Callable, params, key, z0, cond,
             sched: LdmSchedule, uncond_cond: Optional[jnp.ndarray] = None,
             uncond_prob: float = 0.0):
    """Simplified eps-MSE on latents (reference/ddpm/__init__.py:264-287),
    loss math in fp32 regardless of the model's compute dtype."""
    b = z0.shape[0]
    kt, ke, kd = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b,), 0, sched.alpha_bar.shape[0])
    eps = jax.random.normal(ke, z0.shape, z0.dtype)
    abar = sched.alpha_bar[t].astype(jnp.float32)[:, None, None, None]
    zt = jnp.sqrt(abar) * z0 + jnp.sqrt(1.0 - abar) * eps
    if uncond_cond is not None and uncond_prob > 0.0:
        drop = jax.random.bernoulli(kd, uncond_prob, (b,))
        cond = jnp.where(drop[:, None, None], uncond_cond, cond)
    pred = unet_apply(params, zt, t.astype(jnp.float32), cond)
    return jnp.mean(jnp.square(eps.astype(jnp.float32)
                               - pred.astype(jnp.float32)))


def make_ldm_train_step(unet, tx: optax.GradientTransformation,
                        sched: Optional[LdmSchedule] = None,
                        ae=None, latent_scaling: float = 0.18215,
                        uncond_prob: float = 0.0, remat: bool = False):
    """Returns ``step(state, key, batch, cond, ae_params=None,
    uncond_cond=None) -> (state, loss)`` — one fused XLA program.

    batch: images [B, H, W, 3] when ``ae`` is given (frozen-VAE encode
    in-graph, H/W must be 8x the UNet's latent size), else latents
    [B, h, w, z] (the pre-encoded production path — encode once, reuse
    across epochs instead of paying the VAE every step).
    """
    sched = sched or ldm_schedule()

    def unet_apply(params, zt, t, cond):
        return unet.apply(params, zt, t, cond)

    if remat:
        unet_apply = jax.checkpoint(unet_apply)

    def step(state: LdmTrainState, key, batch, cond, ae_params=None,
             uncond_cond=None):
        kz, kl = jax.random.split(key)
        if ae is not None:
            if ae_params is None:
                raise ValueError("ae_params required when ae is set")
            # frozen first stage (latent_diffusion.py:119-127): sample the
            # posterior, scale, and block gradients from reaching the VAE.
            dist = ae.apply(ae_params, batch, method=ae.encode)
            z0 = jax.lax.stop_gradient(
                latent_scaling * dist.sample(kz))
        else:
            z0 = batch

        def loss_fn(params):
            return ldm_loss(unet_apply, params, kl, z0, cond, sched,
                            uncond_cond, uncond_prob)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return LdmTrainState(params, opt_state, state.step + 1), loss

    return step
