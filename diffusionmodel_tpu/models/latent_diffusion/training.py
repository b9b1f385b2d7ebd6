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

import os
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
    [B, h, w, z], or a ``(mean, std)`` tuple of UNSCALED posterior
    moments (the pre-encoded production path: ``fit_ldm`` runs the VAE
    encoder ONCE over the dataset and stores moments; each step then
    draws a fresh posterior sample as two elementwise ops — exactly the
    per-step ``dist.sample`` stochasticity of the in-graph VAE path at
    none of its conv cost).
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
        elif isinstance(batch, tuple):
            mean, std = batch
            z0 = latent_scaling * (
                mean + std * jax.random.normal(kz, mean.shape, mean.dtype))
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


def fit_ldm(runner, images, prompts, *, epochs: int = 10,
            batch_size: int = 4, lr: float = 1e-4,
            uncond_prob: float = 0.1, remat: bool = False, seed: int = 0,
            out_path: Optional[str] = None, log=print):
    """End-to-end LDM training driver behind ``--mode train_ldm`` — the
    workflow the reference never shipped (its stable-diffusion subtree is
    inference-only; the training pattern is the labml DDPM experiment,
    reference/ddpm/experiment.py:102-144, here moved to latent space).

    images: [N, H, W, 3] float in [-1, 1] (H = W = 8 x latent size);
    prompts: N strings — conditioning via the runner's embedder (CLIP
    when available, else the deterministic prompt-hash fallback, which
    keeps train-time and sample-time embeddings consistent so prompt
    conditioning genuinely trains).

    TPU-first shape: the frozen VAE encoder runs ONCE over the dataset
    (posterior moments cached on host); every optimizer step is one
    compiled XLA program over a fixed [batch_size, ...] shape (the final
    partial batch is dropped per epoch, standard drop_last semantics) in
    which a fresh posterior sample costs two elementwise ops. Returns
    ``(state, loss_history)``; with ``out_path`` the trained UNet params
    are pickled as {"arch", "unet"} — loadable by ``LdmRunner(
    native_ckpt=...)`` for txt2img/img2img/inpaint on the trained model.
    """
    import numpy as np

    n = int(images.shape[0])
    if len(prompts) != n:
        raise ValueError(f"{n} images but {len(prompts)} prompts")
    if n < batch_size:
        raise ValueError(f"need >= batch_size={batch_size} images, got {n}")

    # ---- one-time conditioning + frozen-VAE encode (moments, unscaled)
    cond_all = np.asarray(runner.cond(list(prompts)), np.float32)
    uncond = np.asarray(runner.cond([""]), np.float32)[0]

    @jax.jit
    def encode(ap, img):
        dist = runner.ae.apply({"params": ap}, img, method="encode")
        return dist.mean, dist.std

    means, stds = [], []
    for i in range(0, n, batch_size):
        chunk = images[i:i + batch_size]
        real = chunk.shape[0]
        if real < batch_size:  # reuse the one compiled shape for the tail
            chunk = np.concatenate(
                [chunk, chunk[-1:].repeat(batch_size - real, 0)], 0)
        m, s = encode(runner.ae_params, jnp.asarray(chunk))
        means.append(np.asarray(m)[:real])
        stds.append(np.asarray(s)[:real])
    mean_all = np.concatenate(means, 0)
    std_all = np.concatenate(stds, 0)

    tx = optax.adam(lr)
    variables = {"params": runner.params}
    state = LdmTrainState(variables, tx.init(variables),
                          jnp.zeros((), jnp.int32))
    step = jax.jit(make_ldm_train_step(
        runner.unet, tx, uncond_prob=uncond_prob, remat=remat),
        donate_argnums=(0,))

    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    uncond_j = jnp.asarray(uncond)
    history = []
    for ep in range(epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            key, k = jax.random.split(key)
            state, loss = step(
                state, k,
                (jnp.asarray(mean_all[idx]), jnp.asarray(std_all[idx])),
                jnp.asarray(cond_all[idx]), uncond_cond=uncond_j)
            losses.append(loss)
        ep_loss = float(jnp.mean(jnp.stack(losses)))
        history.append(ep_loss)
        log(f"[train_ldm] epoch {ep + 1}/{epochs} loss {ep_loss:.4f}")

    if out_path:
        import pickle

        from diffusionmodel_tpu.utils.transfer import fetch_tree

        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        tmp = out_path + ".tmp"
        with open(tmp, "wb") as f:
            # chunked+threaded fetch: a bare device_get of a big param
            # tree collapses to ~5 MB/s on this tunneled platform. The
            # FROZEN VAE rides along: the UNet was trained in THIS VAE's
            # latent space, so sampling must reunite the exact pair.
            pickle.dump({"arch": runner.arch,
                         "unet": fetch_tree(state.params["params"]),
                         "ae": fetch_tree(runner.ae_params)}, f)
        os.replace(tmp, out_path)
        log(f"[train_ldm] saved UNet params: {out_path}")
    return state, history


# ---------------------------------------------------------------------------
# First-stage (VAE) training — round 5. The reference consumes a
# PRETRAINED SD VAE (reference/stable_diffusion/util.py:28-103) and ships
# no way to train one; in this zero-egress environment those weights
# cannot exist, so a native first stage is the only path to an LDM whose
# decoded samples are gateable against real images. Loss follows the SD
# first-stage recipe's tractable half (taming-transformers
# AutoencoderKL): pixel reconstruction + KL(posterior || N(0,1)) at a
# tiny weight. The perceptual (LPIPS) and adversarial terms are omitted
# — both require pretrained discriminator/VGG weights this image does
# not have; documented, not hidden.
# ---------------------------------------------------------------------------


def make_ae_train_step(ae, tx: optax.GradientTransformation,
                       kl_weight: float = 1e-6, l1: bool = True):
    """Returns ``step(state, key, batch) -> (state, (loss, rec, kl))`` —
    one fused XLA program: encode -> reparam sample -> decode -> loss ->
    grads -> Adam update. batch: images [B, H, W, 3] in [-1, 1].

    rec = mean |x - x̂| (SD's pixel L1; ``l1=False`` gives MSE);
    kl = mean over batch/space of 0.5 Σ_c (μ² + σ² − 1 − logσ²).
    state.params is the BARE param tree (the runner.ae_params convention).
    """
    def step(state: LdmTrainState, key, batch):
        def loss_fn(params):
            recon, dist = ae.apply({"params": params}, batch, key)
            x = batch.astype(jnp.float32)
            r = recon.astype(jnp.float32)
            rec = (jnp.mean(jnp.abs(x - r)) if l1
                   else jnp.mean(jnp.square(x - r)))
            mean = dist.mean.astype(jnp.float32)
            logvar = dist.logvar.astype(jnp.float32)
            kl = 0.5 * jnp.mean(jnp.sum(
                jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar, axis=-1))
            return rec + kl_weight * kl, (rec, kl)

        (loss, (rec, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (LdmTrainState(params, opt_state, state.step + 1),
                (loss, rec, kl))

    return step


def fit_ae(ae, images, *, epochs: int = 20, batch_size: int = 8,
           lr: float = 1e-4, kl_weight: float = 1e-6, seed: int = 0,
           img_hw: Optional[int] = None, log=print):
    """Train the first-stage VAE on domain images; returns
    ``(params, history)`` where history is per-epoch
    ``{"loss", "rec", "kl"}``. images: [N, H, W, 3] float in [-1, 1]
    (numpy; fed in fixed-shape batches, final partial batch dropped).
    """
    import numpy as np

    n = int(images.shape[0])
    if n < batch_size:
        raise ValueError(f"need >= batch_size={batch_size} images, got {n}")
    hw = img_hw or int(images.shape[1])

    key = jax.random.PRNGKey(seed)
    # init via __call__ so BOTH halves get parameters; bare tree (the
    # runner.ae_params convention, so the result drops straight in).
    params = jax.jit(ae.init)(
        key, jnp.zeros((1, hw, hw, 3)), jax.random.PRNGKey(0))["params"]
    tx = optax.adam(lr)
    state = LdmTrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_ae_train_step(ae, tx, kl_weight=kl_weight),
                   donate_argnums=(0,))

    rng = np.random.RandomState(seed)
    history = []
    for ep in range(epochs):
        order = rng.permutation(n)
        ls, rs, ks = [], [], []
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            key, k = jax.random.split(key)
            state, (loss, rec, kl) = step(state, k,
                                          jnp.asarray(images[idx]))
            ls.append(loss), rs.append(rec), ks.append(kl)
        rec = {"loss": float(jnp.mean(jnp.stack(ls))),
               "rec": float(jnp.mean(jnp.stack(rs))),
               "kl": float(jnp.mean(jnp.stack(ks)))}
        history.append(rec)
        log(f"[train_ae] epoch {ep + 1}/{epochs} loss {rec['loss']:.4f} "
            f"rec {rec['rec']:.4f} kl {rec['kl']:.1f}")
    return state.params, history
