"""Textbook DDPM process (the vendored labml formulation,
reference/ddpm/__init__.py:172-287) as pure functions + a lax.scan sampler.

Schedule: ``beta = linspace(1e-4, 0.02, T)``, ``abar = cumprod(1-beta)``,
t in [0, T) — note this differs from the main family's arange(0,T+1)/T
endpoint semantics (diffusionmodel_tpu.schedules).

Also provides the evaluate.py capabilities (reference/ddpm/evaluate.py):
x0-tracking sampling trajectories, q-sample interpolation of two images,
and the p_x0 estimator.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class TextbookSchedule(NamedTuple):
    beta: jnp.ndarray        # [T]
    alpha: jnp.ndarray       # [T]
    alpha_bar: jnp.ndarray   # [T]
    sigma2: jnp.ndarray      # [T] (= beta)


def textbook_schedule(T: int = 1000, beta1: float = 1e-4,
                      beta2: float = 0.02) -> TextbookSchedule:
    beta = jnp.linspace(beta1, beta2, T, dtype=jnp.float32)
    alpha = 1.0 - beta
    return TextbookSchedule(beta, alpha, jnp.cumprod(alpha), beta)


class DenoiseDiffusion:
    """eps-prediction diffusion over a TextbookSchedule."""

    def __init__(self, eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                 n_steps: int = 1000, beta1: float = 1e-4, beta2: float = 0.02):
        self.eps_fn = eps_fn
        self.n_steps = n_steps
        self.sched = textbook_schedule(n_steps, beta1, beta2)

    def q_xt_x0(self, x0, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean and var of q(x_t | x_0)."""
        ab = self.sched.alpha_bar[t].reshape(-1, 1, 1, 1)
        return jnp.sqrt(ab) * x0, 1.0 - ab

    def q_sample(self, x0, t, eps):
        mean, var = self.q_xt_x0(x0, t)
        return mean + jnp.sqrt(var) * eps

    def p_sample_step(self, xt, t, key, z=None):
        """One reverse step x_t -> x_{t-1} (reference/ddpm/__init__.py:230-255).

        ``z``: optional caller-provided standard-normal noise (serving's
        per-slot pinned streams); drawn from ``key`` when omitted."""
        eps_theta = self.eps_fn(xt, t)
        ab = self.sched.alpha_bar[t].reshape(-1, 1, 1, 1)
        a = self.sched.alpha[t].reshape(-1, 1, 1, 1)
        eps_coef = (1.0 - a) / jnp.sqrt(1.0 - ab)
        mean = (xt - eps_coef * eps_theta) / jnp.sqrt(a)
        var = self.sched.sigma2[t].reshape(-1, 1, 1, 1)
        if z is None:
            z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
        z = jnp.where(t.reshape(-1, 1, 1, 1) > 0, z, 0.0)
        return mean + jnp.sqrt(var) * z

    def p_x0(self, xt, t, eps):
        """x0 estimate from (x_t, eps) (reference/ddpm/evaluate.py:239-250)."""
        ab = self.sched.alpha_bar[t].reshape(-1, 1, 1, 1)
        return (xt - jnp.sqrt(1.0 - ab) * eps) / jnp.sqrt(ab)

    def loss(self, key, x0):
        """Simple MSE(eps, eps_theta) with t ~ U[0, T)."""
        tkey, nkey = jax.random.split(key)
        b = x0.shape[0]
        t = jax.random.randint(tkey, (b,), 0, self.n_steps)
        eps = jax.random.normal(nkey, x0.shape, dtype=jnp.float32)
        xt = self.q_sample(x0, t, eps)
        eps_theta = self.eps_fn(xt, t)
        return jnp.mean((eps - eps_theta) ** 2)

    def sample(self, key, n: int, img_shape: Tuple[int, int, int],
               track_x0: bool = False,
               steps: Optional[jnp.ndarray] = None,
               x_init: Optional[jnp.ndarray] = None,
               slot_seeds: Optional[jnp.ndarray] = None):
        """Full reverse process as one lax.scan; optionally also return the
        per-step x0 estimates (denoise-animation capability,
        reference/ddpm/evaluate.py:90-129).

        ``steps``/``x_init`` support chunked execution (environments capping
        single-XLA-program runtime): pass a slice of the descending
        t-sequence (pad with t=-1 no-ops) and the carried state.

        ``slot_seeds``: optional [n] per-slot seeds making each sample's
        per-step noise depend only on (its seed, the absolute t) — the
        serving pinned-batching contract (diffusion._slot_normal).
        """
        key, xkey = jax.random.split(key)
        x = x_init if x_init is not None else jax.random.normal(
            xkey, (n,) + tuple(img_shape), dtype=jnp.float32)
        if steps is None:
            steps = jnp.arange(self.n_steps - 1, -1, -1, dtype=jnp.int32)

        def step(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            tb = jnp.full((n,), jnp.maximum(t, 0), dtype=jnp.int32)
            out = None
            if track_x0:
                eps = self.eps_fn(x, tb)
                out = self.p_x0(x, tb, eps)
            z = None
            if slot_seeds is not None:
                from diffusionmodel_tpu.diffusion import _slot_normal

                z = _slot_normal(slot_seeds, jnp.maximum(t, 0),
                                 tuple(img_shape)).astype(x.dtype)
            x_new = self.p_sample_step(x, tb, sub, z=z)
            # t == -1 entries are padding from chunked execution: no-op.
            x = jnp.where(t >= 0, x_new, x)
            return (x, key), out

        (x, _), x0s = jax.lax.scan(step, (x, key), steps)
        return (x, x0s) if track_x0 else x

    def interpolate(self, key, x1, x2, lam: float = 0.5,
                    t_: Optional[int] = None):
        """Two-image latent interpolation (reference/ddpm/evaluate.py:131-166):
        q-sample both at t_, mix with lam, then denoise from t_."""
        t_ = self.n_steps - 1 if t_ is None else t_
        n = x1.shape[0]
        key, k1, k2 = jax.random.split(key, 3)
        tb = jnp.full((n,), t_, dtype=jnp.int32)
        xt = (1 - lam) * self.q_sample(
            x1, tb, jax.random.normal(k1, x1.shape)) + lam * self.q_sample(
            x2, tb, jax.random.normal(k2, x2.shape))

        steps = jnp.arange(t_, -1, -1, dtype=jnp.int32)

        def step(carry, t):
            x, key = carry
            key, sub = jax.random.split(key)
            x = self.p_sample_step(x, jnp.full((n,), t, jnp.int32), sub)
            return (x, key), None

        (x, _), _ = jax.lax.scan(step, (xt, key), steps)
        return x


def make_textbook_chunk_fn(model, dc, n_sample: int, img_shape,
                           use_bn: bool):
    """Shared textbook-family sampling adapter (used by BOTH
    trainer.make_sampler's textbook branch and serving.SamplerService —
    the eps-fn call convention below is the annotated-DDPM contract and
    must not drift between them): returns
    ``chunk_fn(params, batch_stats, x, key, steps)`` suitable for
    ``diffusion.sample_cfg_chunked`` with ``steps = n_T-1 .. 0`` and
    ``pad_value=-1`` (see :func:`textbook_chunk_steps`).

    The adapter feeds the class/context-free stubs the DdpmUNet apply
    expects (zero class ids, float timesteps, zero context mask, no
    attention mask) and drives the textbook ancestral ``sample`` over the
    provided step slice."""
    import jax.numpy as jnp

    def chunk_fn(params, batch_stats, x, key, steps, slot_seeds=None):
        def eps_fn(xx, tt):
            variables = {"params": params}
            if use_bn:
                variables["batch_stats"] = batch_stats
            nb = xx.shape[0]
            return model.apply(variables, xx,
                               jnp.zeros((nb,), jnp.int32),
                               tt.astype(jnp.float32),
                               jnp.zeros((nb,), jnp.float32),
                               attn_mask=None, train=False)

        dd = DenoiseDiffusion(eps_fn, dc.n_T, dc.beta1, dc.beta2)
        return dd.sample(key, n_sample, img_shape, steps=steps, x_init=x,
                         slot_seeds=slot_seeds)

    return chunk_fn


def textbook_chunk_steps(n_T: int):
    """The chunk-driver step sequence for the textbook family: t counts
    n_T-1 down to 0 (t in [0, T), unlike the main family's 1..T), padded
    with the gated -1 sentinel by the driver."""
    import numpy as np

    return np.arange(n_T - 1, -1, -1, dtype=np.int32)
