"""Diffusion process: q-sample, training loss, CFG ancestral sampler.

TPU-first re-design of the reference's ``DDPM`` wrapper
(new_scripy.py:386-477):

- the training objective is a pure function fit for ``jax.value_and_grad``;
- the T-step ancestral sampler with classifier-free guidance compiles to a
  SINGLE ``jax.lax.scan`` with on-device PRNG (the reference's loop is
  host-driven, drawing fresh CPU tensors and printing every step — SURVEY
  Q8; this is exactly where the >=10x images/min comes from);
- all math in fp32 regardless of the network compute dtype (parity).

Quirks honored (SURVEY 2.10):

- Q1: the v2.0 sampler computes ``eps = (1+w)*eps(uncond) - w*eps(cond)``
  (mask 0 for the first half => context zeroed => unconditional). The
  as-written arithmetic is the default; ``cfg_fixed_orientation=True`` swaps
  the halves to standard CFG. (For the MNIST model the flip inside the
  network makes the same arithmetic come out standard.)
- Q3: no spatial attention mask exists while sampling, so the LocalEnhancer
  branch is identity there (mask=None).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from diffusionmodel_tpu.config import DiffusionConfig
from diffusionmodel_tpu.schedules import ddpm_schedules


class Schedule(NamedTuple):
    """The 7 precomputed buffers, each [T+1] float32."""

    alpha_t: jnp.ndarray
    oneover_sqrta: jnp.ndarray
    sqrt_beta_t: jnp.ndarray
    alphabar_t: jnp.ndarray
    sqrtab: jnp.ndarray
    sqrtmab: jnp.ndarray
    mab_over_sqrtmab: jnp.ndarray

    @classmethod
    def create(cls, beta1: float, beta2: float, n_T: int) -> "Schedule":
        return cls(**ddpm_schedules(beta1, beta2, n_T))


def q_sample(sched: Schedule, x0: jnp.ndarray, ts: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps (new_scripy.py:408-411)."""
    sab = sched.sqrtab[ts][:, None, None, None]
    smab = sched.sqrtmab[ts][:, None, None, None]
    return sab * x0 + smab * noise


def loss_weights(attn_mask: jnp.ndarray, dc: DiffusionConfig) -> jnp.ndarray:
    """Per-pixel MSE weights from the attention mask (new_scripy.py:420-424)."""
    return jnp.where(
        attn_mask > dc.high_thresh,
        dc.high_weight,
        jnp.where(attn_mask > dc.mid_thresh, dc.mid_weight, dc.low_weight),
    ).astype(jnp.float32)


def train_loss(
    apply_fn: Callable[..., jnp.ndarray],
    key: jax.Array,
    x: jnp.ndarray,
    c: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray],
    sched: Schedule,
    dc: DiffusionConfig,
    train: bool = True,
) -> jnp.ndarray:
    """Training objective (new_scripy.py:401-439).

    apply_fn(x_t, c, t_norm, ctx_mask, attn_mask, train) -> eps_pred, where
    the caller closes over params (and mutable batch stats if any).

    - t ~ U[1, n_T]; eps ~ N(0,1); x_t = q_sample.
    - ctx_mask ~ Bernoulli(1 - drop_prob) (1 = keep context).
    - weighted MSE (weights 3.0/1.0/0.5 by mask thresholds 1.2/0.8) +
      feat_consist_weight * mean(|eps_pred - eps| * [mask > high_thresh]).
    - use_weighted_loss=False => plain MSE (MNIST_script.py:252; there the
      Bernoulli drop mask has p = drop_prob with 1 = DROP, matching the
      network-side mnist_style_ctx_flip).
    """
    tkey, nkey, mkey = jax.random.split(key, 3)
    b = x.shape[0]

    if dc.schedule_family == "textbook":
        # labml formulation (reference/ddpm/__init__.py:257-287): t ~ U[0,T),
        # abar = cumprod(1-linspace beta), plain MSE; `sched` here is a
        # TextbookSchedule and the network receives the RAW timestep (its
        # sinusoidal TimeEmbedding does the encoding). Unconditional family:
        # context inputs are placeholders the adapter ignores.
        # NOTE: same math as models.annotated_ddpm.DenoiseDiffusion.loss
        # (kept inline: this path's 3-way key split and apply_fn signature
        # differ); formula pinned by test_annotated_ddpm's reconstruction
        # test — change BOTH if the formulation ever moves.
        ts = jax.random.randint(tkey, (b,), 0, dc.n_T)
        noise = jax.random.normal(nkey, x.shape, dtype=jnp.float32)
        ab = sched.alpha_bar[ts][:, None, None, None]
        x_t = jnp.sqrt(ab) * x.astype(jnp.float32) + jnp.sqrt(1.0 - ab) * noise
        ctx_mask = jnp.zeros((b,), jnp.float32)
        eps_pred = apply_fn(x_t, c, ts.astype(jnp.float32), ctx_mask, None,
                            train).astype(jnp.float32)
        return jnp.mean((noise - eps_pred) ** 2)

    ts = jax.random.randint(tkey, (b,), 1, dc.n_T + 1)
    noise = jax.random.normal(nkey, x.shape, dtype=jnp.float32)
    x_t = q_sample(sched, x.astype(jnp.float32), ts, noise)

    if dc.use_weighted_loss:
        # v2: keep-mask, 1 = keep (new_scripy.py:413).
        ctx_mask = jax.random.bernoulli(mkey, 1.0 - dc.drop_prob, (b,)).astype(
            jnp.float32
        )
    else:
        # MNIST: drop-mask, 1 = drop (MNIST_script.py:249).
        ctx_mask = jax.random.bernoulli(mkey, dc.drop_prob, (b,)).astype(jnp.float32)

    t_norm = ts.astype(jnp.float32) / dc.n_T
    pass_mask = attn_mask if dc.local_enhancer_spatial_mask else None
    eps_pred = apply_fn(x_t, c, t_norm, ctx_mask, pass_mask, train)
    eps_pred = eps_pred.astype(jnp.float32)

    if not dc.use_weighted_loss or attn_mask is None:
        return jnp.mean((noise - eps_pred) ** 2)

    w = loss_weights(attn_mask, dc)[..., None]  # [B,H,W,1] broadcast over C
    weighted = jnp.mean((noise - eps_pred) ** 2 * w)
    high = (attn_mask > dc.high_thresh).astype(jnp.float32)[..., None]
    feat_consist = (
        jnp.mean(jnp.abs(eps_pred * high - noise * high)) * dc.feat_consist_weight
    )
    return weighted + feat_consist


def _guide_arr(guide_w, n_sample: int):
    """Normalize guide_w to something that broadcasts against [n,H,W,C]:
    a scalar stays scalar; a [n] vector (per-sample guidance — lets one
    batch mix guidance scales, e.g. a whole CLI sweep or mixed serving
    traffic in a single compiled program) reshapes to [n,1,1,1]."""
    w = jnp.asarray(guide_w, jnp.float32)
    if w.ndim == 0:
        return w
    if w.shape != (n_sample,):
        raise ValueError(
            f"guide_w must be a scalar or shape ({n_sample},), got {w.shape}")
    return w.reshape((n_sample, 1, 1, 1))


def _slot_normal(slot_seeds: jnp.ndarray, i, img_shape) -> jnp.ndarray:
    """Per-slot Gaussian noise for step ``i``, derived from each slot's OWN
    seed: ``fold_in(PRNGKey(seed_j), i)``. The draw depends only on
    (slot_seed, absolute step index) — never on batch composition, slot
    position, or chunk boundaries — which is what lets serving batch
    seed-pinned requests under the STOCHASTIC samplers (ancestral /
    ddim eta>0 / textbook) while each request reproduces its run-alone
    images exactly (VERDICT r3 #8). ``slot_seeds``: [n] integer array."""

    def one(s):
        return jax.random.normal(
            jax.random.fold_in(jax.random.PRNGKey(s), i), img_shape,
            jnp.float32)

    return jax.vmap(one)(slot_seeds)


def _cfg_inputs(n_sample, n_classes, dc, classes):
    if classes is None:
        c = jnp.arange(n_classes, dtype=jnp.int32)
        c = jnp.tile(c, n_sample // n_classes + (1 if n_sample % n_classes else 0))
        c = c[:n_sample]
    else:
        c = jnp.asarray(classes, dtype=jnp.int32)
    c2 = jnp.concatenate([c, c])
    # As-written v2 (Q1): first half mask=0 (uncond), second half mask=1
    # (cond); eps = (1+w)*first - w*second. fixed orientation swaps halves.
    first = 1.0 if dc.cfg_fixed_orientation else 0.0
    mask2 = jnp.concatenate(
        [jnp.full((n_sample,), first), jnp.full((n_sample,), 1.0 - first)]
    ).astype(jnp.float32)
    return c2, mask2


def sample_cfg(
    apply_fn: Callable[..., jnp.ndarray],
    key: jax.Array,
    n_sample: int,
    img_shape: Tuple[int, int, int],  # (H, W, C)
    n_classes: int,
    sched: Schedule,
    dc: DiffusionConfig,
    guide_w: float = 0.0,
    classes: Optional[jnp.ndarray] = None,
    return_history: bool = False,
    steps: Optional[jnp.ndarray] = None,
    x_init: Optional[jnp.ndarray] = None,
    slot_seeds: Optional[jnp.ndarray] = None,
):
    """Ancestral CFG sampling as one ``lax.scan`` (new_scripy.py:441-477).

    The doubled batch evaluates the conditional and unconditional branches in
    one network call per step; per-step Gaussian noise comes from an
    on-device folded PRNG. Returns x_0 with shape [n_sample, H, W, C]
    (+ the full denoising trajectory when return_history).

    ``guide_w`` may be a scalar or a [n_sample] vector (per-sample guidance:
    the CFG combine is per-sample arithmetic, so one batch — one compiled
    program — can carry mixed guidance scales).

    ``steps``/``x_init`` support chunked execution (see
    :func:`sample_cfg_chunked`): pass a slice of the descending i-sequence
    and the carried state to run part of the trajectory.

    ``slot_seeds``: optional [n_sample] integer array replacing the shared
    per-step noise stream with per-slot streams (:func:`_slot_normal`) —
    each sample's trajectory then depends only on (its x_init, its seed),
    making pinned requests batch-composition-independent even under this
    stochastic sampler.
    """
    h, w_, ch = img_shape
    key, xkey = jax.random.split(key)
    x = x_init if x_init is not None else jax.random.normal(
        xkey, (n_sample, h, w_, ch), dtype=jnp.float32)

    c2, mask2 = _cfg_inputs(n_sample, n_classes, dc, classes)
    gw = _guide_arr(guide_w, n_sample)

    if steps is None:
        steps = jnp.arange(dc.n_T, 0, -1, dtype=jnp.int32)

    def step(carry, i):
        x, key = carry
        key, zkey = jax.random.split(key)
        t_norm = jnp.full((2 * n_sample,), i.astype(jnp.float32) / dc.n_T)
        xx = jnp.concatenate([x, x], axis=0)
        eps = apply_fn(xx, c2, t_norm, mask2, None, False).astype(jnp.float32)
        e1, e2 = eps[:n_sample], eps[n_sample:]
        e = (1.0 + gw) * e1 - gw * e2
        z = (jax.random.normal(zkey, x.shape, dtype=jnp.float32)
             if slot_seeds is None
             else _slot_normal(slot_seeds, i, (h, w_, ch)))
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        x_new = (
            sched.oneover_sqrta[i] * (x - e * sched.mab_over_sqrtmab[i])
            + sched.sqrt_beta_t[i] * z
        )
        # i == 0 entries are padding from chunked execution: no-op.
        x = jnp.where(i >= 1, x_new, x)
        return (x, key), (x if return_history else None)

    (x, _), hist = jax.lax.scan(step, (x, key), steps)
    if return_history:
        return x, hist
    return x


def sample_cfg_chunked(
    jit_chunk_fn: Callable,
    params,
    key: jax.Array,
    n_sample: int,
    img_shape: Tuple[int, int, int],
    dc: DiffusionConfig,
    guide_w,
    chunk: int = 100,
    x_sharding=None,
    steps=None,
    pad_value: int = 0,
    x_init=None,
):
    """Host-chunked ancestral sampling for environments that cap single
    XLA-program execution time (this dev tunnel kills programs running
    >~4 min; 700 full-model steps take ~4 min at 256px). One compile of
    ``jit_chunk_fn(params, x, key, steps_slice, guide_w)`` serves every
    chunk; the carry stays on-device between calls, so overhead is one
    dispatch per ``chunk`` steps. ``x_sharding`` lays the carried batch out
    over a device mesh (multi-chip sampling fan-out).

    ``steps``/``pad_value`` support other step conventions: the main
    family runs i = n_T..1 padded with 0 (the scan body gates i >= 1);
    the textbook family passes t = n_T-1..0 padded with -1 (its body
    gates t >= 0).

    ``x_init``: optional caller-provided start noise (host numpy is fine —
    it is placed on device exactly once here); serving uses it to pin
    per-request x_T host-side.
    """
    import numpy as np

    h, w_, ch = img_shape
    key, xkey = jax.random.split(key)
    x = x_init if x_init is not None else jax.random.normal(
        xkey, (n_sample, h, w_, ch), dtype=jnp.float32)
    if x_sharding is not None:
        x = jax.device_put(x, x_sharding)
    elif x_init is not None:
        x = jnp.asarray(x, jnp.float32)
    all_steps = (np.asarray(steps, np.int32) if steps is not None
                 else np.arange(dc.n_T, 0, -1, dtype=np.int32))
    pad = (-len(all_steps)) % chunk
    if pad:
        # pad with no-op sentinel steps (gated inside the scan body)
        all_steps = np.concatenate(
            [all_steps, np.full(pad, pad_value, np.int32)])
    for s in all_steps.reshape(-1, chunk):
        key, sub = jax.random.split(key)
        x = jit_chunk_fn(params, x, sub, jnp.asarray(s), guide_w)
    return x


def ddim_taus(n_T: int, n_steps: int, discretize: str = "uniform"):
    """Ascending tau subsequence over [1, n_T] (host-side: static shapes).

    ``quad``: quadratic spacing concentrating steps near t=0 (reference
    ddim.py:42-50). The reference's squared-linspace -> int map collides at
    the low end for small n_T, wasting those network calls on
    tau_prev == tau no-op steps; here the unique taus are kept and
    refilled to exactly n_steps from the smallest unused timesteps — same
    count, all distinct, still concentrated near t=0.
    """
    import numpy as np

    if n_steps > n_T:
        raise ValueError(f"n_steps={n_steps} exceeds n_T={n_T}")
    if discretize == "quad":
        taus = ((np.linspace(0, np.sqrt(n_T * 0.8), n_steps) ** 2)
                .astype(np.int64) + 1).clip(1, n_T)
        uniq = np.unique(taus)
        if len(uniq) < n_steps:
            unused = np.setdiff1d(np.arange(1, n_T + 1, dtype=np.int64),
                                  uniq)
            uniq = np.sort(np.concatenate(
                [uniq, unused[:n_steps - len(uniq)]]))
        return uniq
    if discretize == "uniform":
        return np.linspace(1, n_T, n_steps).round().astype(np.int64)
    raise ValueError(f"unknown discretize {discretize!r}")


def sample_cfg_ddim(
    apply_fn: Callable[..., jnp.ndarray],
    key: jax.Array,
    n_sample: int,
    img_shape: Tuple[int, int, int],
    n_classes: int,
    sched: Schedule,
    dc: DiffusionConfig,
    guide_w: float = 0.0,
    n_steps: int = 50,
    eta: float = 0.0,
    classes: Optional[jnp.ndarray] = None,
    discretize: str = "uniform",
    x_init: Optional[jnp.ndarray] = None,
    slot_seeds: Optional[jnp.ndarray] = None,
):
    """DDIM sampling over a tau-subsequence of the MAIN family's schedule —
    a speed upgrade over the reference's full 700-step ancestral loop
    (10-50x fewer network evaluations at comparable quality). Uses the same
    CFG arithmetic/orientation flags as :func:`sample_cfg`, including
    per-sample ``guide_w`` vectors.

    ``discretize``: "uniform" tau spacing, or "quad" — quadratic spacing
    concentrating steps near t=0 (the reference's DDIM offers both,
    reference/stable_diffusion/sampler/ddim.py:42-50).

    ``x_init``: optional [n, H, W, C] starting noise. With ``eta == 0``
    the trajectory is DETERMINISTIC given x_init, which lets callers pin
    per-sample noise streams (serving's batched seed-pinned requests).
    ``slot_seeds``: optional [n] per-slot seeds for the eta > 0 per-step
    noise (:func:`_slot_normal`) — the stochastic-DDIM counterpart of the
    same pinning contract.
    """
    h, w_, ch = img_shape
    key, xkey = jax.random.split(key)
    x = x_init if x_init is not None else jax.random.normal(
        xkey, (n_sample, h, w_, ch), dtype=jnp.float32)

    c2, mask2 = _cfg_inputs(n_sample, n_classes, dc, classes)
    gw = _guide_arr(guide_w, n_sample)

    taus_np = ddim_taus(dc.n_T, n_steps, discretize)
    taus = jnp.asarray(taus_np[::-1].copy(), jnp.int32)
    taus_prev = jnp.concatenate([taus[1:], jnp.zeros((1,), jnp.int32)])
    ab = jnp.concatenate([jnp.ones((1,)), sched.alphabar_t[1:]])  # ab[0]=1
    return _ddim_scan(apply_fn, key, x, n_sample, taus, taus_prev, c2,
                      mask2, gw, ab, dc, eta, slot_seeds=slot_seeds)


def _ddim_scan(apply_fn, key, x, n_sample, taus, taus_prev, c2, mask2, gw,
               ab, dc, eta, blend=None, slot_seeds=None):
    """Shared DDIM scan core (one lax.scan over descending taus with the
    doubled-batch CFG network call) — :func:`sample_cfg_ddim` runs it
    plain; :func:`sample_cfg_edit` passes a ``blend`` hook applied after
    each update (the inpaint keep-region re-projection)."""

    def step(carry, idx):
        x, key = carry
        tau, tau_p = idx
        key, zkey = jax.random.split(key)
        t_norm = jnp.full((2 * n_sample,), tau.astype(jnp.float32) / dc.n_T)
        xx = jnp.concatenate([x, x], axis=0)
        eps = apply_fn(xx, c2, t_norm, mask2, None, False).astype(jnp.float32)
        e1, e2 = eps[:n_sample], eps[n_sample:]
        e = (1.0 + gw) * e1 - gw * e2
        a, a_prev = ab[tau], ab[tau_p]
        x0 = (x - jnp.sqrt(1.0 - a) * e) / jnp.sqrt(a)
        sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a) * (1 - a / a_prev))
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma ** 2, 0.0, None)) * e
        z = (jax.random.normal(zkey, x.shape, dtype=jnp.float32)
             if slot_seeds is None
             else _slot_normal(slot_seeds, tau, x.shape[1:]))
        z = jnp.where(tau_p > 0, z, jnp.zeros_like(z))
        x = jnp.sqrt(a_prev) * x0 + dir_xt + sigma * z
        if blend is not None:
            x = blend(x, tau_p)
        return (x, key), None

    (x, _), _ = jax.lax.scan(step, (x, key), (taus, taus_prev))
    return x


def sample_cfg_edit(
    apply_fn: Callable[..., jnp.ndarray],
    key: jax.Array,
    x0: jnp.ndarray,
    n_classes: int,
    sched: Schedule,
    dc: DiffusionConfig,
    guide_w: float = 0.0,
    n_steps: int = 50,
    strength: float = 0.75,
    inpaint_mask: Optional[jnp.ndarray] = None,
    classes: Optional[jnp.ndarray] = None,
    eta: float = 0.0,
    discretize: str = "uniform",
):
    """img2img / inpaint for the MAIN family — a beyond-reference
    capability: the reference ships image editing only on the vendored
    LDM side (reference/stable_diffusion/scripts/image_to_image.py:95-149
    q-samples the encoding at strength*steps then repaints; in_paint.py:
    100-166 adds a keep-mask blended with the ORIGINAL noise each step).
    This transplants both recipes onto the flagship family's discrete
    schedule so a trained crack model can restyle or locally regenerate
    real crack images.

    ``x0``: [n, h, w, c] source images in [-1, 1].
    ``strength``: fraction of the DDIM trajectory actually run — x0 is
    q-sampled to tau at index round(strength * n_steps) (1.0 = pure
    generation ignoring x0 except through the inpaint blend).
    ``inpaint_mask``: None for img2img; else [h, w], [n, h, w] or
    [n, h, w, c] with 1 = PRESERVE the original pixel (the reference's
    orientation, in_paint.py:80-84). After every DDIM update the kept
    region is re-projected to q_sample(x0, tau_prev) using the SAME
    noise draw as the start point — the reference's orig_noise blend.
    Same CFG arithmetic/orientation flags and per-sample ``guide_w``
    vectors as :func:`sample_cfg`.
    """
    import numpy as np

    n_sample = x0.shape[0]
    x0 = x0.astype(jnp.float32)
    taus_np = np.asarray(ddim_taus(dc.n_T, n_steps, discretize))[::-1]
    k = max(1, min(n_steps, int(round(strength * n_steps))))
    taus_used = taus_np[n_steps - k:]
    tau_start = int(taus_used[0])

    key, nkey = jax.random.split(key)
    noise = jax.random.normal(nkey, x0.shape, dtype=jnp.float32)
    ab = jnp.concatenate([jnp.ones((1,)), sched.alphabar_t[1:]])  # ab[0]=1

    def to_tau(tau):
        a = ab[tau]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise

    x = to_tau(tau_start)
    c2, mask2 = _cfg_inputs(n_sample, n_classes, dc, classes)
    gw = _guide_arr(guide_w, n_sample)
    taus = jnp.asarray(taus_used.copy(), jnp.int32)
    taus_prev = jnp.concatenate([taus[1:], jnp.zeros((1,), jnp.int32)])

    blend = None
    if inpaint_mask is not None:
        m = jnp.asarray(inpaint_mask, jnp.float32)
        if m.ndim == 2:
            m = m[None, :, :, None]
        elif m.ndim == 3:
            m = m[..., None]

        def blend(xc, tau_p):
            return to_tau(tau_p) * m + xc * (1.0 - m)

        x = blend(x, jnp.asarray(tau_start))
    return _ddim_scan(apply_fn, key, x, n_sample, taus, taus_prev, c2,
                      mask2, gw, ab, dc, eta, blend=blend)


def dpmpp_terms(a_cur, a_nxt):
    """Shared DPM-Solver++(2M) per-step terms from (alphabar_k,
    alphabar_{k+1}) pairs — the numerically delicate float64 math
    (lambda = log(alpha/sigma), exp(-h) computed directly as
    (alpha_cur sigma_nxt)/(sigma_cur alpha_nxt) so it stays finite at
    the sigma=0 final target, 1/(2r) with the inf-scrub giving the
    exact lower-order first and final steps) lives ONCE here; both the
    main family (:func:`_dpmpp_coeffs`) and the LDM family
    (models/latent_diffusion/samplers.DPMPPSampler) build their scan
    inputs from it. Returns fp32 jnp arrays
    (al_cur, si_cur, al_nxt, sigma_ratio, expm1_neg_h, inv2r)."""
    import numpy as np

    a_cur = np.asarray(a_cur, np.float64)
    a_nxt = np.asarray(a_nxt, np.float64)
    al_c, si_c = np.sqrt(a_cur), np.sqrt(1.0 - a_cur)
    al_n, si_n = np.sqrt(a_nxt), np.sqrt(1.0 - a_nxt)
    with np.errstate(divide="ignore"):
        lam_c = np.log(al_c / si_c)
        lam_n = np.log(al_n / si_n)  # +inf at a final (sigma=0) target
    h = lam_n - lam_c
    inv2r = np.zeros_like(h)
    inv2r[1:] = h[1:] / (2.0 * h[:-1])
    inv2r[~np.isfinite(inv2r)] = 0.0  # first/final step: lower-order
    return tuple(jnp.asarray(v, jnp.float32) for v in (
        al_c, si_c, al_n,
        si_n / np.maximum(si_c, 1e-20),
        (al_c * si_n) / (si_c * al_n) - 1.0,
        inv2r,
    ))


def _dpmpp_coeffs(sched: Schedule, n_T: int, n_steps: int,
                  discretize: str):
    """Host-side per-step coefficients for DPM-Solver++(2M) over the MAIN
    family's discrete schedule (float64; returned as fp32 scan inputs).

    For each step k (descending taus tau_k -> tau_{k+1}, final target 0
    with alphabar=1): alpha=sqrt(ab), sigma=sqrt(1-ab),
    lambda=log(alpha/sigma). The update uses
        exp(-h) = (alpha_cur * sigma_nxt) / (sigma_cur * alpha_nxt)
    computed directly (finite even at sigma_nxt=0, where lambda is +inf),
    and 1/(2 r) = h_k / (2 h_{k-1}) with the convention 0 at k=0 (no
    second point yet) and 0 at the final step (lower-order final: the
    update then degenerates EXACTLY to x = x0_prediction — ratio=0,
    alpha_nxt=1, exp(-h)-1 = -1)."""
    import numpy as np

    taus = np.asarray(ddim_taus(n_T, n_steps, discretize))[::-1]
    ab = np.concatenate([np.ones(1), np.asarray(sched.alphabar_t,
                                                np.float64)[1:]])
    a_cur = ab[taus]
    a_nxt = ab[np.concatenate([taus[1:], np.zeros(1, np.int64)])]
    return (jnp.asarray(taus.copy(), jnp.int32),
            *dpmpp_terms(a_cur, a_nxt))


def sample_cfg_dpmpp(
    apply_fn: Callable[..., jnp.ndarray],
    key: jax.Array,
    n_sample: int,
    img_shape: Tuple[int, int, int],
    n_classes: int,
    sched: Schedule,
    dc: DiffusionConfig,
    guide_w: float = 0.0,
    n_steps: int = 20,
    classes: Optional[jnp.ndarray] = None,
    discretize: str = "uniform",
    x_init: Optional[jnp.ndarray] = None,
):
    """DPM-Solver++(2M) sampling for the MAIN family (beyond-reference
    extra; the reference offers ancestral + DDIM only): a second-order
    multistep exponential-integrator ODE solver in x0-prediction space
    (Lu et al. 2022), reaching DDIM-50-class quality in ~15-20 network
    evaluations — the serving/throughput sampler. Deterministic given the
    initial noise (like DDIM eta=0); same CFG arithmetic/orientation
    flags and per-sample ``guide_w`` vectors as :func:`sample_cfg`; one
    ``lax.scan``, on-device PRNG for x_T only (or caller-pinned via
    ``x_init`` — the trajectory is deterministic given the start noise).

    Update (data-prediction form), taus descending, target alphabar=1:
        x0_k = (x - sigma_k * eps_cfg) / alpha_k
        D    = (1 + 1/(2r)) x0_k - 1/(2r) x0_{k-1},  r = h_{k-1}/h_k
        x   <- (sigma_{k+1}/sigma_k) x - alpha_{k+1} (exp(-h_k) - 1) D
    First step and final step run first-order (D = x0) — the final-step
    coefficients make the update exactly x = x0 (lower-order final)."""
    h, w_, ch = img_shape
    key, xkey = jax.random.split(key)
    x = x_init if x_init is not None else jax.random.normal(
        xkey, (n_sample, h, w_, ch), dtype=jnp.float32)

    c2, mask2 = _cfg_inputs(n_sample, n_classes, dc, classes)
    gw = _guide_arr(guide_w, n_sample)
    taus, al_c, si_c, al_n, ratio, em1, inv2r = _dpmpp_coeffs(
        sched, dc.n_T, n_steps, discretize)

    def step(carry, xs):
        x, x0_prev = carry
        tau, ac, sc_, an, rt, e1m, i2r = xs
        t_norm = jnp.full((2 * n_sample,), tau.astype(jnp.float32) / dc.n_T)
        xx = jnp.concatenate([x, x], axis=0)
        eps = apply_fn(xx, c2, t_norm, mask2, None, False).astype(jnp.float32)
        e1, e2 = eps[:n_sample], eps[n_sample:]
        e = (1.0 + gw) * e1 - gw * e2
        x0 = (x - sc_ * e) / ac
        d = (1.0 + i2r) * x0 - i2r * x0_prev
        x = rt * x - an * e1m * d
        return (x, x0), None

    (x, _), _ = jax.lax.scan(
        step, (x, jnp.zeros_like(x)),
        (taus, al_c, si_c, al_n, ratio, em1, inv2r))
    return x
