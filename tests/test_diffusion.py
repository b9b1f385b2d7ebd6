"""Diffusion math: q_sample, loss weighting, CFG arithmetic, scan sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.config import DiffusionConfig
from diffusionmodel_tpu.diffusion import (
    Schedule,
    loss_weights,
    q_sample,
    sample_cfg,
    train_loss,
)


def test_q_sample_mixing():
    sched = Schedule.create(1e-4, 0.02, 700)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    ts = jnp.array([1, 700])
    xt = np.asarray(q_sample(sched, x0, ts, noise))
    sab = np.asarray(sched.sqrtab)
    smab = np.asarray(sched.sqrtmab)
    np.testing.assert_allclose(xt[0], sab[1] * 1.0 + smab[1] * 2.0, rtol=1e-6)
    np.testing.assert_allclose(xt[1], sab[700] * 1.0 + smab[700] * 2.0, rtol=1e-6)


def test_loss_weights_thresholds():
    dc = DiffusionConfig()
    mask = jnp.array([[[0.5, 0.9, 3.0], [1.2, 0.8, 1.21]]])  # [1,2,3]
    w = np.asarray(loss_weights(mask, dc))
    # >1.2 -> 3.0 ; >0.8 -> 1.0 ; else 0.5 (strict inequalities as in torch.where)
    np.testing.assert_array_equal(w, [[[0.5, 1.0, 3.0], [1.0, 0.5, 3.0]]])


def _const_apply(value):
    def apply_fn(x, c, t, ctx_mask, attn_mask, train):
        return jnp.full_like(x, value)

    return apply_fn


def test_train_loss_plain_mse_zero_when_perfect():
    # If the model returns exactly the injected noise, plain-MSE loss == 0.
    dc = DiffusionConfig(n_T=10, use_weighted_loss=False)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    x = jnp.zeros((4, 8, 8, 1))

    captured = {}

    def apply_fn(x_t, c, t, ctx_mask, attn_mask, train):
        return captured["noise"]

    # reproduce noise by reusing the same key-split order as train_loss
    key = jax.random.PRNGKey(3)
    tkey, nkey, mkey = jax.random.split(key, 3)
    captured["noise"] = jax.random.normal(nkey, x.shape, dtype=jnp.float32)
    loss = train_loss(apply_fn, key, x, jnp.zeros((4,), jnp.int32), None, sched, dc)
    assert float(loss) < 1e-12


def test_train_loss_weighted_formula():
    # Constant predictor + constant mask regions: verify the closed form.
    dc = DiffusionConfig(n_T=10)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    b, h, w = 2, 4, 4
    x = jnp.zeros((b, h, w, 3))
    mask = jnp.full((b, h, w), 3.0)  # all high-attention
    key = jax.random.PRNGKey(0)
    tkey, nkey, mkey = jax.random.split(key, 3)
    noise = jax.random.normal(nkey, x.shape, dtype=jnp.float32)

    loss = train_loss(_const_apply(0.0), key, x, jnp.zeros((b,), jnp.int32),
                      mask, sched, dc)
    want = dc.high_weight * np.mean(np.asarray(noise) ** 2) + (
        dc.feat_consist_weight * np.mean(np.abs(np.asarray(noise)))
    )
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_cfg_arithmetic_orientation():
    """eps = (1+w)*eps(mask=0 half) - w*eps(mask=1 half) as written (Q1)."""
    dc = DiffusionConfig(n_T=1)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    record = {}

    def apply_fn(x, c, t, ctx_mask, attn_mask, train):
        record["mask"] = ctx_mask
        # Return mask-dependent eps so we can detect which half is which:
        # eps = ctx_mask (broadcast over pixels).
        return jnp.broadcast_to(ctx_mask[:, None, None, None], x.shape)

    n = 4
    x = sample_cfg(apply_fn, jax.random.PRNGKey(0), n, (4, 4, 1), 2, sched, dc,
                   guide_w=1.0)
    # As-written: eps1 comes from the mask=0 half -> eps1=0, eps2=1
    # => eps = (1+1)*0 - 1*1 = -1 for every pixel at the single step.
    # x1 = oneover_sqrta[1]*(x0 - (-1)*mab[1]) + 0  (i=1 -> z=0)
    mask = np.asarray(record["mask"])
    np.testing.assert_array_equal(mask[:n], 0.0)
    np.testing.assert_array_equal(mask[n:], 1.0)

    dc_fixed = DiffusionConfig(n_T=1, cfg_fixed_orientation=True)
    sample_cfg(apply_fn, jax.random.PRNGKey(0), n, (4, 4, 1), 2, sched, dc_fixed,
               guide_w=1.0)
    mask = np.asarray(record["mask"])
    np.testing.assert_array_equal(mask[:n], 1.0)
    np.testing.assert_array_equal(mask[n:], 0.0)


def test_sampler_single_step_update_math():
    dc = DiffusionConfig(n_T=1)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx_mask, attn_mask, train):
        return jnp.ones_like(x)  # eps == 1 on both halves -> e = 1 for any w

    n = 2
    key = jax.random.PRNGKey(7)
    x = sample_cfg(apply_fn, key, n, (2, 2, 1), 2, sched, dc, guide_w=3.0)
    # Recompute expected from the same initial noise.
    key2, xkey = jax.random.split(key)
    x0 = jax.random.normal(xkey, (n, 2, 2, 1), dtype=jnp.float32)
    expect = np.asarray(sched.oneover_sqrta)[1] * (
        np.asarray(x0) - 1.0 * np.asarray(sched.mab_over_sqrtmab)[1]
    )
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-5, atol=1e-6)


def test_sampler_classes_cycle():
    dc = DiffusionConfig(n_T=2)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    seen = {}

    def apply_fn(x, c, t, ctx_mask, attn_mask, train):
        seen["c"] = c
        return jnp.zeros_like(x)

    sample_cfg(apply_fn, jax.random.PRNGKey(0), 6, (2, 2, 1), 3, sched, dc)
    c = np.asarray(seen["c"])
    np.testing.assert_array_equal(c[:6], [0, 1, 2, 0, 1, 2])
    np.testing.assert_array_equal(c[6:], [0, 1, 2, 0, 1, 2])


def test_sampler_history():
    dc = DiffusionConfig(n_T=5)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx_mask, attn_mask, train):
        return jnp.zeros_like(x)

    x, hist = sample_cfg(apply_fn, jax.random.PRNGKey(0), 2, (2, 2, 1), 2, sched,
                         dc, return_history=True)
    assert hist.shape == (5, 2, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(hist[-1]), np.asarray(x))


def test_ddim_fast_sampler():
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim

    dc = DiffusionConfig(n_T=100)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    calls = {"n": 0}

    def apply_fn(x, c, t, ctx, attn, train):
        calls["n"] += 1
        return jnp.zeros_like(x)

    x = sample_cfg_ddim(apply_fn, jax.random.PRNGKey(0), 4, (8, 8, 1), 2,
                        sched, dc, guide_w=2.0, n_steps=10)
    assert x.shape == (4, 8, 8, 1)
    assert np.isfinite(np.asarray(x)).all()
    assert calls["n"] == 1  # traced once inside the scan


def test_ddim_with_eps_zero_recovers_scaled_x():
    # With eps == 0 the DDIM update is x <- sqrt(a_prev/a) * x each step;
    # composing over the full subsequence gives x_T / sqrt(ab[tau_max]).
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim

    dc = DiffusionConfig(n_T=50)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return jnp.zeros_like(x)

    key = jax.random.PRNGKey(1)
    x = sample_cfg_ddim(apply_fn, key, 2, (4, 4, 1), 2, sched, dc,
                        n_steps=5, eta=0.0)
    key2, xkey = jax.random.split(key)
    x_init = jax.random.normal(xkey, (2, 4, 4, 1), dtype=jnp.float32)
    expect = np.asarray(x_init) / np.sqrt(np.asarray(sched.alphabar_t)[50])
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-4)


def test_chunked_sampler_matches_single_scan():
    from diffusionmodel_tpu.diffusion import sample_cfg_chunked

    dc = DiffusionConfig(n_T=7)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return jnp.zeros_like(x)  # deterministic denoise path (eps = 0)

    # Reference: single scan. Note eps=0 still adds noise z per step, which
    # consumes the PRNG differently across chunk boundaries — so compare the
    # deterministic part by zeroing noise via n_T=1-style checks instead:
    # with eps=0 and z ~ N, the distributions differ; here we verify the
    # chunked driver's step-count semantics by counting network evals and
    # padding no-ops.
    calls = {"n": 0}

    def chunk_fn(params, x, key, steps, guide_w):
        def f(xx, c, t, ctx, attn, train):
            calls["n"] += 1
            return jnp.zeros_like(xx)

        return sample_cfg(f, key, 2, (4, 4, 1), 2, sched, dc,
                          guide_w=guide_w, steps=steps, x_init=x)

    out = sample_cfg_chunked(chunk_fn, None, jax.random.PRNGKey(0), 2,
                             (4, 4, 1), dc, 2.0, chunk=3)
    assert out.shape == (2, 4, 4, 1)
    assert np.isfinite(np.asarray(out)).all()
    # 7 steps -> 3 chunks of 3 (2 pad steps); chunk_fn traced per call here
    # (not jitted in this test), so each chunk evaluates its scan once.
    assert calls["n"] == 3


def test_padding_step_zero_is_noop():
    dc = DiffusionConfig(n_T=5)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return jnp.ones_like(x)

    x0 = jnp.full((2, 4, 4, 1), 0.7)
    out = sample_cfg(apply_fn, jax.random.PRNGKey(0), 2, (4, 4, 1), 2, sched,
                     dc, steps=jnp.zeros((4,), jnp.int32), x_init=x0)
    np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-6)


def test_ddim_quad_discretization_main_family():
    # eps == 0 makes the DDIM update x <- sqrt(a_prev/a)*x; telescoping over
    # the quad tau subsequence gives x_T / sqrt(ab[tau_max]) — verifies the
    # quad spacing feeds the same update math as uniform.
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim

    dc = DiffusionConfig(n_T=50)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return jnp.zeros_like(x)

    key = jax.random.PRNGKey(1)
    x = sample_cfg_ddim(apply_fn, key, 2, (4, 4, 1), 2, sched, dc,
                        n_steps=5, eta=0.0, discretize="quad")
    tau_max = int(((np.linspace(0, np.sqrt(50 * 0.8), 5)) ** 2
                   ).astype(np.int64)[-1] + 1)
    key2, xkey = jax.random.split(key)
    x_init = jax.random.normal(xkey, (2, 4, 4, 1), dtype=jnp.float32)
    expect = np.asarray(x_init) / np.sqrt(np.asarray(sched.alphabar_t)[tau_max])
    np.testing.assert_allclose(np.asarray(x), expect, rtol=1e-4)


def test_per_sample_guide_w_vector():
    """guide_w as a [n] vector applies each sample's own scale: with a
    per-sample-independent eps stub and one shared key, sample i of a
    mixed-scale batch equals sample i of the matching scalar-scale batch."""
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim

    dc = DiffusionConfig(n_T=10)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        # context-dependent so the two CFG halves differ (guidance matters)
        return 0.1 * x + 0.05 * ctx[:, None, None, None]

    key = jax.random.PRNGKey(5)
    for fn in (
        lambda w: sample_cfg(apply_fn, key, 2, (4, 4, 1), 2, sched, dc,
                             guide_w=w),
        lambda w: sample_cfg_ddim(apply_fn, key, 2, (4, 4, 1), 2, sched,
                                  dc, guide_w=w, n_steps=5),
    ):
        mixed = np.asarray(fn(jnp.asarray([2.0, 7.0])))
        s2 = np.asarray(fn(2.0))
        s7 = np.asarray(fn(7.0))
        np.testing.assert_allclose(mixed[0], s2[0], atol=1e-6)
        np.testing.assert_allclose(mixed[1], s7[1], atol=1e-6)
        assert np.abs(mixed[1] - s2[1]).max() > 1e-4  # scales actually differ

    with pytest.raises(ValueError):
        sample_cfg(_const_apply(0.0), key, 2, (4, 4, 1), 2, sched, dc,
                   guide_w=jnp.ones((3,)))


def test_ddim_quad_taus_unique_and_count():
    """Quad discretization must not waste steps on duplicate taus
    (VERDICT r2 weak #6): exactly n_steps DISTINCT taus in [1, n_T],
    still low-end concentrated."""
    from diffusionmodel_tpu.diffusion import ddim_taus

    for n_T, n_steps in ((20, 10), (50, 25), (700, 50), (10, 10)):
        taus = ddim_taus(n_T, n_steps, "quad")
        assert len(taus) == n_steps
        assert len(np.unique(taus)) == n_steps
        assert taus.min() >= 1 and taus.max() <= n_T
        assert np.all(np.diff(taus) > 0)  # strictly ascending
    # low-end concentration retained: median below the uniform midpoint
    taus = ddim_taus(700, 50, "quad")
    assert np.median(taus) < 350
    uni = ddim_taus(700, 50, "uniform")
    assert len(np.unique(uni)) == 50
    with pytest.raises(ValueError):
        ddim_taus(5, 6, "uniform")


def test_dpmpp_shapes_and_single_trace():
    from diffusionmodel_tpu.diffusion import sample_cfg_dpmpp

    dc = DiffusionConfig(n_T=100)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    calls = {"n": 0}

    def apply_fn(x, c, t, ctx, attn, train):
        calls["n"] += 1
        return jnp.zeros_like(x)

    x = sample_cfg_dpmpp(apply_fn, jax.random.PRNGKey(0), 4, (8, 8, 1), 2,
                         sched, dc, guide_w=2.0, n_steps=10)
    assert x.shape == (4, 8, 8, 1)
    assert np.isfinite(np.asarray(x)).all()
    assert calls["n"] == 1  # traced once inside the scan


def test_dpmpp_exact_eps_recovers_x0_any_step_count():
    """The solver's exactness property: when the model returns the TRUE
    constant eps of a trajectory x_t = alpha_t x0 + sigma_t eps, the
    x0-prediction is exact at every step, so DPM-Solver++(2M) must return
    x0 EXACTLY for ANY number of steps (the exp-integrator update
    preserves the invariant; also pins the degenerate final step where
    sigma -> 0). DDIM eta=0 shares this property — cross-checked."""
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim, sample_cfg_dpmpp

    dc = DiffusionConfig(n_T=200)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    eps_true = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 4, 1))

    def apply_fn(x, c, t, ctx, attn, train):
        return jnp.broadcast_to(eps_true, x.shape)

    key = jax.random.PRNGKey(3)
    # the sampler draws x_T itself from key's split — reconstruct it to
    # derive the x0 the trajectory implies
    _, xkey = jax.random.split(key)
    x_T = jax.random.normal(xkey, (2, 4, 4, 1), dtype=jnp.float32)
    ab = np.asarray(sched.alphabar_t, np.float64)
    a_T = ab[dc.n_T]  # uniform taus include n_T
    x0_implied = (np.asarray(x_T) - np.sqrt(1 - a_T) * np.asarray(eps_true)
                  ) / np.sqrt(a_T)

    for n_steps in (2, 3, 7, 20):
        got = np.asarray(sample_cfg_dpmpp(
            apply_fn, key, 2, (4, 4, 1), 2, sched, dc, guide_w=0.0,
            n_steps=n_steps))
        np.testing.assert_allclose(got, x0_implied, rtol=2e-4, atol=2e-4)
    ddim = np.asarray(sample_cfg_ddim(
        apply_fn, key, 2, (4, 4, 1), 2, sched, dc, guide_w=0.0, n_steps=5))
    np.testing.assert_allclose(ddim, x0_implied, rtol=2e-4, atol=2e-4)


def test_dpmpp_second_order_beats_ddim_on_curved_eps():
    """On a trajectory whose true eps VARIES with t (curvature in the ODE),
    the 2nd-order solver at K steps must land closer to the fine-step
    reference than 1st-order DDIM at the same K — the reason dpmpp is the
    throughput sampler."""
    from diffusionmodel_tpu.diffusion import sample_cfg_ddim, sample_cfg_dpmpp

    dc = DiffusionConfig(n_T=400)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        # smooth t-dependence => curved probability-flow ODE
        tt = t[:, None, None, None]
        return 0.6 * jnp.tanh(x) * (1.0 + tt) + 0.3 * jnp.sin(3.0 * tt)

    key = jax.random.PRNGKey(11)
    args = (key, 2, (4, 4, 1), 2, sched, dc)
    ref = np.asarray(sample_cfg_ddim(apply_fn, *args, guide_w=0.0,
                                     n_steps=400))  # fine-step reference

    def errs(K):
        cd = np.asarray(sample_cfg_ddim(apply_fn, *args, guide_w=0.0,
                                        n_steps=K))
        cp = np.asarray(sample_cfg_dpmpp(apply_fn, *args, guide_w=0.0,
                                         n_steps=K))
        return np.abs(cd - ref).mean(), np.abs(cp - ref).mean()

    # (measured on this fixture: ddim 0.042/0.020 vs dpmpp 0.026/0.0055
    # at K=16/32 — the 2nd-order solver wins and its error falls ~4x per
    # step-doubling vs ~2x for 1st-order DDIM)
    e_ddim16, e_dpm16 = errs(16)
    e_ddim32, e_dpm32 = errs(32)
    assert e_dpm16 < e_ddim16, (e_dpm16, e_ddim16)
    assert e_dpm32 < 0.5 * e_ddim32, (e_dpm32, e_ddim32)
    # order of convergence: halving the step size helps dpmpp more
    assert e_dpm16 / e_dpm32 > e_ddim16 / e_ddim32


def test_dpmpp_per_sample_guide_vector():
    from diffusionmodel_tpu.diffusion import sample_cfg_dpmpp

    dc = DiffusionConfig(n_T=10)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return 0.1 * x + 0.05 * ctx[:, None, None, None]

    key = jax.random.PRNGKey(5)

    def fn(w):
        return sample_cfg_dpmpp(apply_fn, key, 2, (4, 4, 1), 2, sched, dc,
                                guide_w=w, n_steps=5)

    mixed = np.asarray(fn(jnp.asarray([2.0, 7.0])))
    s2, s7 = np.asarray(fn(2.0)), np.asarray(fn(7.0))
    np.testing.assert_allclose(mixed[0], s2[0], atol=1e-6)
    np.testing.assert_allclose(mixed[1], s7[1], atol=1e-6)
    assert np.abs(mixed[1] - s2[1]).max() > 1e-4


# ---- sample_cfg_edit: main-family img2img / inpaint ----------------------


def _edit_args(dc):
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    def apply_fn(x, c, t, ctx, attn, train):
        return 0.1 * x + 0.02 * c[:, None, None, None].astype(jnp.float32)

    return sched, apply_fn


def test_edit_full_mask_inpaint_returns_original():
    # keep-mask = 1 everywhere: the final blend re-projects to
    # q_sample(x0, tau_prev=0) = x0 exactly (ab[0] = 1), whatever the net.
    from diffusionmodel_tpu.diffusion import sample_cfg_edit

    dc = DiffusionConfig(n_T=20)
    sched, apply_fn = _edit_args(dc)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1,
                            maxval=1)
    out = sample_cfg_edit(apply_fn, jax.random.PRNGKey(0), x0, 2, sched, dc,
                          n_steps=5, strength=0.8,
                          inpaint_mask=jnp.ones((8, 8)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-6)


def test_edit_inpaint_preserves_kept_half_only():
    from diffusionmodel_tpu.diffusion import sample_cfg_edit

    dc = DiffusionConfig(n_T=20)
    sched, apply_fn = _edit_args(dc)
    x0 = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 1), minval=-1,
                            maxval=1)
    mask = np.zeros((8, 8), np.float32)
    mask[4:] = 1.0  # preserve bottom half (the reference's default
    # orientation, in_paint.py:80-84)
    out = np.asarray(sample_cfg_edit(
        apply_fn, jax.random.PRNGKey(0), x0, 2, sched, dc, n_steps=5,
        strength=0.8, inpaint_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(out[:, 4:], np.asarray(x0)[:, 4:], atol=1e-6)
    assert np.abs(out[:, :4] - np.asarray(x0)[:, :4]).max() > 1e-3


def test_edit_img2img_zero_eps_closed_form():
    # With eps == 0 and eta == 0 every DDIM update is
    # x <- sqrt(a_prev) * x / sqrt(a), telescoping to
    # x_final = x_start / sqrt(a_start) = x0 + (sqrtmab/sqrtab)[tau_s]*noise
    # (the q-sample noise reproduced via the function's own key-split
    # order: key, nkey = split(key)).
    from diffusionmodel_tpu.diffusion import ddim_taus, sample_cfg_edit

    dc = DiffusionConfig(n_T=50)
    sched, _ = _edit_args(dc)

    def zero_eps(x, c, t, ctx, attn, train):
        return jnp.zeros_like(x)

    x0 = jax.random.uniform(jax.random.PRNGKey(3), (2, 4, 4, 1), minval=-1,
                            maxval=1)
    key = jax.random.PRNGKey(7)
    n_steps, strength = 10, 0.6
    out = np.asarray(sample_cfg_edit(zero_eps, key, x0, 2, sched, dc,
                                     n_steps=n_steps, strength=strength))
    taus = np.asarray(ddim_taus(dc.n_T, n_steps))[::-1]
    k = int(round(strength * n_steps))
    tau_s = int(taus[n_steps - k])
    _, nkey = jax.random.split(key)
    noise = np.asarray(jax.random.normal(nkey, x0.shape, dtype=jnp.float32))
    sab = np.asarray(sched.sqrtab)[tau_s]
    smab = np.asarray(sched.sqrtmab)[tau_s]
    np.testing.assert_allclose(out, np.asarray(x0) + (smab / sab) * noise,
                               rtol=1e-4, atol=1e-5)


def test_edit_mask_rank_broadcasting():
    # [h,w], [n,h,w] and [n,h,w,c] keep-masks describing the same region
    # produce identical results.
    from diffusionmodel_tpu.diffusion import sample_cfg_edit

    dc = DiffusionConfig(n_T=20)
    sched, apply_fn = _edit_args(dc)
    x0 = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 3), minval=-1,
                            maxval=1)
    m2 = np.zeros((8, 8), np.float32)
    m2[4:] = 1.0
    m3 = np.broadcast_to(m2, (2, 8, 8)).copy()
    m4 = np.broadcast_to(m2[..., None], (2, 8, 8, 3)).copy()
    outs = [np.asarray(sample_cfg_edit(
        apply_fn, jax.random.PRNGKey(0), x0, 2, sched, dc, n_steps=4,
        strength=1.0, inpaint_mask=jnp.asarray(m)))
        for m in (m2, m3, m4)]
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-6)


def test_edit_per_sample_guide_and_classes():
    from diffusionmodel_tpu.diffusion import sample_cfg_edit

    dc = DiffusionConfig(n_T=20)
    sched, apply_fn = _edit_args(dc)
    x0 = jax.random.uniform(jax.random.PRNGKey(5), (2, 4, 4, 1), minval=-1,
                            maxval=1)

    def run(w):
        return np.asarray(sample_cfg_edit(
            apply_fn, jax.random.PRNGKey(0), x0, 3, sched, dc, guide_w=w,
            n_steps=5, strength=0.5, classes=jnp.asarray([1, 2])))

    mixed = run(jnp.asarray([2.0, 7.0]))
    s2, s7 = run(2.0), run(7.0)
    np.testing.assert_allclose(mixed[0], s2[0], atol=1e-6)
    np.testing.assert_allclose(mixed[1], s7[1], atol=1e-6)
    assert mixed.shape == (2, 4, 4, 1)
