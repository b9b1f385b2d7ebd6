"""Benchmark: flagship throughput on real TPU hardware.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: the BASELINE.json north star — the full ContextUnet v2
(n_feat=192, 353M params) sampling 256x256 images with classifier-free
guidance over the full n_T=700 ancestral schedule (the reference's hot
loop, new_scripy.py:441-477), compiled to lax.scan chunks with the
doubled-batch CFG network call per step (bf16 compute, fp32 sampler math),
dispatched through the MESH-SHARDED sampler path (trainer.make_sampler):
on this 1-chip host the mesh is 1x1x1, on a v5e-8 the same code path
fans the batch out over 8 chips.

Extras emitted in the same line (VERDICT r1 item 3):
- ddim50_images_per_min: the DDIM-50 fast sampler on the same model;
- train_steps_per_sec_per_chip: flagship train step (batch 1 x accum 4,
  bf16 compute, bf16 Adam mu, remat OFF — the probe-measured fastest
  point, benchmarks/PROBE_MFU.json) optimizer steps/s, plus micro-batch
  fwd+bwd steps/s;
- sampler_mfu_pct: XLA cost-analysis FLOPs / wall-clock vs the v5e
  chip's 197 TFLOP/s bf16 peak; train_mfu_pct: model-FLOPs convention
  (3x fwd per trained image).

vs_baseline: the reference publishes no numbers (BASELINE.md) and this
host has no GPU, so the PyTorch baseline is *estimated analytically* (an
ESTIMATE, not a measurement): the reference drives the same network (AMP
fp16) through a host-side Python loop. An 8 GB consumer GPU (RTX
2070-class, README.md:94) sustains ~7.5 TFLOP/s fp16 with tensor cores at
a generous 35% MFU => ~2.6e12 FLOP/s. FLOPs per sampler step are taken
from XLA's cost analysis of OUR compiled step (same math), so
    baseline_images_per_min = 2.6e12 * 60 / (flops_per_image_step * n_T).
Host-loop overhead (per-step H2D copies + prints, SURVEY Q8) is ignored,
which makes the baseline OPTIMISTIC (our vs_baseline is a lower bound).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

GPU_BASELINE_FLOPS = 2.6e12  # 8GB-GPU effective fp16 FLOP/s (see docstring)
V5E_PEAK_FLOPS = 197e12      # TPU v5e bf16 peak per chip


def _best_of(fn, n: int):
    import numpy as np

    best = float("inf")
    for i in range(n):
        t0 = time.time()
        # data fetch = the only reliable sync on this tunneled TPU
        # platform; chunked fetch_tree avoids its slow single-array path
        from diffusionmodel_tpu.utils.transfer import fetch_tree

        out = fetch_tree(fn(i))
        best = min(best, time.time() - t0)
    return best, out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--warm-only", action="store_true",
                    help="compile + run every benched program ONCE (no "
                         "timed repeats) to populate the persistent "
                         "compile cache, then exit. Lets a later cold "
                         "bench.py run skip every remote compile.")
    ap.add_argument("--aot-warm", action="store_true",
                    help="AOT lower+compile the benched sampler programs "
                         "from ShapeDtypeStructs — NO device execution or "
                         "HBM, safe while a training job owns the chip "
                         "(compiles run on the remote compile service).")
    args = ap.parse_args()
    warm_only = args.warm_only

    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.parallel import make_mesh
    from diffusionmodel_tpu.trainer import make_sampler
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    mesh = make_mesh()  # all devices on the data axis

    # fused_upsample: the exact bilinear-up2+conv3x3 fusion
    # (ops/fused_upconv.py) — same parameters, same math up to summation
    # order, measured -7.5% forward wall at 256px (RESULTS.md round 4).
    cfg = preset("full", **{"model.dtype": "bfloat16", "model.n_classes": 5,
                            "model.fused_upsample": True})
    mc, dc = cfg.model, cfg.diffusion
    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    n_sample = 20  # 4 per class x 5 classes (batch 40 with CFG doubling)

    if args.aot_warm:
        pstruct = jax.eval_shape(
            lambda: jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(0),
                jnp.zeros((2, mc.img_size, mc.img_size, mc.in_ch)),
                jnp.zeros((2,), jnp.int32), jnp.full((2,), 0.5),
                jnp.ones((2,)), attn_mask=None, train=False))["params"]
        kstruct = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        ws = jax.ShapeDtypeStruct((), jnp.float32)
        with mesh:
            for name, scfg in (
                ("ancestral", cfg),
                ("ddim", preset("full", **{
                    "model.dtype": "bfloat16", "model.n_classes": 5,
                    "model.fused_upsample": True,
                    "sample.sampler": "ddim", "sample.ddim_steps": 50})),
                ("dpmpp", preset("full", **{
                    "model.dtype": "bfloat16", "model.n_classes": 5,
                    "model.fused_upsample": True,
                    "sample.sampler": "dpmpp", "sample.dpm_steps": 20})),
            ):
                t0 = time.time()
                s = make_sampler(model, scfg, sched, False, n_sample,
                                 chunk=50, mesh=mesh)
                if hasattr(s, "aot_warm"):
                    s.aot_warm(pstruct)
                else:  # ddim/dpmpp return the jit object directly
                    s.lower(pstruct, {}, kstruct, ws).compile()
                print(json.dumps({"aot_warmed": name,
                                  "seconds": round(time.time() - t0, 1)}),
                      flush=True)
        return

    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, mc.img_size, mc.img_size, mc.in_ch))
    # IMPORTANT: params are ARGUMENTS of every jitted function (closure
    # capture would embed 1.4 GB of constants into the compile request —
    # this environment's remote-compile service rejects bodies that large).
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, x0, jnp.zeros((2,), jnp.int32), jnp.full((2,), 0.5),
        jnp.ones((2,)), attn_mask=None, train=False)
    params = variables["params"]

    # ---- FLOPs per image per CFG step: model-FLOPs convention -----------
    # Counted from the UNFUSED forward (the reference's literal math,
    # identical to rounds 1-3), even though the benched sampler runs the
    # fused path (~8% fewer executed FLOPs). This keeps sampler/train MFU
    # and the analytic GPU-baseline estimate comparable across rounds and
    # honest: the baseline reference would execute the unfused count.
    import dataclasses

    model_unfused = build_model(
        dataclasses.replace(mc, fused_upsample=False), dc.high_thresh)
    fwd = jax.jit(lambda p, x, c, t, m: model_unfused.apply(
        {"params": p}, x, c, t, m, attn_mask=None, train=False))
    xb = jnp.zeros((2 * n_sample, mc.img_size, mc.img_size, mc.in_ch),
                   jnp.float32)
    cb = jnp.zeros((2 * n_sample,), jnp.int32)
    tb = jnp.full((2 * n_sample,), 0.5)
    mb = jnp.ones((2 * n_sample,))
    try:
        cost = fwd.lower(params, xb, cb, tb, mb).compile().cost_analysis()
        flops_per_step_batch = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_step_batch = 0.0
    flops_per_image_step = (flops_per_step_batch / n_sample
                            if flops_per_step_batch else 6.1e12 / 700)

    # ---- headline: mesh-path ancestral CFG sampler (chunked) ------------
    with mesh:
        sampler = make_sampler(model, cfg, sched, False, n_sample, chunk=50,
                               mesh=mesh)

        import numpy as np

        from diffusionmodel_tpu.utils.transfer import fetch_tree

        t0 = time.time()
        out = fetch_tree(
            sampler(params, {}, jax.random.PRNGKey(1), jnp.float32(4.0)))
        compile_and_first = time.time() - t0

        if not warm_only:
            # Best of two timed runs — the tunneled dev chip is time-shared
            # and a single run can be 3-4x slower under contention.
            elapsed, out = _best_of(
                lambda i: sampler(params, {}, jax.random.PRNGKey(2 + i),
                                  jnp.float32(4.0)), 2)

            images_per_min = n_sample * 60.0 / elapsed
            steps_per_sec = dc.n_T / elapsed
            sampler_mfu = (flops_per_step_batch * dc.n_T / elapsed
                           / (V5E_PEAK_FLOPS * len(jax.devices())) * 100)

        # ---- DDIM-50 fast sampler on the same model ---------------------
        dcfg = preset("full", **{
            "model.dtype": "bfloat16", "model.n_classes": 5,
            "sample.sampler": "ddim", "sample.ddim_steps": 50,
        })
        dsampler = make_sampler(model, dcfg, sched, False, n_sample,
                                mesh=mesh)
        fetch_tree(dsampler(params, {}, jax.random.PRNGKey(1),
                            jnp.float32(4.0)))  # warm-up
        if not warm_only:
            delapsed, _ = _best_of(
                lambda i: dsampler(params, {}, jax.random.PRNGKey(2 + i),
                                   jnp.float32(4.0)), 2)
            ddim_images_per_min = n_sample * 60.0 / delapsed

        # ---- DPM-Solver++(2M)-20: the throughput sampler (round 3) ------
        pcfg = preset("full", **{
            "model.dtype": "bfloat16", "model.n_classes": 5,
            "sample.sampler": "dpmpp", "sample.dpm_steps": 20,
        })
        psampler = make_sampler(model, pcfg, sched, False, n_sample,
                                mesh=mesh)
        fetch_tree(psampler(params, {}, jax.random.PRNGKey(1),
                            jnp.float32(4.0)))  # warm-up
        if not warm_only:
            pelapsed, _ = _best_of(
                lambda i: psampler(params, {}, jax.random.PRNGKey(2 + i),
                                   jnp.float32(4.0)), 2)
            dpmpp_images_per_min = n_sample * 60.0 / pelapsed

    # ---- flagship train step: the measured-fastest operating point ------
    # (benchmarks/PROBE_MFU.json): micro-batch 1 x accum 4 with remat OFF
    # — bf16 Adam mu (train.moment_dtype) frees enough HBM that the 353M
    # @256px backward fits without rematerialization (round 3, 3.12 vs
    # 2.60 opt-steps/s) — plus the exact fused upsample (mb1r0f: 3.249,
    # +4.2%). The bf16 grad-accum carry was probed COMPOSED in round 5
    # (mb1r0fg: 3.254) and adds nothing once fused — same HBM headroom —
    # so the fp32 carry ships (simpler numerics; see RESULTS.md round-5
    # ceiling section and probe_accum_parity.py).
    from diffusionmodel_tpu.train import create_train_state, make_train_step

    tcfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "model.fused_upsample": True,
        "train.batch_size": 1, "train.accum_steps": 4,
        "train.remat": False,
    })
    state, tx = create_train_state(model, tcfg, jax.random.PRNGKey(0),
                                   steps_per_epoch=100)
    step = jax.jit(make_train_step(model, sched, tcfg, tx, False),
                   donate_argnums=(0,))
    a, b, s = 4, 1, mc.img_size
    batch = {
        "x": jnp.zeros((a, b, s, s, 3)),
        "c": jnp.zeros((a, b), jnp.int32),
        "mask": jnp.ones((a, b, s, s)),
    }
    state, loss = step(state, batch, jax.random.PRNGKey(1))  # compile+warm
    float(loss)  # scalar fetch = sync
    if warm_only:
        print(json.dumps({
            "metric": "warm_cache", "value": 1, "unit": "run",
            "vs_baseline": 1.0,
            "note": "compile-cache warm pass: every benched program "
                    "compiled + executed once; no timings recorded",
        }))
        return
    tbest = float("inf")
    for i in range(3):
        t0 = time.time()
        state, loss = step(state, batch, jax.random.PRNGKey(2 + i))
        float(loss)
        tbest = min(tbest, time.time() - t0)
    train_opt_steps_per_sec = 1.0 / tbest
    train_micro_steps_per_sec = a / tbest
    # Standard model-FLOPs MFU convention: 3x fwd FLOPs per trained image
    # (fwd + 2x bwd; remat recompute is overhead, not useful FLOPs). The
    # XLA cost analysis of the remat train step under-reports (it omits
    # most of the backward), so it is not used here. flops_per_image_step
    # is a CFG-doubled fwd (2 network images) per sample image.
    fwd_flops_per_image = flops_per_image_step / 2.0
    train_mfu = (a * b * 3 * fwd_flops_per_image / tbest
                 / V5E_PEAK_FLOPS * 100)

    baseline_images_per_min = (
        GPU_BASELINE_FLOPS * 60.0 / (flops_per_image_step * dc.n_T)
    )
    vs_baseline = images_per_min / baseline_images_per_min

    # measured-vs-measured anchor (BASELINE config 1): the reference's own
    # MNIST script timed in torch on this host's CPU
    # (benchmarks/bench_torch_baseline.py) against this framework's TPU
    # number for the same config (benchmarks/bench_configs.py). These are
    # MEASUREMENTS on the two platforms actually present in this
    # environment — unlike the flagship's labeled GPU estimate above.
    measured = {}
    import os

    try:
        if os.path.exists("benchmarks/TORCH_BASELINE.json") and \
                os.path.exists("benchmarks/CONFIGS.json"):
            with open("benchmarks/TORCH_BASELINE.json") as f:
                tb = json.load(f)
            with open("benchmarks/CONFIGS.json") as f:
                cfgs = json.load(f)
            tpu_ips = cfgs["config1"]["images_per_sec"]
            measured = {
                "config1_tpu_images_per_sec": tpu_ips,
                "config1_torch_cpu_images_per_sec_measured":
                    tb["train_images_per_sec"],
                "config1_vs_torch_cpu_measured": round(
                    tpu_ips / tb["train_images_per_sec"], 1),
            }
            samp = cfgs["config1"].get("sample_images_per_min")
            if samp and tb.get("sample_images_per_min"):
                measured["config1_sample_vs_torch_cpu_measured"] = round(
                    samp / tb["sample_images_per_min"], 1)
            fl = tb.get("flagship")
            if fl:
                # flagship anchor: the reference's own 353M network
                # (scripy_old.py config) timed in torch on this host's
                # CPU vs this chip's micro-step throughput — both sides
                # MEASURED, images/s vs images/s
                measured["flagship_train_images_per_sec_torch_cpu"] = \
                    fl["train_images_per_sec"]
                measured["flagship_train_vs_torch_cpu_measured"] = round(
                    train_micro_steps_per_sec * b
                    / fl["train_images_per_sec"], 1)
    except Exception:
        pass

    print(json.dumps({
        "metric": "cfg_sampler_images_per_min",
        "value": round(images_per_min, 3),
        "unit": "images/min",
        "vs_baseline": round(vs_baseline, 3),
        "vs_baseline_note": "ESTIMATED analytic GPU baseline, see bench.py",
        "device": str(dev),
        "n_devices": len(jax.devices()),
        "n_sample": n_sample,
        "n_T": dc.n_T,
        "img_size": mc.img_size,
        "fused_upsample": True,
        "denoise_steps_per_sec_per_chip": round(steps_per_sec, 3),
        "sampler_seconds": round(elapsed, 3),
        "sampler_mfu_pct": round(sampler_mfu, 1),
        "ddim50_images_per_min": round(ddim_images_per_min, 3),
        "ddim50_seconds": round(delapsed, 3),
        "dpmpp20_images_per_min": round(dpmpp_images_per_min, 3),
        "dpmpp20_seconds": round(pelapsed, 3),
        "train_opt_steps_per_sec_per_chip": round(train_opt_steps_per_sec, 3),
        "train_micro_steps_per_sec_per_chip": round(
            train_micro_steps_per_sec, 3),
        "train_mfu_pct": round(train_mfu, 1),
        "compile_plus_first_run_seconds": round(compile_and_first, 1),
        "flops_per_image_step": flops_per_image_step,
        "baseline_images_per_min_est": round(baseline_images_per_min, 3),
        **measured,
    }))


if __name__ == "__main__":
    main()
