"""Probe the flagship train-step HBM/throughput operating point
(VERDICT r2 weak #2: the round-2 micro-batch probe ran with fp32 Adam
moments; bf16 mu — train.moment_dtype — frees ~0.7 GB of the 16 GB chip,
which may change which (micro-batch, remat) point is fastest).

Variants (all bf16 compute + bf16 mu, effective batch 4):
    mb1r1  micro-batch 1 x accum 4, remat=True   (round-2 default)
    mb1r0  micro-batch 1 x accum 4, remat=False  (no backward recompute)
    mb2r1  micro-batch 2 x accum 2, remat=True
    mb2r0  micro-batch 2 x accum 2, remat=False

Each variant runs in its own subprocess (an OOM must not poison the next
probe). Results append to benchmarks/PROBE_MFU.json.

Usage:  python benchmarks/probe_mfu.py            # drive all variants
        python benchmarks/probe_mfu.py --variant mb1r0   # one, in-process
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

VARIANTS = {
    # name: (batch_size, accum_steps, remat, remat_policy, accum_unroll,
    #        grad_accum_dtype)
    "mb1r0": (1, 4, False, "full", 1, "float32"),
    "mb2r0": (2, 2, False, "full", 1, "float32"),
    "mb2r1": (2, 2, True, "full", 1, "float32"),
    "mb1r1": (1, 4, True, "full", 1, "float32"),
    # round-4 levers (VERDICT r3 #1): selective remat keeps MXU outputs
    # and recomputes only elementwise/norm ops — less recompute than full
    # remat, less HBM than remat OFF — which may unlock micro-batch >=2;
    # accum_unroll=4 unrolls the grad-accumulation scan so XLA can
    # software-pipeline across micro-batches; bf16 grad accumulators halve
    # the scan carry's HBM traffic.
    "mb1r0u4": (1, 4, False, "full", 4, "float32"),
    "mb1r0g": (1, 4, False, "full", 1, "bfloat16"),
    "mb2r1d": (2, 2, True, "dots", 1, "float32"),
    "mb4r1d": (4, 1, True, "dots", 1, "float32"),
    "mb4r1": (4, 1, True, "full", 1, "float32"),
    # fused bilinear-up2+conv3x3 (model.fused_upsample — the bench.py
    # round-4 default path): isolates the fused-TRAIN delta vs mb1r0.
    "mb1r0f": (1, 4, False, "full", 1, "float32"),
    # round-5 composition (VERDICT r4 #2): the two independently-fastest
    # levers together — fused upsample + bf16 grad-accum carry.
    "mb1r0fg": (1, 4, False, "full", 1, "bfloat16"),
    # round-5 conv-aware selective remat (train.remat_policy="conv" —
    # saves conv/dot outputs, recomputes the elementwise/norm tail; the
    # stock "dots" policy was a measured no-op here, ADVICE r4): may
    # unlock micro-batch >= 2, composed with fused upsample + bf16 carry.
    "mb2r1c": (2, 2, True, "conv", 1, "float32"),
    "mb2r1cfg": (2, 2, True, "conv", 1, "bfloat16"),
    "mb4r1cfg": (4, 1, True, "conv", 1, "bfloat16"),
}

# per-variant extra config overrides (beyond the positional tuple)
VARIANT_OVERRIDES = {
    "mb1r0f": {"model.fused_upsample": True},
    "mb1r0fg": {"model.fused_upsample": True},
    "mb2r1cfg": {"model.fused_upsample": True},
    "mb4r1cfg": {"model.fused_upsample": True},
}


def run_variant(name: str) -> dict:
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.train import create_train_state, make_train_step
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, a, remat, policy, unroll, gdt = VARIANTS[name]
    cfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": b, "train.accum_steps": a,
        "train.remat": remat, "train.remat_policy": policy,
        "train.accum_unroll": unroll, "train.grad_accum_dtype": gdt,
        **VARIANT_OVERRIDES.get(name, {}),
    })
    mc, dc = cfg.model, cfg.diffusion
    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   steps_per_epoch=100)
    step = jax.jit(make_train_step(model, sched, cfg, tx, False),
                   donate_argnums=(0,))
    s = mc.img_size
    batch = {
        "x": jnp.zeros((a, b, s, s, 3)),
        "c": jnp.zeros((a, b), jnp.int32),
        "mask": jnp.ones((a, b, s, s)),
    }
    t0 = time.time()
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    float(loss)  # data fetch = the only reliable sync on this platform
    compile_s = time.time() - t0
    tbest = float("inf")
    for i in range(3):
        t0 = time.time()
        state, loss = step(state, batch, jax.random.PRNGKey(2 + i))
        float(loss)
        tbest = min(tbest, time.time() - t0)
    mem = {}
    try:
        st = jax.devices()[0].memory_stats() or {}
        mem = {k: st[k] for k in ("bytes_in_use", "peak_bytes_in_use")
               if k in st}
    except Exception:
        pass
    return {
        "variant": name, "batch_size": b, "accum": a, "remat": remat,
        "remat_policy": policy, "accum_unroll": unroll,
        "grad_accum_dtype": gdt,
        "moment_dtype": cfg.train.moment_dtype,
        "opt_steps_per_sec": round(1.0 / tbest, 3),
        "images_per_sec": round(a * b / tbest, 2),
        "step_seconds": round(tbest, 3),
        "compile_plus_first_seconds": round(compile_s, 1),
        **mem,
    }


def warm_variant(name: str) -> dict:
    """AOT lower+compile the variant's train step (and, for the
    attribution base mb1r0, the fwd / fwd+bwd segment programs) WITHOUT
    executing or allocating device memory — arguments are ShapeDtypeStruct
    trees from jax.eval_shape. Populates the persistent compilation cache
    so the timed probe later starts from cache hits; safe to run while a
    training leg owns the chip's HBM (compiles happen on the remote
    compile service)."""
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.train import (
        _make_loss_fn,
        create_train_state,
        make_train_step,
    )
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, a, remat, policy, unroll, gdt = VARIANTS[name]
    cfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": b, "train.accum_steps": a,
        "train.remat": remat, "train.remat_policy": policy,
        "train.accum_unroll": unroll, "train.grad_accum_dtype": gdt,
        **VARIANT_OVERRIDES.get(name, {}),
    })
    mc, dc = cfg.model, cfg.diffusion
    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    state_and_tx = [None]

    def mk_state():
        st, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                    steps_per_epoch=100)
        state_and_tx[0] = tx  # concrete object, built during tracing
        return st

    state_struct = jax.eval_shape(mk_state)
    tx = state_and_tx[0]
    s = mc.img_size
    kstruct = jax.eval_shape(lambda: jax.random.PRNGKey(1))
    batch_struct = {
        "x": jax.ShapeDtypeStruct((a, b, s, s, 3), jnp.float32),
        "c": jax.ShapeDtypeStruct((a, b), jnp.int32),
        "mask": jax.ShapeDtypeStruct((a, b, s, s), jnp.float32),
    }
    out = {"variant": name, "warmed": []}
    step = jax.jit(make_train_step(model, sched, cfg, tx, False),
                   donate_argnums=(0,))
    t0 = time.time()
    try:
        step.lower(state_struct, batch_struct, kstruct).compile()
        out["warmed"].append(["step", round(time.time() - t0, 1)])
    except Exception as e:  # e.g. compile-time HBM overflow for mb4
        out["warmed"].append(["step", f"FAILED: {str(e)[:200]}"])

    if name in ("mb1r0", "mb1r0fg"):
        loss_fn = _make_loss_fn(model, sched, cfg, has_bn=False,
                                normalize_u8=False)
        xs = jax.ShapeDtypeStruct((b, s, s, 3), jnp.float32)
        cs = jax.ShapeDtypeStruct((b,), jnp.int32)
        ms = jax.ShapeDtypeStruct((b, s, s), jnp.float32)
        pstruct = state_struct.params
        # batch_stats is empty for the flagship (GroupNorm) — pass {}
        bstats = [{}]

        def fwd(params, key, x, c, mask):
            loss, _ = loss_fn(params, bstats[0], key, x, c, mask)
            return loss

        def fwd_bwd(params, key, x, c, mask):
            loss, grads = jax.value_and_grad(fwd)(params, key, x, c, mask)
            return loss + 0.0 * sum(
                jnp.sum(g).astype(jnp.float32)
                for g in jax.tree.leaves(grads)) / 1e9

        for nm, fn in (("fwd", fwd), ("fwd_bwd", fwd_bwd)):
            t0 = time.time()
            try:
                jax.jit(fn).lower(pstruct, kstruct, xs, cs, ms).compile()
                out["warmed"].append([nm, round(time.time() - t0, 1)])
            except Exception as e:
                out["warmed"].append([nm, f"FAILED: {str(e)[:200]}"])
    return out


def run_attribution(fastest: str = "mb1r0") -> dict:
    """Segment attribution for the train step (VERDICT r3 #1): time the
    forward (loss only), forward+backward (value_and_grad), and the full
    optimizer step as SEPARATE programs at the fastest operating point,
    with XLA-cost-analysis FLOPs per segment -> per-segment MFU. The
    difference columns locate the unattributed gap: bwd = t_fb - t_f,
    optimizer(+EMA) = t_step - t_fb."""
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.train import (
        _make_loss_fn,
        create_train_state,
        make_train_step,
    )
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    b, a, remat, policy, unroll, gdt = VARIANTS[fastest]
    cfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": b, "train.accum_steps": a,
        "train.remat": remat, "train.remat_policy": policy,
        "train.accum_unroll": unroll, "train.grad_accum_dtype": gdt,
        **VARIANT_OVERRIDES.get(fastest, {}),
    })
    mc, dc = cfg.model, cfg.diffusion
    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   steps_per_epoch=100)
    s = mc.img_size
    x = jnp.zeros((b, s, s, 3))
    c = jnp.zeros((b,), jnp.int32)
    mask = jnp.ones((b, s, s))
    key = jax.random.PRNGKey(1)

    loss_fn = _make_loss_fn(model, sched, cfg, has_bn=False,
                            normalize_u8=False)
    bstats = [{}]  # flagship is GroupNorm — no batch_stats

    # NOTE: signatures must stay identical to warm_variant's so the
    # AOT-warmed compile-cache entries hit.
    def fwd(params, key, x, c, mask):
        loss, _ = loss_fn(params, bstats[0], key, x, c, mask)
        return loss

    def fwd_bwd(params, key, x, c, mask):
        loss, grads = jax.value_and_grad(fwd)(params, key, x, c, mask)
        # reduce grads to a scalar so the fetch-sync transfers 4 bytes
        return loss + 0.0 * sum(
            jnp.sum(g).astype(jnp.float32)
            for g in jax.tree.leaves(grads)) / 1e9

    step = jax.jit(make_train_step(model, sched, cfg, tx, False),
                   donate_argnums=(0,))
    batch = {"x": jnp.zeros((a, b, s, s, 3)),
             "c": jnp.zeros((a, b), jnp.int32),
             "mask": jnp.ones((a, b, s, s))}

    def timeit(run, n=4):
        run()  # compile + warm
        best = float("inf")
        for _ in range(n):
            t0 = time.time()
            run()
            best = min(best, time.time() - t0)
        return best

    jfwd = jax.jit(fwd)
    jfb = jax.jit(fwd_bwd)
    t_f = timeit(lambda: float(jfwd(state.params, key, x, c, mask)))
    t_fb = timeit(lambda: float(jfb(state.params, key, x, c, mask)))

    stbox = [state]

    def run_step():
        st, loss = step(stbox[0], batch, key)
        stbox[0] = st
        return float(loss)

    t_step = timeit(run_step)

    def gflops(jitted, *args):
        try:
            an = jitted.lower(*args).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            return an.get("flops", 0.0) / 1e9
        except Exception:
            return 0.0

    gf_f = gflops(jfwd, state.params, key, x, c, mask)
    gf_fb = gflops(jfb, state.params, key, x, c, mask)
    peak = 197e3  # GFLOP/s, v5e bf16 (BASELINE.md)
    rec = {
        "variant": f"attr_{fastest}",
        "note": "per-micro-batch fwd/bwd programs; step = accum x "
                f"{a} micro-batches + optimizer + EMA",
        "fwd_s": round(t_f, 4), "fwd_bwd_s": round(t_fb, 4),
        "bwd_s": round(t_fb - t_f, 4),
        "step_s": round(t_step, 4),
        "opt_overhead_s": round(t_step - a * t_fb, 4),
        "fwd_gflop": round(gf_f, 1), "fwd_bwd_gflop": round(gf_fb, 1),
        "fwd_mfu_pct": round(100 * gf_f / t_f / peak, 1) if t_f else 0,
        "fwd_bwd_mfu_pct": (round(100 * gf_fb / t_fb / peak, 1)
                            if t_fb else 0),
        "step_mfu_pct": (round(100 * a * gf_fb / t_step / peak, 1)
                         if t_step else 0),
    }
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--attr", action="store_true",
                    help="segment attribution (fwd/bwd/optimizer) at the "
                         "fastest point instead of throughput variants")
    ap.add_argument("--attr-variant", default="mb1r0",
                    help="operating point for --attr (e.g. mb1r0fg)")
    ap.add_argument("--only-new", action="store_true",
                    help="drive only the round-4 variants (mb1r0u4, "
                         "mb2r1d, mb4r1d, mb4r1)")
    ap.add_argument("--names", default=None,
                    help="comma-separated explicit variant list to drive "
                         "(overrides --only-new), e.g. mb1r0f,mb1r0fg,mb4r1")
    ap.add_argument("--warm", default=None,
                    help="comma-separated variant names to AOT-compile "
                         "(no execution/HBM; populates the persistent "
                         "compile cache), e.g. --warm mb1r0,mb2r1d")
    ap.add_argument("--out", default="benchmarks/PROBE_MFU.json")
    args = ap.parse_args()

    if args.warm:
        for name in args.warm.split(","):
            print(json.dumps(warm_variant(name.strip())), flush=True)
        return

    if args.attr:
        rec = run_attribution(args.attr_variant)
        results = []
        if os.path.exists(args.out):
            try:
                with open(args.out) as f:
                    results = json.load(f)
            except Exception:
                results = []
        results = [r for r in results if r.get("variant") != rec["variant"]]
        results.append(rec)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(json.dumps(rec), flush=True)
        return

    if args.variant:
        print(json.dumps(run_variant(args.variant)), flush=True)
        return

    # merge with any existing record (by variant name) and write after
    # EVERY variant — a crash, timeout, or partial re-run must never
    # clobber hours of committed measurements.
    results = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f)
        except Exception:
            results = []

    def upsert(rec):
        nonlocal results
        results = [r for r in results if r.get("variant") != rec["variant"]]
        results.append(rec)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    if args.names:
        order = tuple(n.strip() for n in args.names.split(","))
    elif args.only_new:
        order = ("mb1r0u4", "mb1r0g", "mb2r1d", "mb4r1d", "mb4r1",
                 "mb1r0f", "mb1r0fg")
    else:
        order = ("mb1r0", "mb2r0", "mb2r1", "mb1r1",
                 "mb1r0u4", "mb1r0g", "mb2r1d", "mb4r1d", "mb4r1",
                 "mb1r0f", "mb1r0fg")
    skip_mb2r0 = False
    for name in order:
        if name == "mb2r0" and skip_mb2r0:
            upsert({"variant": name, "skipped": "mb1r0 OOMed"})
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--variant", name],
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=3600)
            line = (p.stdout.strip().splitlines()[-1]
                    if p.stdout.strip() else "")
            rc, err = p.returncode, (p.stderr or "")[-2000:]
        except subprocess.TimeoutExpired:
            line, rc, err = "", -1, "timeout after 3600s"
        try:
            rec = json.loads(line)
        except Exception:
            rec = {"variant": name, "rc": rc, "error": err}
            if name == "mb1r0":
                skip_mb2r0 = True
        upsert(rec)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
