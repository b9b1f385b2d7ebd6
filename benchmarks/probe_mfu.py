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
    # name: (batch_size, accum_steps, remat)
    "mb1r0": (1, 4, False),
    "mb2r0": (2, 2, False),
    "mb2r1": (2, 2, True),
    "mb1r1": (1, 4, True),
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
    b, a, remat = VARIANTS[name]
    cfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": b, "train.accum_steps": a,
        "train.remat": remat,
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
        "moment_dtype": cfg.train.moment_dtype,
        "opt_steps_per_sec": round(1.0 / tbest, 3),
        "images_per_sec": round(a * b / tbest, 2),
        "step_seconds": round(tbest, 3),
        "compile_plus_first_seconds": round(compile_s, 1),
        **mem,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default=None)
    ap.add_argument("--out", default="benchmarks/PROBE_MFU.json")
    args = ap.parse_args()

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

    skip_mb2r0 = False
    for name in ("mb1r0", "mb2r0", "mb2r1", "mb1r1"):
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
