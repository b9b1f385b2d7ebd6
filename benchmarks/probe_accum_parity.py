"""Numerical parity evidence for bf16 grad accumulation at flagship scale
(ADVICE r4: "before adopting bf16 grad accumulation as a default, record a
loss-curve parity check vs fp32 accumulation").

Runs K train steps of the 353M flagship (micro-batch 1 x accum 4, remat
OFF, fused upsample — the composed round-5 operating point) TWICE on
IDENTICAL data and PRNG keys: once with train.grad_accum_dtype=float32,
once with bfloat16. Records the two loss trajectories, their max relative
divergence, and the relative L2 distance between the final parameter
trees (computed device-side; only scalars cross the tunnel).

The unit-level guarantee is tests/test_train_and_sharding.py::
test_bf16_grad_accum_tracks_fp32 (per-step grads within bf16 rounding);
this probe is the trajectory-level check at the real size.

Usage: python benchmarks/probe_accum_parity.py [--steps 40]
Appends one record to benchmarks/PROBE_MFU.json (variant "accum_parity").
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT = "benchmarks/PROBE_MFU.json"


def run(steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.train import create_train_state, make_train_step
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    a, b = 4, 1

    def build(gdt: str):
        cfg = preset("full", **{
            "model.dtype": "bfloat16", "model.n_classes": 5,
            "model.fused_upsample": True,
            "train.batch_size": b, "train.accum_steps": a,
            "train.remat": False, "train.grad_accum_dtype": gdt,
        })
        model = build_model(cfg.model, cfg.diffusion.high_thresh)
        sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                                cfg.diffusion.n_T)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                       steps_per_epoch=100)
        step = jax.jit(make_train_step(model, sched, cfg, tx, False),
                       donate_argnums=(0,))
        return cfg, state, step

    s = 256
    kx = jax.random.PRNGKey(7)
    # fixed synthetic batch: smooth low-frequency images in [-1, 1] (the
    # trained data regime), balanced classes, full masks — identical for
    # both runs, so any trajectory split is the accumulator dtype.
    x = jnp.tanh(jax.random.normal(kx, (a, b, s, s, 3)))
    batch = {"x": x,
             "c": (jnp.arange(a * b, dtype=jnp.int32) % 5).reshape(a, b),
             "mask": jnp.ones((a, b, s, s))}

    losses = {}
    finals = {}
    for gdt in ("float32", "bfloat16"):
        cfg, state, step = build(gdt)
        t0 = time.time()
        traj = []
        for i in range(steps):
            state, loss = step(state, batch, jax.random.PRNGKey(100 + i))
            traj.append(float(loss))  # scalar fetch = sync
        losses[gdt] = traj
        finals[gdt] = state.params
        del state  # free the opt state (HBM) before the second leg
        print(json.dumps({"leg": gdt, "first": round(traj[0], 6),
                          "last": round(traj[-1], 6),
                          "seconds": round(time.time() - t0, 1)}),
              flush=True)

    @jax.jit
    def param_dist(pa, pb):
        sq = sum(jnp.sum(jnp.square(x.astype(jnp.float32)
                                    - y.astype(jnp.float32)))
                 for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)))
        ref = sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                  for x in jax.tree.leaves(pa))
        return jnp.sqrt(sq / ref)

    rel_param_dist = float(param_dist(finals["float32"], finals["bfloat16"]))
    fa, fb = losses["float32"], losses["bfloat16"]
    rel = [abs(p - q) / max(abs(p), 1e-9) for p, q in zip(fa, fb)]
    return {
        "variant": "accum_parity",
        "steps": steps,
        "loss_fp32_first_last": [round(fa[0], 6), round(fa[-1], 6)],
        "loss_bf16_first_last": [round(fb[0], 6), round(fb[-1], 6)],
        "max_rel_loss_delta": round(max(rel), 6),
        "final_rel_loss_delta": round(rel[-1], 6),
        "final_rel_param_l2_dist": round(rel_param_dist, 6),
        "note": "identical data+keys; delta = grad_accum_dtype only "
                "(fused upsample, remat off, bf16 mu in both legs)",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()
    rec = run(args.steps)
    results = []
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                results = json.load(f)
        except Exception:
            results = []
    results = [r for r in results if r.get("variant") != rec["variant"]]
    results.append(rec)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
