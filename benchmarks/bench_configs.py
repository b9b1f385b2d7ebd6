"""Measured training throughput for BASELINE.md reference configs 1-2.

- config 1: the MNIST conditional DDPM (MNIST_script.py:303-394 — 28px,
  n_feat 128, n_T 400, batch 256, Adam) — synthetic MNIST-shaped data
  (no MNIST download in this zero-egress image; compute is identical).
- config 2: the scripy_old baseline conditional DDPM (scripy_old.py:
  537-654 — 256px, n_feat 192, n_T 700, batch 1, no LocalEnhancer,
  AdamW+SGDR) — the proven-runnable full-size reference config, with the
  same bf16+remat memory recipe as the flagship.

Configs 3-5 are covered by bench.py (full v2 train+sample), the CLI
guidance sweep, and benchmarks/bench_ldm.py. Prints one JSON per config.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def time_train_steps(cfg, batch_shape_override=None, n=3):
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.train import create_train_state, make_train_step

    mc, tc = cfg.model, cfg.train
    model = build_model(mc, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0),
                                   steps_per_epoch=100)
    has_bn = bool(state.batch_stats)  # mnist preset: BatchNorm (parity)
    step = jax.jit(make_train_step(model, sched, cfg, tx, has_bn),
                   donate_argnums=(0,))
    a, b, s = tc.accum_steps, tc.batch_size, mc.img_size
    batch = {
        "x": jnp.zeros((a, b, s, s, mc.in_ch)),
        "c": jnp.zeros((a, b), jnp.int32),
        "mask": jnp.ones((a, b, s, s)),
    }
    t0 = time.time()
    state, loss = step(state, batch, jax.random.PRNGKey(1))
    float(loss)  # data fetch = sync on this platform
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(n):
        t0 = time.time()
        state, loss = step(state, batch, jax.random.PRNGKey(2 + i))
        float(loss)
        best = min(best, time.time() - t0)
    return best, compile_s, a * b


def main() -> None:
    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # config 1: MNIST (batch 256, fp32 like the reference's default)
    mnist = preset("mnist")
    best, comp, imgs = time_train_steps(mnist)
    rec = {
        "config": "mnist (BASELINE config 1, synthetic data)",
        "img_size": mnist.model.img_size, "batch": imgs,
        "opt_steps_per_sec": round(1.0 / best, 2),
        "images_per_sec": round(imgs / best, 1),
        "compile_s": round(comp, 1),
    }
    # measured-vs-measured anchor: the reference's OWN script timed on
    # this host's CPU (benchmarks/bench_torch_baseline.py) — the only
    # hardware the reference runs on here. Not a GPU estimate.
    import os

    tb_path = "benchmarks/TORCH_BASELINE.json"
    tb = None
    if os.path.exists(tb_path):
        with open(tb_path) as f:
            tb = json.load(f)
        rec["torch_cpu_images_per_sec_measured"] = tb["train_images_per_sec"]
        rec["vs_torch_cpu_measured"] = round(
            (imgs / best) / tb["train_images_per_sec"], 1)

    # config-1 SAMPLING, the reference's own eval recipe: 40 images
    # (4/class), 400-step ancestral CFG at w=2.0 (MNIST_script.py:354-357)
    # — the apples-to-apples pair for TORCH_BASELINE's sample phase.
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.trainer import make_sampler
    from diffusionmodel_tpu.utils.transfer import fetch_tree

    model = build_model(mnist.model, mnist.diffusion.high_thresh)
    sched = Schedule.create(mnist.diffusion.beta1, mnist.diffusion.beta2,
                            mnist.diffusion.n_T)
    x0 = jnp.zeros((2, 28, 28, 1))
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x0, jnp.zeros((2,), jnp.int32),
        jnp.full((2,), 0.5), jnp.ones((2,)), attn_mask=None, train=False)
    n_s = 40
    sampler = make_sampler(model, mnist, sched, bool(v.get("batch_stats")),
                           n_s, chunk=400)
    bs = v.get("batch_stats", {})
    fetch_tree(sampler(v["params"], bs, jax.random.PRNGKey(1),
                       jnp.float32(2.0)))  # compile + warm
    best_s = float("inf")
    for i in range(2):
        t0 = time.time()
        fetch_tree(sampler(v["params"], bs, jax.random.PRNGKey(2 + i),
                           jnp.float32(2.0)))
        best_s = min(best_s, time.time() - t0)
    rec["sample_images_per_min"] = round(n_s * 60.0 / best_s, 1)
    rec["sample_n"] = n_s
    if tb is not None and tb.get("sample_images_per_min"):
        rec["sample_vs_torch_cpu_measured"] = round(
            rec["sample_images_per_min"] / tb["sample_images_per_min"], 1)
    print(json.dumps(rec), flush=True)

    # config 2: scripy_old v1 arch, full size, bf16+remat memory recipe
    old = preset("old", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": 1, "train.accum_steps": 4,
    })
    best, comp, imgs = time_train_steps(old)
    rec2 = {
        "config": "scripy_old v1 (BASELINE config 2)",
        "img_size": old.model.img_size, "batch": imgs,
        "opt_steps_per_sec": round(1.0 / best, 3),
        "images_per_sec": round(imgs / best, 2),
        "compile_s": round(comp, 1),
    }
    print(json.dumps(rec2), flush=True)
    with open("benchmarks/CONFIGS.json", "w") as f:
        json.dump({"config1": rec, "config2": rec2}, f, indent=2)


if __name__ == "__main__":
    main()
