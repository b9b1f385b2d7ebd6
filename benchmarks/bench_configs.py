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
    print(json.dumps({
        "config": "mnist (BASELINE config 1, synthetic data)",
        "img_size": mnist.model.img_size, "batch": imgs,
        "opt_steps_per_sec": round(1.0 / best, 2),
        "images_per_sec": round(imgs / best, 1),
        "compile_s": round(comp, 1),
    }), flush=True)

    # config 2: scripy_old v1 arch, full size, bf16+remat memory recipe
    old = preset("old", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "train.batch_size": 1, "train.accum_steps": 4,
    })
    best, comp, imgs = time_train_steps(old)
    print(json.dumps({
        "config": "scripy_old v1 (BASELINE config 2)",
        "img_size": old.model.img_size, "batch": imgs,
        "opt_steps_per_sec": round(1.0 / best, 3),
        "images_per_sec": round(imgs / best, 2),
        "compile_s": round(comp, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
