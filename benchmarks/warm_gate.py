"""AOT-prewarm the quality gate's sampler programs (bench_quality.py)
into the persistent compile cache — no device execution or HBM, so it is
safe to run while a training leg owns the chip (compiles happen on the
remote compile service; see trainer.make_sampler.aot_warm).

Must mirror bench_quality.py's EXACT program shapes or the cache entries
are useless: DDIM-50 at n_chunk = chunk_per_class(5) x n_classes(5) = 25
with a concrete `classes` array, and ancestral-700 at n = 20, both
chunk=50, model = flagship bf16 (fused_upsample OFF — gate checkpoints
are sampled with the default graph).

Usage: python benchmarks/warm_gate.py [--ancestral-n 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ancestral-n", type=int, default=20)
    ap.add_argument("--chunk-per-class", type=int, default=5)
    args = ap.parse_args()

    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.trainer import make_sampler
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = preset("full", **{"model.dtype": "bfloat16",
                            "model.n_classes": 5})
    mc = cfg.model
    model = build_model(mc, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)

    pstruct = jax.eval_shape(
        lambda: jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0),
            jnp.zeros((2, mc.img_size, mc.img_size, mc.in_ch)),
            jnp.zeros((2,), jnp.int32), jnp.full((2,), 0.5),
            jnp.ones((2,)), attn_mask=None, train=False))["params"]
    kstruct = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    ws = jax.ShapeDtypeStruct((), jnp.float32)

    n_classes = mc.n_classes
    n_chunk = args.chunk_per_class * n_classes
    classes = jnp.asarray(np.repeat(np.arange(n_classes),
                                    args.chunk_per_class), jnp.int32)
    dcfg = cfg.replace(sample=_dc.replace(
        cfg.sample, sampler="ddim", ddim_steps=50, dpm_steps=50))

    t0 = time.time()
    s = make_sampler(model, dcfg, sched, False, n_chunk,
                     classes=classes, chunk=50)
    s.lower(pstruct, {}, kstruct, ws).compile()
    print(json.dumps({"warmed": "gate_ddim50_n25",
                      "seconds": round(time.time() - t0, 1)}), flush=True)

    if args.ancestral_n:
        acls = jnp.asarray(
            np.repeat(np.arange(n_classes),
                      max(1, args.ancestral_n // n_classes)), jnp.int32)
        t0 = time.time()
        sa = make_sampler(model, cfg, sched, False, int(acls.shape[0]),
                          classes=acls, chunk=50)
        sa.aot_warm(pstruct)
        print(json.dumps({"warmed": f"gate_ancestral_n{int(acls.shape[0])}",
                          "seconds": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
