"""SamplerService throughput on real TPU: concurrent DDIM-50 requests
through one warm compiled program (flagship 353M @256px).

Shows the serving-path numbers: warm-program latency for a single
request, and throughput under concurrent load where cross-request
batching packs the max_batch slots. Prints one JSON object per line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import argparse

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.serving import SamplerService
    from diffusionmodel_tpu.utils import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--ancestral", action="store_true",
                    help="measure ONLY the ancestral-700 service: pinned "
                         "vs unpinned throughput (VERDICT r3 #8 — the "
                         "stochastic samplers batch pinned requests via "
                         "per-slot noise fold-in since round 4)")
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = preset("full", **{
        "model.dtype": "bfloat16", "model.n_classes": 5,
        "sample.sampler": "ddim", "sample.ddim_steps": 50,
    })
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((2, 256, 256, 3))
    v = jax.jit(model.init, static_argnames=("train",))(
        key, x, jnp.zeros((2,), jnp.int32), jnp.full((2,), 0.5),
        jnp.ones((2,)), attn_mask=None, train=False)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, v["params"])

    MAXB = 10
    if args.ancestral:
        # ancestral-700 (the reference's own sampler, STOCHASTIC): since
        # round 4 the per-step z is folded per slot from each request's
        # seed chain, so pinned requests batch with unpinned traffic —
        # unpinned-vs-pinned here is the VERDICT r3 #8 done-criterion.
        with SamplerService(model, cfg, sched, params, max_batch=MAXB,
                            sampler="ancestral") as svc:
            t0 = time.time()
            svc.generate([0], guide_w=4.0)
            print(json.dumps({"stage": "ancestral_warmup",
                              "seconds": round(time.time() - t0, 1)}),
                  flush=True)
            n_req, per = 6, 2
            t0 = time.time()
            futs = [svc.submit([i % 5, (i + 1) % 5], guide_w=4.0)
                    for i in range(n_req)]
            outs = [f.result(timeout=1800) for f in futs]
            dt = time.time() - t0
            assert all(np.isfinite(o).all() for o in outs)
            print(json.dumps({
                "stage": "ancestral_concurrent_unpinned",
                "requests": n_req, "images": n_req * per,
                "seconds": round(dt, 2),
                "images_per_min": round(n_req * per * 60.0 / dt, 2),
            }), flush=True)
            _bench_seed_pinned(svc, np, time, json,
                               stage="ancestral_seed_pinned", timeout=1800)
        return

    with SamplerService(model, cfg, sched, params, max_batch=MAXB,
                        sampler="ddim") as svc:
        # warm compile
        t0 = time.time()
        svc.generate([0], guide_w=4.0)
        print(json.dumps({"stage": "warmup",
                          "seconds": round(time.time() - t0, 1)}), flush=True)

        # single-request warm latency (batch padded to MAXB either way)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            svc.generate([1], guide_w=4.0)
            best = min(best, time.time() - t0)
        print(json.dumps({"stage": "single_request",
                          "latency_s": round(best, 2)}), flush=True)

        # concurrent load: 5 waves x 5 requests of 2 images, same scale —
        # the worker packs them into max_batch=10 slot batches
        n_req, per = 25, 2
        t0 = time.time()
        futs = [svc.submit([i % 5, (i + 1) % 5], guide_w=4.0)
                for i in range(n_req)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.time() - t0
        assert all(np.isfinite(o).all() for o in outs)
        print(json.dumps({
            "stage": "concurrent",
            "requests": n_req, "images": n_req * per,
            "seconds": round(dt, 2),
            "images_per_min": round(n_req * per * 60.0 / dt, 2),
        }), flush=True)

        # MIXED guidance scales: round 2 serialized these (one traced
        # scalar per batch); the per-slot guide_w vector batches them
        # into the same slot layout — throughput should match the
        # single-scale number above.
        scales = [2.0, 3.0, 4.0, 5.0, 6.0]
        t0 = time.time()
        futs = [svc.submit([i % 5, (i + 1) % 5], guide_w=scales[i % 5])
                for i in range(n_req)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.time() - t0
        assert all(np.isfinite(o).all() for o in outs)
        print(json.dumps({
            "stage": "concurrent_mixed_scales",
            "requests": n_req, "images": n_req * per,
            "distinct_scales": len(scales),
            "seconds": round(dt, 2),
            "images_per_min": round(n_req * per * 60.0 / dt, 2),
        }), flush=True)

        # seed-PINNED load: under this DETERMINISTIC sampler (ddim eta=0)
        # pinned requests now batch like everyone else — per-slot start
        # noise is derived from each request's own seed (serving.py
        # module docstring). Round-3-early this stage measured the
        # run-alone cost (6.9 img/min); it now measures batched pinned
        # throughput.
        _bench_seed_pinned(svc, np, time, json)

    # DPM-Solver++(2M)-20 service (round 3): the throughput sampler —
    # same concurrent mixed-scale load through a 20-evaluation program.
    with SamplerService(model, cfg, sched, params, max_batch=MAXB,
                        sampler="dpmpp") as svc:
        t0 = time.time()
        svc.generate([0], guide_w=4.0)
        print(json.dumps({"stage": "dpmpp20_warmup",
                          "seconds": round(time.time() - t0, 1)}), flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            svc.generate([1], guide_w=4.0)
            best = min(best, time.time() - t0)
        print(json.dumps({"stage": "dpmpp20_single_request",
                          "latency_s": round(best, 2)}), flush=True)
        n_req, per = 25, 2
        scales = [2.0, 3.0, 4.0, 5.0, 6.0]
        t0 = time.time()
        futs = [svc.submit([i % 5, (i + 1) % 5], guide_w=scales[i % 5])
                for i in range(n_req)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.time() - t0
        assert all(np.isfinite(o).all() for o in outs)
        print(json.dumps({
            "stage": "dpmpp20_concurrent_mixed_scales",
            "requests": n_req, "images": n_req * per,
            "seconds": round(dt, 2),
            "images_per_min": round(n_req * per * 60.0 / dt, 2),
        }), flush=True)

        # pinned load batches at full throughput on the deterministic
        # dpmpp service too
        _bench_seed_pinned(svc, np, time, json, stage="dpmpp20_seed_pinned")


def _bench_seed_pinned(svc, np, time, json, per=2,
                       stage="concurrent_seed_pinned", timeout=600):
    n_pin = 6
    t0 = time.time()
    futs = [svc.submit([i % 5, (i + 1) % 5], guide_w=4.0, seed=100 + i)
            for i in range(n_pin)]
    outs = [f.result(timeout=timeout) for f in futs]
    dt = time.time() - t0
    assert all(np.isfinite(o).all() for o in outs)
    print(json.dumps({
        "stage": stage,
        "requests": n_pin, "images": n_pin * per,
        "seconds": round(dt, 2),
        "images_per_min": round(n_pin * per * 60.0 / dt, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
