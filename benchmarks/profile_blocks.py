"""Block-level timing of the flagship ContextUnet forward on real TPU.

Times each architectural block standalone at its flagship shape (n_feat=192,
256px, CFG-doubled batch), plus the full forward in fp32-params vs
bf16-params variants — the measurement base for the MFU optimization pass
(VERDICT r1 'what's weak' #1/#4). Prints one JSON object per line.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

BATCH = 40  # n_sample=20 with CFG doubling — the bench.py hot shape
NF = 192


def timeit(fn, *args, n=6):
    """fn must return a SCALAR: on this tunneled TPU platform
    block_until_ready does NOT wait for remote execution — fetching the
    (4-byte) result via float() is the only reliable sync point."""
    float(fn(*args))  # warm-up / compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.nn.blocks import ResConvBlock, UnetDown, UnetUp
    from diffusionmodel_tpu.nn.coord_attn import CoordAttn
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    sites = []
    # (name, module, input shape [B,H,W,C])
    sites.append(("init_res@256", ResConvBlock(3, NF, is_res=True, dtype=dt),
                  (BATCH, 256, 256, 3)))
    downs = [(NF, NF, 256), (NF, 2 * NF, 128), (2 * NF, 4 * NF, 64),
             (4 * NF, 8 * NF, 32)]
    for i, (ci, co, hw) in enumerate(downs):
        sites.append((f"down{i+1}@{hw}", UnetDown(ci, co, dtype=dt),
                      (BATCH, hw, hw, ci)))
        sites.append((f"ca{i+1}@{hw//2}", CoordAttn(co, 16, dtype=dt),
                      (BATCH, hw // 2, hw // 2, co)))
    ups = [(16 * NF, 4 * NF, 16), (8 * NF, 2 * NF, 32), (4 * NF, NF, 64),
           (2 * NF, NF, 128)]
    for i, (ci, co, hw) in enumerate(ups):
        # UnetUp input: x and skip each ci//2 channels at hw
        sites.append((f"up{i+1}@{hw}->{hw*2}",
                      UnetUp(ci, co, dtype=dt), (BATCH, hw, hw, ci // 2)))

    # tunnel round-trip: time a trivial scalar program
    triv = jax.jit(lambda s: s * 2.0)
    rtt = timeit(triv, jnp.float32(1.0), n=10)
    print(json.dumps({"block": "rtt_trivial_program",
                      "ms": round(rtt * 1e3, 2)}), flush=True)

    results = {}
    total = 0.0
    for name, mod, shp in sites:
        x = jax.random.normal(key, shp, jnp.float32)
        if name.startswith("up"):
            skip = jax.random.normal(key, shp, jnp.float32)
            v = mod.init(key, x, skip, False)
            f = jax.jit(lambda v, a, b: jnp.mean(mod.apply(v, a, b, False)))
            dtime = timeit(f, v, x, skip)
        elif name.startswith("ca"):
            v = mod.init(key, x, train=False)
            f = jax.jit(lambda v, a: jnp.mean(mod.apply(v, a, train=False)))
            dtime = timeit(f, v, x)
        else:
            v = mod.init(key, x, False)
            f = jax.jit(lambda v, a: jnp.mean(mod.apply(v, a, False)))
            dtime = timeit(f, v, x)
        results[name] = round(dtime * 1e3, 2)
        total += dtime
        print(json.dumps({"block": name, "ms": results[name]}), flush=True)

    print(json.dumps({"block": "SUM(blocks)", "ms": round(total * 1e3, 2)}),
          flush=True)

    # full forward, fp32 params (compute bf16) vs bf16 params
    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.nn import build_model

    cfg = preset("full", **{"model.dtype": "bfloat16", "model.n_classes": 5})
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    x = jax.random.normal(key, (BATCH, 256, 256, 3), jnp.float32)
    c = jnp.zeros((BATCH,), jnp.int32)
    t = jnp.full((BATCH,), 0.5)
    ctx = jnp.ones((BATCH,))
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, x[:2], c[:2], t[:2], ctx[:2], attn_mask=None, train=False)

    def fwd(v, x, c, t, ctx):
        return jnp.mean(model.apply(v, x, c, t, ctx, attn_mask=None,
                                    train=False))

    jf = jax.jit(fwd)
    t_fp32 = timeit(jf, variables, x, c, t, ctx)
    print(json.dumps({"block": "FULL fwd fp32-params", "ms":
                      round(t_fp32 * 1e3, 2)}), flush=True)

    bf16_vars = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
    t_bf16 = timeit(jf, bf16_vars, x, c, t, ctx)
    print(json.dumps({"block": "FULL fwd bf16-params", "ms":
                      round(t_bf16 * 1e3, 2)}), flush=True)

    # MFU: flops from cost analysis at this batch
    try:
        cost = jf.lower(variables, x, c, t, ctx).compile().cost_analysis()
        flops = float(cost.get("flops", 0.0))
        peak = 197e12  # v5e bf16 peak FLOP/s
        print(json.dumps({
            "block": "MFU", "tflop_per_fwd": round(flops / 1e12, 2),
            "mfu_fp32_params_pct": round(flops / t_fp32 / peak * 100, 1),
            "mfu_bf16_params_pct": round(flops / t_bf16 / peak * 100, 1),
        }), flush=True)
    except Exception as e:
        print(json.dumps({"block": "MFU", "error": str(e)[:100]}), flush=True)


if __name__ == "__main__":
    main()
