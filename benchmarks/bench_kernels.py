"""Microbenchmarks: Pallas fused kernels vs plain-XLA twins on real TPU.

Run on the TPU (default env):  python benchmarks/bench_kernels.py
Prints one JSON line per site at the flagship model's actual
CoordAttn/SEBlock sites (128..16 px, 192..1536 channels).

Timing discipline for this tunneled platform (CLAUDE.md):
``jax.block_until_ready`` does NOT synchronize here, a per-call 4-byte
fetch costs a full tunnel RTT (tens of ms — larger than the kernels),
and eager per-op dispatch ALSO pays the tunnel per op. So each
measurement compiles a chain of n dependent calls into ONE program
(``lax.scan`` with out feeding back in — the output shape equals the
input shape for both SE and CoordAttn, and the data dependence forces
sequential execution), pays one dispatch + one scalar fetch, and
subtracts the separately-measured empty-chain floor.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def timed_chain(fn, x, n=50, reps=3):
    """Seconds per call: jit a scan of n dependent calls, one fetch."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    chain = jax.jit(lambda v: jnp.sum(lax.scan(
        lambda carry, _: (fn(carry), None), v, None, length=n)[0]))
    float(chain(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(chain(x))
        best = min(best, time.time() - t0)
    return best / n


def fetch_floor(x, reps=3, n=50):
    """The chain's fixed cost (dispatch + sum + fetch RTT), per call."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(jnp.sum)
    float(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(f(x))
        best = min(best, time.time() - t0)
    return best / n


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.kernels.coord_attn import (
        CoordAttnWeights,
        coord_attn_fused,
    )
    from diffusionmodel_tpu.kernels.se_block import se_block_fused
    from diffusionmodel_tpu.nn.blocks import gn_groups
    from diffusionmodel_tpu.nn.coord_attn import CoordAttn
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print("device:", jax.devices()[0])

    b = 8
    sites = [(128, 192), (64, 384), (32, 768), (16, 1536)]

    for hw, c in sites:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c),
                              dtype=jnp.bfloat16)
        floor = fetch_floor(x)

        # SEBlock
        r = max(1, c // 16)
        w1 = (jax.random.normal(jax.random.PRNGKey(1), (c, r)) * 0.02
              ).astype(jnp.bfloat16)
        w2 = (jax.random.normal(jax.random.PRNGKey(2), (r, c)) * 0.02
              ).astype(jnp.bfloat16)
        t_xla = timed_chain(
            lambda v: se_block_fused(v, w1, w2, force_xla=True), x) - floor
        t_pl = timed_chain(lambda v: se_block_fused(v, w1, w2), x) - floor
        print(json.dumps({
            "site": f"SE {hw}x{c}", "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / max(t_pl, 1e-9), 2)}), flush=True)

        # CoordAttn
        mod = CoordAttn(c, norm="group")
        variables = mod.init(jax.random.PRNGKey(3),
                             jnp.zeros((1, hw, hw, c)), train=False)
        wts = CoordAttnWeights(variables["params"], None, norm_kind="group")
        g = gn_groups(max(1, c // 16), 8)
        t_xla = timed_chain(
            lambda v: coord_attn_fused(v, wts, "group", g, force_xla=True),
            x) - floor
        t_pl = timed_chain(
            lambda v: coord_attn_fused(v, wts, "group", g), x) - floor
        print(json.dumps({
            "site": f"CA {hw}x{c}", "xla_ms": round(t_xla * 1e3, 3),
            "pallas_ms": round(t_pl * 1e3, 3),
            "speedup": round(t_xla / max(t_pl, 1e-9), 2)}), flush=True)
