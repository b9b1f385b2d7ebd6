"""Microbenchmarks: Pallas fused kernels vs plain-XLA twins on real TPU.

Run on the TPU (default env):  python benchmarks/bench_kernels.py
Prints a small table of per-call times at the flagship model's actual
CoordAttn/SEBlock sites (128..16 px, 192..1536 channels).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.kernels.coord_attn import (
        CoordAttnWeights,
        coord_attn_fused,
    )
    from diffusionmodel_tpu.kernels.se_block import se_block_fused
    from diffusionmodel_tpu.nn.coord_attn import CoordAttn
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    print("device:", jax.devices()[0])

    b = 8
    sites = [(128, 192), (64, 384), (32, 768), (16, 1536)]

    print(f"{'site':>14} {'xla_ms':>8} {'pallas_ms':>10} {'speedup':>8}")
    for hw, c in sites:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, c),
                              dtype=jnp.bfloat16)
        # SEBlock
        r = max(1, c // 16)
        w1 = jax.random.normal(jax.random.PRNGKey(1), (c, r)) * 0.02
        w2 = jax.random.normal(jax.random.PRNGKey(2), (r, c)) * 0.02
        t_xla = timeit(se_block_fused, x, w1, w2, force_xla=True)
        t_pl = timeit(se_block_fused, x, w1, w2)
        print(f"SE {hw:>4}x{c:<5} {t_xla*1e3:8.3f} {t_pl*1e3:10.3f} "
              f"{t_xla/max(t_pl,1e-9):8.2f}x")

        # CoordAttn
        mod = CoordAttn(c, norm="group")
        variables = mod.init(jax.random.PRNGKey(3),
                             jnp.zeros((1, hw, hw, c)), train=False)
        wts = CoordAttnWeights(variables["params"], None, norm_kind="group")
        from diffusionmodel_tpu.nn.blocks import gn_groups

        g = gn_groups(max(1, c // 16), 8)
        t_xla = timeit(coord_attn_fused, x, wts, "group", g, force_xla=True)
        t_pl = timeit(coord_attn_fused, x, wts, "group", g)
        print(f"CA {hw:>4}x{c:<5} {t_xla*1e3:8.3f} {t_pl*1e3:10.3f} "
              f"{t_xla/max(t_pl,1e-9):8.2f}x")
