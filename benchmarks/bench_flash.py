"""Flash-attention Pallas kernel vs XLA einsum attention on real TPU.

Shapes are the LDM SpatialTransformer self-attention sites (VERDICT r1
weak #2: the kernel was never benchmarked at its natural 4096-token site):
SD-v1 U-Net, 8 heads, d_head 40 (320ch) / 80 (640ch) / 160 (1280ch), with
token counts from a 512px image (64x64 latent -> N=4096 at level 0) and
the 256px stretch config (32x32 latent -> N=1024). Also times a
lane-aligned d=64/128 variant to isolate the head-dim padding effect.

Prints one JSON object per line; use the scalar-fetch sync (float(mean))
— block_until_ready does not synchronize on this tunneled platform.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def timeit(fn, n=8):
    float(fn())  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.kernels.flash_attn import (
        attention_xla,
        flash_attention,
    )
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)

    # (label, B, N, H, D) — B=2 is the CFG-doubled single-image batch
    sites = [
        ("ldm512_lvl0 N=4096 d=40", 2, 4096, 8, 40),
        ("ldm512_lvl1 N=1024 d=80", 2, 1024, 8, 80),
        ("ldm256_lvl0 N=1024 d=40", 2, 1024, 8, 40),
        ("aligned    N=4096 d=64", 2, 4096, 8, 64),
        ("aligned    N=4096 d=128", 2, 4096, 8, 128),
        ("batch8     N=4096 d=64", 8, 4096, 8, 64),
        # long-context site (round 3): a 1024px image's level-0 latent is
        # 128x128 -> N=16384 tokens. XLA's einsum attention materializes
        # the [B,H,N,N] scores: 16384^2 x 8 heads x 2B bf16 = 4.3 GB per
        # image in flight — the streaming kernel holds O(block) VMEM.
        ("long-ctx   N=16384 d=64", 1, 16384, 8, 64),
        # non-divisible N exercises the in-kernel tail masking (no XLA
        # fallback since round 3)
        ("tail-mask  N=4000 d=64", 2, 4000, 8, 64),
    ]

    # 20 chained calls inside ONE program (output feeds back as q) so the
    # ~24ms dispatch round-trip amortizes; per-call = total/20.
    REPS = 20

    def chain(attn):
        def f(q, k, v):
            def body(q, _):
                return attn(q, k, v).astype(q.dtype), None

            q, _ = jax.lax.scan(body, q, None, length=REPS)
            return jnp.mean(q.astype(jnp.float32))

        return jax.jit(f)

    jx = chain(attention_xla)
    jfl = chain(flash_attention)

    # --- backward (round 3: streaming custom_vjp) -----------------------
    # grad of a scalar loss through REPS_B chained attentions: times
    # fwd+bwd together (the training-step shape of the cost). XLA's bwd
    # re-materializes the [N,N] score matrix; the kernel streams it.
    REPS_B = 4

    def chain_grad(attn):
        def loss(q, k, v):
            def body(q, _):
                return attn(q, k, v).astype(q.dtype), None

            q, _ = jax.lax.scan(body, q, None, length=REPS_B)
            return jnp.sum(q.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))

        def f(q, k, v):
            dq, dk, dv = g(q, k, v)
            return (jnp.mean(dq.astype(jnp.float32))
                    + jnp.mean(dk.astype(jnp.float32))
                    + jnp.mean(dv.astype(jnp.float32)))

        return jax.jit(f)

    jgx = chain_grad(attention_xla)
    jgf = chain_grad(flash_attention)

    bwd_sites = [
        ("bwd aligned N=4096 d=64", 2, 4096, 8, 64),
        ("bwd batch8  N=4096 d=64", 8, 4096, 8, 64),
        ("bwd long-ctx N=16384 d=64", 1, 16384, 8, 64),
    ]

    for label, b, n, h, d in sites:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, n, h, d), jnp.bfloat16)
        try:
            t_x = timeit(lambda: jx(q, k, v)) / REPS
        except Exception as e:  # XLA can OOM at the long-context site
            t_x = None
            xla_err = f"{type(e).__name__}"
        t_f = timeit(lambda: jfl(q, k, v)) / REPS
        # attention FLOPs: 2 matmuls, 2*N*N*D each, per batch*head
        flops = 2 * 2 * b * h * n * n * d
        print(json.dumps({
            "site": label,
            "xla_ms": round(t_x * 1e3, 2) if t_x else xla_err,
            "flash_ms": round(t_f * 1e3, 2),
            "speedup": round(t_x / t_f, 2) if t_x else None,
            "flash_tflops": round(flops / t_f / 1e12, 1),
        }), flush=True)

    for label, b, n, h, d in bwd_sites:
        ks = jax.random.split(jax.random.fold_in(key, n + b), 3)
        q = jax.random.normal(ks[0], (b, n, h, d), jnp.bfloat16)
        k = jax.random.normal(ks[1], (b, n, h, d), jnp.bfloat16)
        v = jax.random.normal(ks[2], (b, n, h, d), jnp.bfloat16)
        try:
            t_x = timeit(lambda: jgx(q, k, v), n=4) / REPS_B
        except Exception as e:
            t_x, xla_err = None, f"{type(e).__name__}"
        try:
            t_f = timeit(lambda: jgf(q, k, v), n=4) / REPS_B
        except Exception as e:
            print(json.dumps({"site": label,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)
            continue
        # fwd (2 matmuls) + bwd (5 matmuls) per attention
        flops = 7 * 2 * b * h * n * n * d
        print(json.dumps({
            "site": label,
            "xla_ms": round(t_x * 1e3, 2) if t_x else xla_err,
            "flash_ms": round(t_f * 1e3, 2),
            "speedup": round(t_x / t_f, 2) if t_x else None,
            "flash_tflops": round(flops / t_f / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
