"""Measured conv-only MFU ceiling at the flagship sampler's hot shapes
(VERDICT r4 #4: either attack down1/init@256 further or prove the
composed sampler's 51.4% MFU is within a few points of what an ISOLATED
conv of the same shape can reach on this chip).

The flagship forward is dominated by 3x3 convs at 192 channels
(n_feat=192 = 1.5x the 128-lane MXU width; RESULTS.md block table):
down1/resblocks are 192->192@256px, up4's entry conv is 384->192@256px,
init_res's first conv is 3->192@256px. This bench times each conv ALONE
— one weight tensor, a 50-call dependent `lax.scan` chain compiled into
a single program (same discipline as bench_kernels.py: one dispatch, one
scalar fetch; the tunnel RTT would otherwise dominate) — and converts
XLA cost-analysis FLOPs to MFU vs the 197 TFLOP/s v5e bf16 peak.

If the isolated 192-channel conv itself tops out near the sampler's
composed MFU, the sampler is conv-ceiling-bound at this architecture
shape and chip, and further block surgery cannot help; the remaining gap
to peak is the lane-occupancy tax (192 = 128 + 64: one full + one
half-filled MXU pass) plus I/O of the 256px activations.

Usage: python benchmarks/bench_conv_ceiling.py [--batch 40]
Writes benchmarks/CONV_CEILING.json and prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

PEAK_GFLOPS = 197e3  # v5e bf16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=40,
                    help="bench.py hot shape: n_sample 20, CFG-doubled")
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--out", default="benchmarks/CONV_CEILING.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.bfloat16
    B, n = args.batch, args.chain
    key = jax.random.PRNGKey(0)

    # (name, cin, cout, hw, re_chain): re_chain maps the conv output back
    # to a valid input so calls can chain with a data dependence.
    shapes = [
        ("conv192_192@256", 192, 192, 256, None),                # down1 conv
        ("conv384_192@256", 384, 192, 256,
         lambda y: jnp.concatenate([y, y], axis=-1)),            # up4 entry
        ("conv192_192@128", 192, 192, 128, None),                # up4 resblock
        ("conv3_192@256", 3, 192, 256, lambda y: y[..., :3]),    # init conv
        # the lane-aligned control: 256 channels = exactly 2 MXU passes.
        # Same arithmetic class, no half-filled pass — the delta vs
        # conv192 isolates the lane-occupancy tax.
        ("conv256_256@256", 256, 256, 256, None),
        ("conv128_128@256", 128, 128, 256, None),                # 1 full pass
    ]

    results = {}
    for name, cin, cout, hw, re_chain in shapes:
        w = jax.random.normal(key, (3, 3, cin, cout), dt) * 0.02

        def one(x, w):
            return lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt)

        def body(x, _, w=w, rc=re_chain):
            y = one(x, w)
            return (rc(y) if rc is not None else y), None

        def chain(x, w):
            return jnp.sum(
                lax.scan(lambda c, _: body(c, _, w), x, None,
                         length=n)[0].astype(jnp.float32))

        x0 = jax.random.normal(key, (B, hw, hw, cin), dt)
        jc = jax.jit(chain)
        # Analytic FLOPs (2 * MACs), the standard convention. XLA
        # cost_analysis is NOT usable here: it counts the scan body ONCE
        # regardless of trip count, which under-reported the first run of
        # this bench by exactly the chain length (50x).
        gflop_per_call = 2.0 * B * hw * hw * 9 * cin * cout / 1e9
        try:
            float(jc(x0, w))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                float(jc(x0, w))
                best = min(best, time.time() - t0)
            per_call = best / n
            rec = {
                "ms": round(per_call * 1e3, 3),
                "gflop": round(gflop_per_call, 1),
                "tflops": round(gflop_per_call / per_call / 1e3, 1),
                "mfu_pct": round(
                    100 * gflop_per_call / per_call / PEAK_GFLOPS, 1),
            }
        except Exception as e:
            rec = {"error": str(e)[:160]}
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    with open(args.out, "w") as f:
        json.dump({"batch": B, "dtype": "bfloat16", "chain": n,
                   "peak_gflops": PEAK_GFLOPS, "results": results},
                  f, indent=2)
    print(json.dumps({"wrote": args.out}), flush=True)


if __name__ == "__main__":
    main()
