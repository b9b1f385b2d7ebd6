"""Dissect the two profiled sampler hot blocks — up4@128->256 (141 ms) and
down1@256 (98 ms), together ~43% of the flagship forward
(profile_blocks.py / RESULTS.md) — and measure the VERDICT r3 #2
experiments against them:

- ``dissect``: time up4's sub-ops standalone (cat+bilinear-up, the 3x3
  384->192 conv, one ResConvBlock) with XLA-cost-analysis FLOPs ->
  per-sub-op MFU, locating where the 141 ms goes.
- ``lane-pad``: the flagship's 192-channel convs sit at 1.5x the 128-lane
  MXU width. Zero-padding channels up to 256 is numerically identical
  (extra inputs are zero, extra outputs are sliced off) but fills the
  lanes — measure whether XLA's conv runs FASTER with nominally more
  FLOPs. Variants: 384->192 conv as 384->256-sliced and 512pad->192,
  192->192 as 256pad->256-sliced.
- ``convtranspose``: nn.ConvTranspose(2,2) as the upsample (different
  math — informational only: what the block would cost if the
  architecture used the transposed conv the reference's OTHER models use,
  new_scripy.py:237-253 is bilinear+conv).

``--warm`` AOT-lowers+compiles every program (writing the persistent
compilation cache) WITHOUT executing — safe to run while a training leg
owns the chip's HBM; the timed run then starts from cache hits.

Usage: python benchmarks/bench_up4.py [--warm] [--out benchmarks/UP4.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

BATCH = 40  # bench.py hot shape: n_sample 20, CFG-doubled
NF = 192
PEAK_GFLOPS = 197e3  # v5e bf16


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", action="store_true",
                    help="AOT compile only (no execution, no HBM)")
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--out", default="benchmarks/UP4.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu.nn.blocks import ResConvBlock, UnetDown, UnetUp, conv
    from diffusionmodel_tpu.ops.resize import upsample_bilinear_align_corners
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    dt = jnp.bfloat16
    B = args.batch
    key = jax.random.PRNGKey(0)

    # ---- program definitions (params are jit ARGUMENTS) ----
    import flax.linen as nn

    progs = {}  # name -> (jitted_fn, arg_structs_or_arrays builder)

    def reg(name, module, shapes, call=None):
        """module applied to zeros of `shapes` (list of input shapes)."""
        structs = [jax.ShapeDtypeStruct(s, dt) for s in shapes]
        params = None

        def make_args():
            xs = [jnp.zeros(s, dt) for s in shapes]
            p = module.init(key, *xs)
            return (p, *xs)

        def f(p, *xs):
            out = module.apply(p, *xs) if call is None else call(module, p, *xs)
            return jnp.sum(out.astype(jnp.float32))

        jf = jax.jit(f)

        def struct_args():
            p = jax.eval_shape(lambda: module.init(key, *[
                jnp.zeros(s, dt) for s in shapes]))
            return (p, *structs)

        progs[name] = (jf, make_args, struct_args)

    # up4 sub-ops at flagship shapes
    class CatUp(nn.Module):
        @nn.compact
        def __call__(self, x, skip):
            return upsample_bilinear_align_corners(
                jnp.concatenate([x, skip], axis=-1), 2)

    reg("catup@128", CatUp(), [(B, 128, 128, NF), (B, 128, 128, NF)])

    class Conv1(nn.Module):
        cin: int
        cout: int
        pad_to: int = 0   # lane-pad experiment: pad cin/cout up, slice out

        @nn.compact
        def __call__(self, x):
            cin, cout = self.cin, self.cout
            if self.pad_to:
                pin = self.pad_to - (cin % self.pad_to or self.pad_to)
                pout = self.pad_to - (cout % self.pad_to or self.pad_to)
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pin)))
                y = conv(cout + pout, 3, cin + pin, dtype=dt)(x)
                return y[..., :cout]
            return conv(cout, 3, cin, dtype=dt)(x)

    reg("conv384_192@256", Conv1(2 * NF, NF), [(B, 256, 256, 2 * NF)])
    reg("conv384_192@256_pad256", Conv1(2 * NF, NF, pad_to=256),
        [(B, 256, 256, 2 * NF)])
    reg("conv192_192@256", Conv1(NF, NF), [(B, 256, 256, NF)])
    reg("conv192_192@256_pad256", Conv1(NF, NF, pad_to=256),
        [(B, 256, 256, NF)])
    reg("resblock192@256", ResConvBlock(NF, NF, dtype=dt),
        [(B, 256, 256, NF)])
    reg("up4_full", UnetUp(2 * NF, NF, dtype=dt),
        [(B, 128, 128, NF), (B, 128, 128, NF)])
    reg("down1_full", UnetDown(NF, NF, dtype=dt), [(B, 256, 256, NF)])

    class TConv(nn.Module):
        @nn.compact
        def __call__(self, x, skip):
            x = jnp.concatenate([x, skip], axis=-1)
            return nn.ConvTranspose(NF, (2, 2), strides=(2, 2), dtype=dt)(x)

    reg("convtranspose_up@128", TConv(),
        [(B, 128, 128, NF), (B, 128, 128, NF)])

    # exact up2+conv fusion (ops/fused_upconv.py): same params, the conv
    # runs at half the rows — the VERDICT r3 #2 "compose the matmuls"
    # experiment, block-level and full-forward
    reg("up4_full_fused", UnetUp(2 * NF, NF, dtype=dt, fused_upsample=True),
        [(B, 128, 128, NF), (B, 128, 128, NF)])

    from diffusionmodel_tpu.nn.factory import build_model
    from diffusionmodel_tpu.config import preset

    for fused in (False, True):
        cfg = preset("full", **{"model.dtype": "bfloat16",
                                "model.n_classes": 5,
                                "model.fused_upsample": fused})
        net = build_model(cfg.model, cfg.diffusion.high_thresh)
        name = "fwd_full_fused" if fused else "fwd_full"

        class _Fwd:
            """Duck-typed module wrapper: flagship forward at the CFG
            sampler's hot shape. init is jitted (eager init of the 353M
            model dispatches per-op over the tunnel)."""

            def __init__(self, n):
                self.n = n

            def init(self, k, x):
                b = x.shape[0]
                return jax.jit(self.n.init)(
                    k, x, jnp.zeros((b,), jnp.int32),
                    jnp.full((b,), 0.5), jnp.ones((b,)))

            def apply(self, p, x):
                b = x.shape[0]
                return self.n.apply(
                    p, x, jnp.zeros((b,), jnp.int32),
                    jnp.full((b,), 0.5), jnp.ones((b,)))

        reg(name, _Fwd(net), [(B, 256, 256, 3)])

    if args.warm:
        for name, (jf, _, struct_args) in progs.items():
            t0 = time.time()
            jf.lower(*struct_args()).compile()
            print(json.dumps({"warmed": name,
                              "seconds": round(time.time() - t0, 1)}),
                  flush=True)
        return

    results = {}
    for name, (jf, make_args, struct_args) in progs.items():
        xs = make_args()
        lowered = jf.lower(*struct_args()).compile()
        try:
            an = lowered.cost_analysis()
            if isinstance(an, list):
                an = an[0]
            gflop = an.get("flops", 0.0) / 1e9
        except Exception:
            gflop = 0.0
        float(jf(*xs))  # warm/compile
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            float(jf(*xs))
            best = min(best, time.perf_counter() - t0)
        del xs
        rec = {"ms": round(best * 1e3, 2), "gflop": round(gflop, 1),
               "mfu_pct": round(100 * gflop / best / PEAK_GFLOPS, 1)
               if best else 0}
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)

    with open(args.out, "w") as f:
        json.dump({"batch": B, "dtype": "bfloat16", "results": results},
                  f, indent=2)
    print(json.dumps({"wrote": args.out}), flush=True)


if __name__ == "__main__":
    main()
