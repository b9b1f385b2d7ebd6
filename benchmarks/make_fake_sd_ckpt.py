"""Fabricate a FULL-SIZE SD-v1-layout checkpoint on disk.

No real ``sd-v1-4.ckpt`` can exist in this zero-egress image, but the
loader path it would flow through (torch.load -> compat.sd_convert ->
flax trees -> LdmRunner pipelines) is exercisable with a fabricated
checkpoint of the REAL shapes: the 859M-param SD-v1 U-Net + 83.7M VAE,
saved in the torch ``{"state_dict": {...}}`` layout the reference loads
(reference/stable_diffusion/util.py:28-103).

Shapes come from ``jax.eval_shape`` over this package's own modules (no
arrays materialized during shape discovery), names/transposes from the
converter's recorded rule list — so a key the converter would not read
cannot sneak in, and a key it needs cannot be skipped.

Also fabricates what a REAL checkpoint carries beyond the mapped keys:
``cond_stage_model.*`` CLIP weights (a token subset), ``model_ema.*``,
and scalar schedule buffers — the loader must report them as unused
extras, not fail. ``--drop`` removes N mapped U-Net keys to exercise the
non-strict missing-key path (util.py:97-99 loads with strict=False).

Usage:
    JAX_PLATFORMS=cpu python benchmarks/make_fake_sd_ckpt.py \
        --out /tmp/fake-sd-v1.ckpt [--dtype float32] [--drop 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from diffusionmodel_tpu.compat.sd_convert import (  # noqa: E402
    convert_sd_autoencoder,
    convert_sd_unet,
    fabricate_sd_state_dict,
)
from diffusionmodel_tpu.models.latent_diffusion import (  # noqa: E402
    Autoencoder,
    UNetModel,
)
from diffusionmodel_tpu.models.latent_diffusion.runner import ARCHS  # noqa: E402


def shape_trees(arch: str = "sd"):
    """(unet_shapes, vae_shapes) as ShapeDtypeStruct trees — no arrays."""
    a = dict(ARCHS[arch])
    ae_channels = a.pop("ae_channels")
    ae_mults = a.pop("ae_mults")
    d_cond = a["d_cond"]
    unet = UNetModel(**a)
    ae = Autoencoder(channels=ae_channels, ch_mults=ae_mults,
                     z_channels=4, emb_channels=4)
    uv = jax.eval_shape(unet.init, jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
                        jnp.zeros((1, 77, d_cond)))
    av = jax.eval_shape(ae.init, jax.random.PRNGKey(1),
                        jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(2))
    return uv["params"], av["params"], a, ae_mults


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fake-sd-v1.ckpt")
    ap.add_argument("--arch", default="sd", choices=list(ARCHS))
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float16"])
    ap.add_argument("--drop", type=int, default=0,
                    help="drop N mapped U-Net keys (non-strict load test)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import torch

    t0 = time.time()
    u_shapes, a_shapes, unet_kw, ae_mults = shape_trees(args.arch)
    u_rules = convert_sd_unet(
        {}, _record=True,
        channel_multipliers=unet_kw["channel_multipliers"],
        attention_levels=unet_kw["attention_levels"],
        n_res_blocks=unet_kw.get("n_res_blocks", 2))
    a_rules = convert_sd_autoencoder(
        {}, ch_mults=ae_mults,
        n_resnet=unet_kw.get("n_res_blocks", 2), _record=True)

    dtype = np.dtype(args.dtype)
    rng = np.random.default_rng(args.seed)
    sd = fabricate_sd_state_dict(u_shapes, u_rules,
                                 "model.diffusion_model.",
                                 dtype=dtype, rng=rng)
    n_unet = sum(v.size for v in sd.values())
    sd.update(fabricate_sd_state_dict(a_shapes, a_rules,
                                      "first_stage_model.",
                                      dtype=dtype, rng=rng))
    n_total = sum(v.size for v in sd.values())

    dropped = []
    if args.drop:
        # drop from the tail (deep U-Net blocks) — deterministic choice
        for k in sorted(k for k in sd
                        if k.startswith("model.diffusion_model."))[-args.drop:]:
            del sd[k]
            dropped.append(k)

    # what a real sd-v1-4.ckpt carries that the mapping never reads:
    # CLIP text-encoder weights (token subset — the real one is 123M),
    # EMA shadow scalars, schedule buffers. Must surface as `extra`.
    sd["cond_stage_model.transformer.text_model.embeddings."
       "token_embedding.weight"] = (
        rng.standard_normal((49408, 16)).astype(dtype) * 0.02)
    sd["model_ema.decay"] = np.asarray(0.9999, dtype)
    sd["model_ema.num_updates"] = np.asarray(990000, np.int64)
    sd["betas"] = np.linspace(0.00085, 0.012, 1000).astype(dtype)
    sd["alphas_cumprod"] = np.cumprod(1.0 - sd["betas"]).astype(dtype)

    state = {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim
             else torch.tensor(v) for k, v in sd.items()}
    torch.save({"state_dict": state,
                "global_step": 470000},  # layout of the real ckpt
               args.out)
    size_gb = os.path.getsize(args.out) / 1e9
    print(f"wrote {args.out}: {n_total / 1e6:.1f}M params "
          f"(unet {n_unet / 1e6:.1f}M, vae {(n_total - n_unet) / 1e6:.1f}M), "
          f"{len(sd)} keys, {size_gb:.2f} GB {args.dtype}, "
          f"{len(dropped)} dropped, {time.time() - t0:.1f}s")
    for k in dropped:
        print(f"  dropped: {k}")


if __name__ == "__main__":
    main()
