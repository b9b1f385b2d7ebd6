"""Latent-diffusion stretch workload at full SD-v1 scale on real TPU.

BASELINE.md config 5: "reference/stable_diffusion latent-diffusion
pipeline at 256px (inference)". Builds the SD-v1-sized UNetModel (860M:
320ch, mults [1,2,4,4], attn levels [0,1,2], 8 heads, d_cond 768) and the
SD VAE decoder with random weights (no SD checkpoint exists in this
zero-egress image), random CLIP-shaped cond [B,77,768], then times the
txt2img hot path — DDIM-50 with CFG scale 7.5 (one lax.scan program) +
VAE decode — at 256px (latent 32x32, N=1024 self-attn tokens) and 512px
(latent 64x64, N=4096), with the XLA einsum attention vs the Pallas
flash-attention kernel (use_flash).

Prints one JSON object per line. Sync = data fetch (tunneled platform).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.models.latent_diffusion import (
        Autoencoder,
        LatentDiffusion,
        UNetModel,
    )
    from diffusionmodel_tpu.models.latent_diffusion.samplers import (
        DDIMSampler,
        DPMPPSampler,
    )
    from diffusionmodel_tpu.utils import enable_compilation_cache
    from diffusionmodel_tpu.utils.transfer import fetch_tree

    enable_compilation_cache()
    key = jax.random.PRNGKey(0)
    B = 1  # per-prompt batch; CFG doubles it inside the sampler

    # ---- SD-v1-size modules, random weights --------------------------------
    unet = {False: UNetModel(use_flash=False), True: UNetModel(use_flash=True)}
    z0 = jnp.zeros((B, 32, 32, 4))
    cond0 = jnp.zeros((B, 77, 768))
    t0c = jnp.zeros((B,))
    uvars = jax.jit(unet[False].init)(key, z0, t0c, cond0)
    n_params = sum(x.size for x in jax.tree.leaves(uvars))
    print(json.dumps({"stage": "init", "unet_params_M":
                      round(n_params / 1e6, 1)}), flush=True)

    ae = Autoencoder(channels=128, ch_mults=(1, 2, 4, 4), z_channels=4,
                     emb_channels=4)
    avars = jax.jit(ae.init, static_argnames=("method",))(
        key, z0, method="decode")

    # params must be jit ARGUMENTS (tunnel payload limit); the samplers
    # take an eps_fn, so inject the traced params through a call-time cell.
    _P = [None]

    def make_run(use_flash: bool, hw: int, steps: int = 50,
                 sampler_name: str = "ddim"):
        net = unet[use_flash]

        def eps_fn(x, t, c):
            return net.apply({"params": _P[0]}, x, t, c)

        ld = LatentDiffusion(eps_fn)
        sampler = (DPMPPSampler(ld, n_steps=steps)
                   if sampler_name == "dpmpp"
                   else DDIMSampler(ld, n_steps=steps))
        shape = (B, hw // 8, hw // 8, 4)

        def run(params, aparams, key, cond, uncond):
            _P[0] = params
            z = sampler.sample(key, shape, cond, uncond_scale=7.5,
                               uncond_cond=uncond)
            img = ae.apply({"params": aparams},
                           z / LatentDiffusion.latent_scaling_factor,
                           method="decode")
            return img

        return jax.jit(run)

    cond = jax.random.normal(key, (B, 77, 768))
    uncond = jnp.zeros((B, 77, 768))

    # (hw, use_flash, sampler, steps): DDIM-50 XLA-vs-flash at both sizes
    # (the round-2 grid) + DPM-Solver++(2M)-25 on the flash path (the
    # round-3 throughput sampler: DDIM-50-class quality at half the UNet
    # evaluations).
    grid = [(256, False, "ddim", 50), (256, True, "ddim", 50),
            (512, False, "ddim", 50), (512, True, "ddim", 50),
            (256, True, "dpmpp", 25), (512, True, "dpmpp", 25)]
    for hw, use_flash, sampler_name, steps in grid:
            label = (f"txt2img_{hw}px_" + ("flash" if use_flash else "xla")
                     + ("" if sampler_name == "ddim" else f"_{sampler_name}"))
            try:
                jrun = make_run(use_flash, hw, steps=steps,
                                sampler_name=sampler_name)
                t0 = time.time()
                img = fetch_tree(jrun(uvars["params"], avars["params"],
                                      jax.random.PRNGKey(1), cond, uncond))
                compile_s = time.time() - t0
                assert np.isfinite(img).all() and img.shape[1] == hw
                best = float("inf")
                for i in range(3):
                    t0 = time.time()
                    img = fetch_tree(jrun(uvars["params"], avars["params"],
                                          jax.random.PRNGKey(2 + i), cond,
                                          uncond))
                    best = min(best, time.time() - t0)
                print(json.dumps({
                    "bench": label, "seconds": round(best, 2),
                    "images_per_min": round(B * 60.0 / best, 2),
                    "sampler": sampler_name, "steps": steps,
                    "uncond_scale": 7.5,
                    "compile_plus_first_s": round(compile_s, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"bench": label,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
