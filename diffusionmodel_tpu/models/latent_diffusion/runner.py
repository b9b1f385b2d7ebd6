"""User-facing LDM runner: builds the full stable-diffusion stack and
exposes txt2img / img2img / inpaint as jit-compiled array pipelines —
the front door the reference ships as standalone scripts
(reference/stable_diffusion/scripts/text_to_image.py:104-158,
image_to_image.py:95-149, in_paint.py:100-166) wired to this package's
``pipelines`` classes and ``util`` image I/O, reachable from the CLI
(``--mode txt2img ...``).

Design constraints honored:

- **params are jit ARGUMENTS**, never closures (the remote-compile
  tunnel rejects oversized constant-embedding payloads) — the pipeline
  classes close over an eps_fn, so traced params are injected through a
  call-time cell that is only read during tracing;
- one compiled program per (mode, shape) — DDIM-50 at 512px runs ~1.3 s
  on a v5e chip (benchmarks/bench_ldm.py), far under the ~4-min program
  cap, so pipelines jit whole;
- conditioning: the HF CLIP text encoder when transformers + local
  weights exist (reference clip_embedder.py:20-50); otherwise a
  DOCUMENTED deterministic fallback — a prompt-hashed Gaussian embedding
  of the same [B, 77, d_cond] shape, so the full pipeline runs
  end-to-end in zero-egress environments (images are prompt-consistent
  but not semantically conditioned without CLIP weights);
- weights: a real SD-v1 checkpoint through ``compat.sd_convert`` when
  provided, else deterministic random init (documented: this image has
  no SD weights — util.py:28-103 is the reference loader).
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.models.latent_diffusion.autoencoder import Autoencoder
from diffusionmodel_tpu.models.latent_diffusion.latent_diffusion import (
    LatentDiffusion,
)
from diffusionmodel_tpu.models.latent_diffusion.pipelines import (
    Img2Img,
    InPaint,
    Txt2Img,
)
from diffusionmodel_tpu.models.latent_diffusion.unet import UNetModel
from diffusionmodel_tpu.utils.transfer import fetch_tree

# (channels, channel_multipliers, attention_levels, n_heads, d_cond,
#  ae_channels, ae_mults) — "sd" is the SD-v1 architecture
# (reference/stable_diffusion/util.py:38-103); "tiny" is a CPU-testable
# miniature with the same topology.
ARCHS = {
    "sd": dict(channels=320, channel_multipliers=(1, 2, 4, 4),
               attention_levels=(0, 1, 2), n_heads=8, d_cond=768,
               ae_channels=128, ae_mults=(1, 2, 4, 4)),
    # ae_mults must span 4 levels: the pipelines sample latents at
    # (h/8, w/8) — the SD f=8 VAE contract (3 downsamples).
    "tiny": dict(channels=32, channel_multipliers=(1, 2), n_res_blocks=1,
                 attention_levels=(0,), n_heads=2, d_cond=64,
                 ae_channels=32, ae_mults=(1, 1, 2, 2)),
    # "mid": the on-chip trainable point (round 5) — same topology as
    # "sd" at ~1/10 the parameters, sized so a full native first-stage +
    # latent-UNet training run on the 1393-crop set fits a benchmark
    # session (benchmarks/bench_ldm_train.py).
    "mid": dict(channels=128, channel_multipliers=(1, 2, 4),
                n_res_blocks=2, attention_levels=(0, 1), n_heads=4,
                d_cond=256, ae_channels=64, ae_mults=(1, 2, 4, 4)),
}


def _hash_embedding(prompts, d_cond: int, max_length: int = 77) -> np.ndarray:
    """Deterministic prompt -> [B, 77, d_cond] Gaussian embedding (the
    documented no-CLIP-weights fallback; same prompt => same cond)."""
    out = []
    for p in prompts:
        seed = int.from_bytes(
            hashlib.sha256(p.encode("utf-8")).digest()[:4], "little")
        out.append(np.random.RandomState(seed)
                   .randn(max_length, d_cond).astype(np.float32))
    return np.stack(out)


class LdmRunner:
    """Builds the LDM stack once; each public method compiles (first call)
    and reuses one program per shape."""

    def __init__(self, sd_ckpt: Optional[str] = None, arch: str = "sd",
                 use_flash: bool = True, sampler: str = "ddim",
                 steps: int = 50, ddim_eta: float = 0.0, seed: int = 42,
                 use_clip: bool = True, verbose: bool = True,
                 native_ckpt: Optional[str] = None):
        a = dict(ARCHS[arch])
        ae_channels = a.pop("ae_channels")
        ae_mults = a.pop("ae_mults")
        self.d_cond = a["d_cond"]
        self.arch = arch
        self.sampler_name = sampler
        self.steps = steps
        self.ddim_eta = ddim_eta
        self.verbose = verbose
        self.unet = UNetModel(use_flash=use_flash, **a)
        self.ae = Autoencoder(channels=ae_channels, ch_mults=ae_mults,
                              z_channels=4, emb_channels=4)

        key = jax.random.PRNGKey(seed)
        z0 = jnp.zeros((1, 8, 8, 4))
        img0 = jnp.zeros((1, 64, 64, 3))
        if sd_ckpt:
            from diffusionmodel_tpu.compat.sd_convert import (
                load_sd_checkpoint,
                merge_params,
            )

            self.params, self.ae_params, missing, extra = load_sd_checkpoint(
                sd_ckpt,
                ae_mults=ae_mults,
                channel_multipliers=a["channel_multipliers"],
                attention_levels=a["attention_levels"],
                n_res_blocks=a.get("n_res_blocks", 2))
            # non-strict load (reference util.py:97-99): keys absent from
            # the checkpoint keep their initialized values. Init is paid
            # only for the halves that actually have gaps.
            uk, ak = jax.random.split(key)
            if any(k.startswith("model.diffusion_model.") for k in missing):
                init_u = jax.jit(self.unet.init)(
                    uk, z0, jnp.zeros((1,)),
                    jnp.zeros((1, 77, self.d_cond)))["params"]
                self.params = merge_params(init_u, self.params)
            if any(k.startswith("first_stage_model.") for k in missing):
                init_a = jax.jit(self.ae.init)(
                    ak, img0, jax.random.PRNGKey(0))["params"]
                self.ae_params = merge_params(init_a, self.ae_params)
            if verbose:
                msg = f"Loaded SD checkpoint: {sd_ckpt}"
                if missing:
                    msg += (f" ({len(missing)} keys missing, kept at init; "
                            "non-strict like the reference loader)")
                if extra:
                    msg += (f" ({len(extra)} checkpoint keys unused — "
                            "cond_stage/EMA/buffers load elsewhere or not "
                            "at all)")
                print(msg)
        else:
            # deterministic random init — documented fallback for
            # zero-egress hosts with no sd-v1-4.ckpt (util.py:28-103).
            uk, ak = jax.random.split(key)
            self.params = jax.jit(self.unet.init)(
                uk, z0, jnp.zeros((1,)), jnp.zeros((1, 77, self.d_cond))
            )["params"]
            # init via __call__ (encode + decode) so BOTH halves of the
            # autoencoder get parameters.
            self.ae_params = jax.jit(self.ae.init)(
                ak, img0, jax.random.PRNGKey(0))["params"]
            if verbose:
                print("No SD checkpoint given: using deterministic random "
                      "weights (no pretrained weights in this environment)")

        if native_ckpt:
            # params trained by training.fit_ldm (--mode train_ldm):
            # {"arch", "unet", "ae"} pickle — the frozen VAE rides along
            # because the UNet was trained in exactly that VAE's latent
            # space.
            import pickle

            with open(native_ckpt, "rb") as f:
                payload = pickle.load(f)
            if payload.get("arch") not in (None, arch):
                raise ValueError(
                    f"native checkpoint was trained with arch="
                    f"{payload['arch']!r}; runner built with {arch!r}")
            self.params = jax.tree.map(jnp.asarray, payload["unet"])
            if "ae" in payload:
                self.ae_params = jax.tree.map(jnp.asarray, payload["ae"])
            if verbose:
                print(f"Loaded native LDM checkpoint: {native_ckpt}")

        # call-time cells: pipelines close over eps/encode/decode fns; the
        # cells hold the TRACED params during jit tracing only.
        self._P = [None]
        self._A = [None]

        def eps_fn(x, t, c):
            return self.unet.apply({"params": self._P[0]}, x, t, c)

        def encode_fn(img):
            return self.ae.apply({"params": self._A[0]}, img,
                                 method="encode")

        def decode_fn(z):
            return self.ae.apply({"params": self._A[0]}, z, method="decode")

        self.model = LatentDiffusion(eps_fn, encode_fn, decode_fn)
        self.embedder = None
        # CLIP-large emits 768-d embeddings — only the SD-sized d_cond can
        # consume them; smaller archs always use the hash fallback.
        if use_clip and self.d_cond == 768:
            try:
                from diffusionmodel_tpu.models.latent_diffusion.latent_diffusion import (  # noqa: E501
                    CLIPTextEmbedder,
                )

                # local-only: fail fast from the HF cache rather than hang
                # on network retries (zero-egress). Users with live
                # network can pre-download or inject their own embedder.
                self.embedder = CLIPTextEmbedder(local_files_only=True)
            except Exception as e:
                if verbose:
                    print(f"CLIP unavailable ({type(e).__name__}); falling "
                          "back to deterministic prompt-hash conditioning")
        self._compiled = {}

    # ------------------------------------------------------------ helpers
    def cond(self, prompts) -> jnp.ndarray:
        if self.embedder is not None:
            return jnp.asarray(self.embedder(list(prompts)))
        return jnp.asarray(_hash_embedding(prompts, self.d_cond))

    def _jit(self, cache_key, build):
        if cache_key not in self._compiled:
            self._compiled[cache_key] = jax.jit(build())
        return self._compiled[cache_key]

    # ------------------------------------------------------------- modes
    def txt2img(self, prompt: str, batch_size: int = 1, h: int = 512,
                w: int = 512, uncond_scale: float = 7.5,
                key: Optional[jax.Array] = None) -> np.ndarray:
        """prompt -> [B, h, w, 3] images in [-1, 1]
        (scripts/text_to_image.py:57-101)."""
        key = key if key is not None else jax.random.PRNGKey(0)

        def build():
            # pipeline objects (and their sampler schedule arrays) are only
            # needed at trace time — construct inside build() so cache
            # hits skip them entirely.
            pipe = Txt2Img(self.model, sampler=self.sampler_name,
                           n_steps=self.steps, ddim_eta=self.ddim_eta)

            def run(params, aparams, key, cond, uncond):
                self._P[0], self._A[0] = params, aparams
                return pipe(key, cond=cond, batch_size=batch_size, h=h,
                            w=w, uncond_scale=uncond_scale, uncond=uncond)

            return run

        jrun = self._jit(("txt2img", batch_size, h, w, uncond_scale,
                          self.sampler_name, self.steps), build)
        cond = self.cond([prompt] * batch_size)
        uncond = self.cond([""] * batch_size)
        # chunked fetch: decoded image batches are tens of MB
        # (utils/transfer.py module doc)
        return fetch_tree(jrun(self.params, self.ae_params, key, cond,
                               uncond))

    def img2img(self, orig_img: np.ndarray, prompt: str,
                strength: float = 0.75, uncond_scale: float = 5.0,
                key: Optional[jax.Array] = None) -> np.ndarray:
        """[B,H,W,3] image + prompt -> repainted images
        (scripts/image_to_image.py:55-92)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        batch = int(orig_img.shape[0])

        def build():
            pipe = Img2Img(self.model, n_steps=self.steps,
                           ddim_eta=self.ddim_eta)

            def run(params, aparams, key, img, cond, uncond):
                self._P[0], self._A[0] = params, aparams
                return pipe(key, img, cond=cond, strength=strength,
                            uncond_scale=uncond_scale, uncond=uncond)

            return run

        jrun = self._jit(("img2img", batch, orig_img.shape[1],
                          orig_img.shape[2], strength, uncond_scale,
                          self.steps), build)
        cond = self.cond([prompt] * batch)
        uncond = self.cond([""] * batch)
        return fetch_tree(jrun(self.params, self.ae_params, key,
                               jnp.asarray(orig_img), cond, uncond))

    def inpaint(self, orig_img: np.ndarray, prompt: str,
                mask: Optional[np.ndarray] = None, strength: float = 0.75,
                uncond_scale: float = 5.0,
                key: Optional[jax.Array] = None) -> np.ndarray:
        """Masked repaint; default mask preserves the bottom half
        (scripts/in_paint.py:75-97). ``mask`` is [B,h/8,w/8,4] latent-space
        keep-mask (1 = keep original)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        batch = int(orig_img.shape[0])
        has_mask = mask is not None

        def build():
            pipe = InPaint(self.model, n_steps=self.steps,
                           ddim_eta=self.ddim_eta)

            if has_mask:
                # mask rides as a TRACED argument — baking it as a closure
                # constant would make a second call with a different mask
                # silently cache-hit the first one's program.
                def run(params, aparams, key, img, cond, uncond, m):
                    self._P[0], self._A[0] = params, aparams
                    return pipe(key, img, cond=cond, mask=m,
                                strength=strength,
                                uncond_scale=uncond_scale, uncond=uncond)
            else:
                def run(params, aparams, key, img, cond, uncond):
                    self._P[0], self._A[0] = params, aparams
                    return pipe(key, img, cond=cond, mask=None,
                                strength=strength,
                                uncond_scale=uncond_scale, uncond=uncond)

            return run

        jrun = self._jit(("inpaint", batch, orig_img.shape[1],
                          orig_img.shape[2], strength, uncond_scale,
                          self.steps, has_mask), build)
        cond = self.cond([prompt] * batch)
        uncond = self.cond([""] * batch)
        args = (self.params, self.ae_params, key, jnp.asarray(orig_img),
                cond, uncond)
        if has_mask:
            args += (jnp.asarray(mask),)
        return fetch_tree(jrun(*args))
