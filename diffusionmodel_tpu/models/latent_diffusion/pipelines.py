"""txt2img / img2img / inpaint pipelines (capability mirror of
reference/stable_diffusion/scripts/*).

Each pipeline takes a ``LatentDiffusion`` whose eps_fn/encode_fn/decode_fn
close over loaded params. Conditioning comes from a CLIP embedder when
available (transformers + local weights) or a caller-supplied embedding.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.models.latent_diffusion.samplers import (
    DDIMSampler,
    DDPMSampler,
    DPMPPSampler,
)


def _make_sampler(model, sampler_name: str, n_steps: int, ddim_eta: float):
    if sampler_name == "ddim":
        return DDIMSampler(model, n_steps=n_steps, ddim_eta=ddim_eta)
    if sampler_name == "ddpm":
        return DDPMSampler(model)
    if sampler_name == "dpmpp":
        return DPMPPSampler(model, n_steps=n_steps)
    raise ValueError(sampler_name)


class Txt2Img:
    """prompt -> cond/uncond -> sampler -> VAE decode
    (scripts/text_to_image.py:24-158)."""

    def __init__(self, model, embedder=None, sampler: str = "ddim",
                 n_steps: int = 50, ddim_eta: float = 0.0):
        self.model = model
        self.embedder = embedder
        self.sampler = _make_sampler(model, sampler, n_steps, ddim_eta)

    def __call__(self, key, prompt=None, cond=None, batch_size: int = 1,
                 h: int = 512, w: int = 512, uncond_scale: float = 7.5,
                 uncond=None):
        assert h % 32 == 0 and w % 32 == 0
        if cond is None:
            cond = jnp.asarray(self.embedder([prompt] * batch_size))
        if uncond is None:
            uncond = (jnp.asarray(self.embedder([""] * batch_size))
                      if self.embedder is not None and uncond_scale != 1.0
                      else jnp.zeros_like(cond))
        key, skey = jax.random.split(key)
        x = self.sampler.sample(skey, (batch_size, h // 8, w // 8, 4), cond,
                                uncond_scale=uncond_scale, uncond_cond=uncond)
        return self.model.autoencoder_decode(x)


class Img2Img:
    """encode orig -> q_sample at strength*steps -> paint -> decode
    (scripts/image_to_image.py:21-149)."""

    def __init__(self, model, embedder=None, n_steps: int = 50,
                 ddim_eta: float = 0.0):
        self.model = model
        self.embedder = embedder
        self.sampler = DDIMSampler(model, n_steps=n_steps, ddim_eta=ddim_eta)

    def __call__(self, key, orig_img, prompt=None, cond=None,
                 strength: float = 0.75, uncond_scale: float = 5.0,
                 uncond=None):
        batch = orig_img.shape[0]
        if cond is None:
            cond = jnp.asarray(self.embedder([prompt] * batch))
        if uncond is None:
            uncond = (jnp.asarray(self.embedder([""] * batch))
                      if self.embedder is not None and uncond_scale != 1.0
                      else jnp.zeros_like(cond))
        key, ekey, qkey, pkey = jax.random.split(key, 4)
        z = self.model.autoencoder_encode(orig_img, ekey)
        t_index = int(strength * self.sampler.n_steps)
        xt = self.sampler.q_sample(z, t_index - 1, qkey)
        x = self.sampler.paint(pkey, xt, cond, t_index,
                               uncond_scale=uncond_scale, uncond_cond=uncond)
        return self.model.autoencoder_decode(x)


class InPaint:
    """img2img with a keep-mask + orig-noise blend
    (scripts/in_paint.py:24-166; default mask preserves the bottom half)."""

    def __init__(self, model, embedder=None, n_steps: int = 50,
                 ddim_eta: float = 0.0):
        self.model = model
        self.embedder = embedder
        self.sampler = DDIMSampler(model, n_steps=n_steps, ddim_eta=ddim_eta)

    def __call__(self, key, orig_img, prompt=None, cond=None,
                 mask: Optional[jnp.ndarray] = None, strength: float = 0.75,
                 uncond_scale: float = 5.0, uncond=None):
        batch = orig_img.shape[0]
        if cond is None:
            cond = jnp.asarray(self.embedder([prompt] * batch))
        if uncond is None:
            uncond = (jnp.asarray(self.embedder([""] * batch))
                      if self.embedder is not None and uncond_scale != 1.0
                      else jnp.zeros_like(cond))
        key, ekey, nkey, qkey, pkey = jax.random.split(key, 5)
        z = self.model.autoencoder_encode(orig_img, ekey)
        if mask is None:
            mask = np.zeros(z.shape, np.float32)
            mask[:, z.shape[1] // 2:, :, :] = 1.0  # preserve bottom half
            mask = jnp.asarray(mask)
        orig_noise = jax.random.normal(nkey, z.shape, z.dtype)
        t_index = int(strength * self.sampler.n_steps)
        xt = self.sampler.q_sample(z, t_index - 1, qkey)
        x = self.sampler.paint(pkey, xt, cond, t_index, orig=z, mask=mask,
                               orig_noise=orig_noise,
                               uncond_scale=uncond_scale, uncond_cond=uncond)
        return self.model.autoencoder_decode(x)
