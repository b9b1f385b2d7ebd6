"""Latent diffusion composition (capability mirror of
reference/stable_diffusion/latent_diffusion.py).

beta = linspace(sqrt(beta_start), sqrt(beta_end), T)^2 (T=1000, :98),
latent scaling 0.18215 (util.py:80-87). The text encoder (HF CLIP
ViT-L/14, clip_embedder.py) is gated on transformers + local weights —
this zero-egress image cannot download them, so conditioning falls back to
a caller-supplied embedding matrix.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class LdmSchedule(NamedTuple):
    beta: jnp.ndarray
    alpha: jnp.ndarray
    alpha_bar: jnp.ndarray


def ldm_schedule(n_steps: int = 1000, linear_start: float = 0.00085,
                 linear_end: float = 0.0120) -> LdmSchedule:
    beta = jnp.linspace(linear_start ** 0.5, linear_end ** 0.5, n_steps,
                        dtype=jnp.float32) ** 2
    alpha = 1.0 - beta
    return LdmSchedule(beta, alpha, jnp.cumprod(alpha))


class CLIPTextEmbedder:
    """HF CLIP ViT-L/14 text encoder (clip_embedder.py:20-50), max_len 77.

    With no ``tokenizer``/``model`` injected, loads pretrained weights by
    name (requires the `transformers` package AND locally cached weights).
    Injection lets tests exercise the tokenize-pad-77 -> (B,77,d) contract
    offline with a tiny random-config FlaxCLIPTextModel."""

    def __init__(self, model_name: str = "openai/clip-vit-large-patch14",
                 max_length: int = 77, tokenizer=None, model=None,
                 local_files_only: bool = False):
        if tokenizer is None or model is None:
            from transformers import CLIPTokenizer, FlaxCLIPTextModel

            # local_files_only=True fails fast from the HF cache instead
            # of hanging on network retries — required on zero-egress
            # hosts (the LdmRunner fallback path depends on a prompt
            # exception here).
            tokenizer = tokenizer or CLIPTokenizer.from_pretrained(
                model_name, local_files_only=local_files_only)
            model = model or FlaxCLIPTextModel.from_pretrained(
                model_name, local_files_only=local_files_only)
        self.tokenizer = tokenizer
        self.model = model
        self.max_length = max_length

    def __call__(self, prompts):
        toks = self.tokenizer(prompts, truncation=True,
                              max_length=self.max_length, padding="max_length",
                              return_tensors="np")
        out = self.model(input_ids=toks["input_ids"],
                         attention_mask=toks["attention_mask"])
        return out.last_hidden_state


class LatentDiffusion:
    """Composes eps-model + autoencoder + text conditioning."""

    latent_scaling_factor: float = 0.18215

    def __init__(self, eps_fn: Callable, encode_fn: Optional[Callable] = None,
                 decode_fn: Optional[Callable] = None, n_steps: int = 1000,
                 linear_start: float = 0.00085, linear_end: float = 0.0120):
        self.eps_fn = eps_fn  # (x, t, cond) -> eps
        self.encode_fn = encode_fn
        self.decode_fn = decode_fn
        self.n_steps = n_steps
        self.sched = ldm_schedule(n_steps, linear_start, linear_end)

    def autoencoder_encode(self, img, key):
        dist = self.encode_fn(img)
        return self.latent_scaling_factor * dist.sample(key)

    def autoencoder_decode(self, z):
        return self.decode_fn(z / self.latent_scaling_factor)

    def __call__(self, x, t, cond):
        return self.eps_fn(x, t, cond)
