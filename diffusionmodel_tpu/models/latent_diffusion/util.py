"""Image/file I/O + seeding for the LDM pipelines.

Capability mirror of ``reference/stable_diffusion/util.py:106-151``
(``load_img`` / ``save_images`` / ``set_seed``), in this package's
TPU-native NHWC layout (the reference returns NCHW torch tensors).
"""

from __future__ import annotations

import os
import random
from typing import Optional, Tuple

import numpy as np


def load_img(path: str, size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Load an image file -> float32 [1, H, W, 3] in [-1, 1].

    Mirrors util.py:106-127: RGB convert, resize so both sides are
    multiples of 32 (the VAE downsamples 8x and the U-Net a further 4x),
    LANCZOS resample, map [0,255] -> [-1,1]. ``size=(h, w)`` additionally
    forces a target size (clamped down to x32 multiples) — the upgrade
    hook the CLI uses to bound HBM at 256/512px.
    """
    from PIL import Image

    image = Image.open(path).convert("RGB")
    w, h = image.size
    if size is not None:
        h, w = size
    w -= w % 32
    h -= h % 32
    if (w, h) != image.size:
        image = image.resize((w, h), resample=Image.LANCZOS)
    arr = np.asarray(image).astype(np.float32) * (2.0 / 255.0) - 1.0
    return arr[None]


def save_images(images, dest_path: str, prefix: str = "",
                img_format: str = "jpeg") -> list:
    """Save [B, H, W, C] images in [-1, 1] as ``{prefix}{i:05}.{format}``
    files under ``dest_path`` (util.py:130-151). Returns the paths."""
    from PIL import Image

    os.makedirs(dest_path, exist_ok=True)
    images = np.clip((np.asarray(images, np.float32) + 1.0) / 2.0, 0.0, 1.0)
    paths = []
    for i, img in enumerate(images):
        out = os.path.join(dest_path, f"{prefix}{i:05}.{img_format}")
        Image.fromarray((255.0 * img).astype(np.uint8)).save(
            out, format=img_format)
        paths.append(out)
    return paths


def set_seed(seed: int):
    """Seed host RNGs and return the ``jax.random.PRNGKey`` that plays the
    role of the reference's global torch/cuda seeds (util.py:140-151) —
    JAX has no global PRNG, so the key IS the seed state and must be
    threaded through the pipelines."""
    import jax

    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
