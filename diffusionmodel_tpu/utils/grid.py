"""Image grid/save utilities (torchvision make_grid/save_image equivalents,
used at new_scripy.py:554-561, 875-877)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_grid(images: np.ndarray, nrow: Optional[int] = None, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """Tile [N,H,W,C] float images into one [GH,GW,C] grid (row-major,
    ``nrow`` images per row — torchvision semantics)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    nrow = nrow or int(np.ceil(np.sqrt(n)))
    ncol = nrow  # torchvision's nrow = images per row
    nrows = int(np.ceil(n / ncol))
    grid = np.full(
        (padding + nrows * (h + padding), padding + ncol * (w + padding), c),
        pad_value, dtype=images.dtype,
    )
    for i in range(n):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image(img: np.ndarray, path: str, denorm: bool = False) -> str:
    """Save [H,W,C] float image (optionally mapping [-1,1] -> [0,1])."""
    from PIL import Image

    img = np.asarray(img, dtype=np.float32)
    if denorm:
        img = img * 0.5 + 0.5
    img = np.clip(img, 0.0, 1.0)
    arr = (img * 255.0 + 0.5).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def save_samples(images: np.ndarray, path: str, nrow: Optional[int] = None,
                 denorm: bool = True) -> str:
    """Denormalize + grid + save (new_scripy.py:554-561)."""
    images = np.asarray(images, dtype=np.float32)
    if denorm:
        images = images * 0.5 + 0.5
    return save_image(make_grid(images, nrow=nrow), path, denorm=False)


def mnist_eval_grid(gen: np.ndarray, real: np.ndarray, real_labels,
                    n_classes: int, path: str, invert: bool = True) -> str:
    """The MNIST eval artifact (MNIST_script.py:359-371): generated samples
    on top, one class-ordered row-set of real images below, saved with the
    reference's value inversion (grid = x*-1 + 1)."""
    gen = np.asarray(gen, np.float32)
    real = np.asarray(real, np.float32)
    real_labels = np.asarray(real_labels)
    n_sample = len(gen)
    per_class = max(1, n_sample // n_classes)
    picked = np.zeros_like(gen[: per_class * n_classes])
    for k in range(n_classes):
        idxs = np.where(real_labels == k)[0]
        for j in range(per_class):
            src = real[idxs[j]] if j < len(idxs) else real[0]
            picked[k + j * n_classes] = src
    x_all = np.concatenate([gen, picked], axis=0)
    if invert:
        x_all = x_all * -1 + 1
    return save_image(make_grid(x_all, nrow=n_classes), path, denorm=False)
