"""Crack image dataset: directory-per-class images + Pascal-VOC XML bboxes
-> (image, label, attention-mask) triples (new_scripy.py:479-551).

Layout (produced by the crop tool / expected by the reference):

    root/images/<class_name>/*.{png,jpg,jpeg}
    root/annotations/<image_stem>.xml

The attention mask (new_scripy.py:535-546): base 0.5 everywhere, 1.0 on the
lower half, 3.0 inside the bbox rescaled from original image coords to
img_size with round + clamp to [0, img_size-1].

Parity notes:
- classes are the sorted directory names (new_scripy.py:496-498);
- an image without a matching XML is skipped (new_scripy.py:505-511);
- transforms: PIL bilinear resize to (S, S), optional horizontal flip with
  p=0.5 applied to the image ONLY (Q5 — the reference does not co-flip the
  mask; ``co_flip_mask=True`` opts into the fix), scale to [0,1], normalize
  (x-0.5)/0.5 (new_scripy.py:683-688);
- stratified 90/10 split via sklearn StratifiedShuffleSplit(random_state=42)
  (new_scripy.py:622-657) for split-identical val curves.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


IMG_EXTS = (".png", ".jpg", ".jpeg")


def build_attn_mask(img_size: int, bbox: Tuple[int, int, int, int],
                    orig_wh: Tuple[int, int], low: float = 0.5,
                    mid: float = 1.0, high: float = 3.0) -> np.ndarray:
    """The spatial loss/attention mask (new_scripy.py:535-546)."""
    xmin, ymin, xmax, ymax = bbox
    ow, oh = orig_wh
    mask = np.full((img_size, img_size), low, dtype=np.float32)
    mask[img_size // 2:, :] = mid

    def sx(v):
        return max(0, min(img_size - 1, round(v * img_size / ow)))

    def sy(v):
        return max(0, min(img_size - 1, round(v * img_size / oh)))

    mask[sy(ymin):sy(ymax), sx(xmin):sx(xmax)] = high
    return mask


def parse_voc_bbox(xml_path: str) -> Tuple[Tuple[int, int, int, int],
                                           Tuple[int, int]]:
    """First bndbox + (width, height) from a Pascal-VOC XML."""
    root = ET.parse(xml_path).getroot()
    bb = root.find(".//bndbox")
    bbox = tuple(int(float(bb.find(k).text))
                 for k in ("xmin", "ymin", "xmax", "ymax"))
    ow = int(float(root.find(".//width").text))
    oh = int(float(root.find(".//height").text))
    return bbox, (ow, oh)


class CrackDataset:
    def __init__(self, root_dir: str, img_size: int = 256,
                 mask_values: Tuple[float, float, float] = (0.5, 1.0, 3.0),
                 hflip_prob: float = 0.0, co_flip_mask: bool = False,
                 normalize: bool = True, seed: int = 0,
                 cache_images: bool = True):
        self.root_dir = root_dir
        self.img_size = img_size
        self.mask_values = mask_values
        self.hflip_prob = hflip_prob
        self.co_flip_mask = co_flip_mask
        self.normalize = normalize
        self._rng = np.random.RandomState(seed)
        # Decode+resize once, keep uint8 [S,S,3] + parsed bbox (the TPU
        # host here has 1 CPU core — per-epoch JPEG re-decode measured 12x
        # slower than the train step itself; the reference leans on
        # DataLoader(num_workers=5) instead, new_scripy.py:641-655).
        # ~0.2 MB/image at 256px; disable for huge datasets.
        self.cache_images = cache_images
        self._cache: dict = {}

        img_root = os.path.join(root_dir, "images")
        self.classes = sorted(
            d for d in os.listdir(img_root)
            if os.path.isdir(os.path.join(img_root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}

        self.samples: List[Tuple[str, str, int]] = []
        for cls in self.classes:
            cdir = os.path.join(img_root, cls)
            for name in sorted(os.listdir(cdir)):
                if not name.lower().endswith(IMG_EXTS):
                    continue
                stem = name.rsplit(".", 1)[0]
                xml_path = os.path.join(root_dir, "annotations", stem + ".xml")
                if os.path.exists(xml_path):
                    self.samples.append(
                        (os.path.join(cdir, name), xml_path, self.class_to_idx[cls])
                    )

    def __len__(self) -> int:
        return len(self.samples)

    @property
    def labels(self) -> np.ndarray:
        return np.asarray([s[2] for s in self.samples], dtype=np.int64)

    def load(self, idx: int, augment: bool = False
             ) -> Tuple[np.ndarray, int, np.ndarray]:
        """Returns (image [S,S,3] float32 in [-1,1], label, mask [S,S])."""
        img_path, xml_path, label = self.samples[idx]
        hit = self._cache.get(idx) if self.cache_images else None
        if hit is not None:
            u8, bbox, orig_wh = hit
        else:
            img = Image.open(img_path).convert("RGB")
            img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
            u8 = np.asarray(img, dtype=np.uint8)
            bbox, orig_wh = parse_voc_bbox(xml_path)
            if self.cache_images:
                self._cache[idx] = (u8, bbox, orig_wh)
        low, mid, high = self.mask_values
        mask = build_attn_mask(self.img_size, bbox, orig_wh, low, mid, high)

        arr = u8.astype(np.float32) / 255.0
        if augment and self.hflip_prob > 0 and self._rng.rand() < self.hflip_prob:
            arr = arr[:, ::-1, :].copy()
            if self.co_flip_mask:
                mask = mask[:, ::-1].copy()
        if self.normalize:
            arr = (arr - 0.5) / 0.5
        return arr, label, mask

    def load_wire(self, idx: int, augment: bool = False
                  ) -> Tuple[np.ndarray, int, np.ndarray]:
        """Compact wire-format sample for tunneled/remote devices:
        (uint8 image [S,S,3], label, uint8 mask CLASS INDEX [S,S] with
        0=low/1=mid/2=high). Float expansion happens on-device
        (train.decode_wire) — bit-identical to :meth:`load`."""
        img_path, xml_path, label = self.samples[idx]
        hit = self._cache.get(idx) if self.cache_images else None
        if hit is not None:
            u8, bbox, orig_wh = hit
        else:
            img = Image.open(img_path).convert("RGB")
            img = img.resize((self.img_size, self.img_size), Image.BILINEAR)
            u8 = np.asarray(img, dtype=np.uint8)
            bbox, orig_wh = parse_voc_bbox(xml_path)
            if self.cache_images:
                self._cache[idx] = (u8, bbox, orig_wh)
        mask_idx = build_attn_mask(self.img_size, bbox, orig_wh,
                                   0.0, 1.0, 2.0).astype(np.uint8)
        if augment and self.hflip_prob > 0 \
                and self._rng.rand() < self.hflip_prob:
            u8 = u8[:, ::-1, :]
            if self.co_flip_mask:
                mask_idx = mask_idx[:, ::-1]
        return u8, label, mask_idx


def stratified_split(labels: Sequence[int], val_split: float = 0.1,
                     seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """Stratified train/val index split. Uses sklearn's
    StratifiedShuffleSplit(random_state=seed) when available — reproducing
    the reference's exact seed-42 split (new_scripy.py:630-631) — with a
    deterministic numpy fallback that preserves per-class proportions."""
    labels = np.asarray(labels)
    try:
        from sklearn.model_selection import StratifiedShuffleSplit

        splitter = StratifiedShuffleSplit(
            n_splits=1, test_size=val_split, random_state=seed
        )
        train_idx, val_idx = next(splitter.split(np.zeros(len(labels)), labels))
        return train_idx, val_idx
    except ImportError:  # pragma: no cover
        rng = np.random.RandomState(seed)
        train_idx, val_idx = [], []
        for cls in np.unique(labels):
            idx = np.where(labels == cls)[0]
            rng.shuffle(idx)
            n_val = max(1, int(round(len(idx) * val_split)))
            val_idx.extend(idx[:n_val])
            train_idx.extend(idx[n_val:])
        return np.asarray(sorted(train_idx)), np.asarray(sorted(val_idx))
