"""Image-quality metrics: FID / SSIM / PSNR (new_scripy.py:1111-1290).

Reference-parity notes (SURVEY Q6):

- SSIM is the reference's *global-statistics* formula over whole images
  (means/stds of the full tensor, C1=0.01^2, C2=0.03^2), NOT windowed SSIM
  (new_scripy.py:1189-1224).
- PSNR = 20*log10(1/sqrt(MSE)), +inf at MSE=0 (new_scripy.py:1226-1250).
- Both renormalize inputs from [-1,1] to [0,1] when min < 0, and pair the
  i-th real with the i-th generated image (a distribution-similarity usage,
  not reconstruction — reproduced as-is).
- FID: Inception-pool features (2048-d), mean/cov, Frechet distance with
  matrix sqrt; requires >= 10 samples per side (new_scripy.py:1266). The
  matrix sqrt runs on-device via an eigendecomposition of the symmetrized
  product (no scipy.linalg.sqrtm on TPU); complex residue is dropped to the
  real part like the reference does.

The feature extractor is pluggable: a JAX InceptionV3 (weights converted
from a user-supplied torchvision checkpoint; zero-egress environments can't
download them) or a deterministic random-projection conv net fallback whose
scores are comparable across runs but NOT against published FID numbers.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

def _to_unit_range(img: np.ndarray) -> np.ndarray:
    return (img + 1.0) / 2.0 if img.min() < 0 else img


def calc_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """Global-statistics SSIM over whole images ([C,H,W] or [H,W,C])."""
    img1 = _to_unit_range(np.asarray(img1, np.float64))
    img2 = _to_unit_range(np.asarray(img2, np.float64))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2 = img1.mean(), img2.mean()
    s1, s2 = img1.std(), img2.std()
    s12 = ((img1 - mu1) * (img2 - mu2)).mean()
    return float(
        ((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
        / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 ** 2 + s2 ** 2 + c2))
    )


def calc_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    img1 = _to_unit_range(np.asarray(img1, np.float32))
    img2 = _to_unit_range(np.asarray(img2, np.float32))
    mse = float(np.mean((img1 - img2) ** 2))
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(1.0 / np.sqrt(mse)))


def matrix_sqrt_psd(a: np.ndarray) -> np.ndarray:
    """sqrtm for (near-)PSD matrices via eigendecomposition.

    Runs on host in float64: fp32 eigh loses ~1e-2 per entry, which is fatal
    for FID's trace term; the 2048x2048 host eigh costs well under a second.
    Negative eigenvalues from numerical noise are clipped — equivalent to
    the reference discarding the complex part of scipy's sqrtm output.
    """
    a = np.asarray(a, np.float64)
    w, v = np.linalg.eigh((a + a.T) / 2.0)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)[None, :]) @ v.T


def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """FID between two Gaussians. The cross term uses the similarity-
    transform identity trace sqrtm(S1 S2) == trace sqrtm(S1^1/2 S2 S1^1/2),
    which keeps everything symmetric-PSD for eigh."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    s1_half = matrix_sqrt_psd(sigma1)
    covmean = matrix_sqrt_psd(s1_half @ sigma2 @ s1_half)
    fid = diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * np.trace(
        covmean
    )
    return float(fid)


def polynomial_mmd2(x: np.ndarray, y: np.ndarray, degree: int = 3,
                    gamma: Optional[float] = None,
                    coef0: float = 1.0) -> float:
    """Unbiased MMD^2 with the KID polynomial kernel
    k(a,b) = (gamma a.b + coef0)^degree, gamma = 1/dim (Binkowski et al.,
    "Demystifying MMD GANs", ICLR 2018). Diagonal terms are excluded from
    the within-set sums, so E[estimate] = MMD^2 exactly — slightly negative
    values on identical distributions are expected, not a bug."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    kxx = (gamma * (x @ x.T) + coef0) ** degree
    kyy = (gamma * (y @ y.T) + coef0) ** degree
    kxy = (gamma * (x @ y.T) + coef0) ** degree
    m, n = len(x), len(y)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    return float(sum_xx + sum_yy - 2.0 * kxy.mean())


def kid_from_feats(real_feats: np.ndarray, gen_feats: np.ndarray,
                   n_subsets: int = 100, subset_size: int = 100,
                   seed: int = 0):
    """Kernel Inception Distance: mean +- std of unbiased polynomial-MMD^2
    over random subsets (the standard estimator). Unlike FID — whose
    2048x2048 covariance estimate is badly biased at n=100 samples — KID
    is unbiased at any sample size, so it is the right companion metric
    for the 100-images-per-scale quality gate. Returns (mean, std); report
    mean x1000 by convention. The reference has no KID counterpart
    (new_scripy.py:1111-1290 implements FID/SSIM/PSNR only) — this is a
    small-sample-robustness upgrade using the same feature extractor."""
    rng = np.random.RandomState(seed)
    m = min(subset_size, len(real_feats), len(gen_feats))
    vals = []
    for _ in range(n_subsets):
        r = real_feats[rng.choice(len(real_feats), m, replace=False)]
        g = gen_feats[rng.choice(len(gen_feats), m, replace=False)]
        vals.append(polynomial_mmd2(r, g))
    return float(np.mean(vals)), float(np.std(vals))


def _default_feature_fn():
    """Deterministic weight-free feature extractor: the block-validated
    InceptionV3 trunk (metrics/inception.py, cross-checked against
    torchvision in tests/test_inception_parity.py) with fixed-seed random
    weights. Conv kernels are rescaled from flax's lecun_normal to He
    (x sqrt 2) so activation variance survives the trunk's ~20 ReLU layers.
    FID computed with it uses the real 2048-d Inception topology and is
    self-consistent (comparable across checkpoints/runs) but NOT comparable
    to trained-Inception published numbers — hence reported as "fid_proxy".
    Random deep-CNN features are a standard FID stand-in when trained
    weights are unavailable (the reference's trained trunk is
    new_scripy.py:1120-1127; this zero-egress image has no weights)."""
    from diffusionmodel_tpu.metrics.inception import InceptionV3Features

    model = InceptionV3Features()
    variables = jax.jit(model.init)(jax.random.PRNGKey(42),
                                    jnp.zeros((1, 299, 299, 3)))
    root = 2.0 ** 0.5

    def he(path, leaf):
        return leaf * root if path[-1].key == "kernel" else leaf

    variables = {
        "params": jax.tree_util.tree_map_with_path(
            he, variables["params"]),
        "batch_stats": variables.get("batch_stats", {}),
    }
    # variables are a jit ARGUMENT, not a closure: closing over the ~24M
    # Inception params would embed ~95MB of constants in the program —
    # this environment's remote-compile service rejects such payloads
    # (CLAUDE.md: HTTP 413), and every new batch shape would re-ship them.
    feat = jax.jit(model.apply)
    return lambda x: feat(variables, x)


class ImageMetrics:
    """Batch quality evaluation (FID/SSIM/PSNR), mirroring the reference's
    dispatcher semantics (new_scripy.py:1252-1290)."""

    def __init__(self, feature_fn: Optional[Callable] = None,
                 inception_weights: Optional[str] = None, batch_size: int = 8):
        self._feature_fn = feature_fn
        self._inception_weights = inception_weights
        self.batch_size = batch_size
        # Which extractor produced the FID: "inception" (converted
        # torchvision weights — comparable to published FID), "custom"
        # (caller-supplied fn), or "proxy" (the random-projection fallback,
        # reported as "fid_proxy" so it can never be mistaken for
        # Inception FID).
        self.feature_kind = "custom" if feature_fn is not None else (
            "inception" if inception_weights else "proxy")

    @property
    def fid_key(self) -> str:
        return "fid" if self.feature_kind in ("inception", "custom") \
            else "fid_proxy"

    def _features(self):
        if self._feature_fn is None:
            if self._inception_weights:
                from diffusionmodel_tpu.metrics.inception import (
                    load_inception_feature_fn,
                )

                self._feature_fn = load_inception_feature_fn(
                    self._inception_weights
                )
            else:
                self._feature_fn = _default_feature_fn()
        return self._feature_fn

    def extract_features(self, images: np.ndarray) -> np.ndarray:
        """images: [N,H,W,C] in [-1,1] or [0,1]; resized to 299 on-device."""
        fn = self._features()
        feats = []
        imgs = np.asarray(images, np.float32)
        if imgs.min() < 0:
            imgs = (imgs + 1.0) / 2.0
        for i in range(0, len(imgs), self.batch_size):
            batch = jnp.asarray(imgs[i:i + self.batch_size])
            if batch.shape[-1] == 1:
                batch = jnp.tile(batch, (1, 1, 1, 3))
            if batch.shape[1] != 299 or batch.shape[2] != 299:
                # the reference resizes with F.interpolate(bilinear,
                # align_corners=False) = half-pixel centers
                # (new_scripy.py:1138-1141) — jax.image.resize "bilinear"
                # has exactly those semantics (cross-checked in
                # tests/test_inception_parity.py).
                batch = jax.image.resize(
                    batch, (batch.shape[0], 299, 299, batch.shape[-1]),
                    method="bilinear")
            feats.append(np.asarray(fn(batch)))
        return np.concatenate(feats, axis=0)

    def calc_fid(self, real_images: np.ndarray, gen_images: np.ndarray) -> float:
        rf = self.extract_features(real_images).astype(np.float64)
        gf = self.extract_features(gen_images).astype(np.float64)
        mu_r, mu_g = rf.mean(0), gf.mean(0)
        sig_r = np.cov(rf, rowvar=False)
        sig_g = np.cov(gf, rowvar=False)
        return frechet_distance(mu_r, sig_r, mu_g, sig_g)

    calc_ssim = staticmethod(calc_ssim)
    calc_psnr = staticmethod(calc_psnr)

    def evaluate_batch(self, real_images: np.ndarray,
                       gen_images: np.ndarray) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        real_images = np.asarray(real_images)
        gen_images = np.asarray(gen_images)
        if len(real_images) >= 10 and len(gen_images) >= 10:
            try:
                metrics[self.fid_key] = self.calc_fid(real_images, gen_images)
            except Exception as e:  # mirror the reference's NaN-on-failure
                print(f"FID calculation failed: {e}")
                metrics[self.fid_key] = float("nan")
        if len(real_images) == len(gen_images):
            ssims = [calc_ssim(r, g) for r, g in zip(real_images, gen_images)]
            psnrs = [calc_psnr(r, g) for r, g in zip(real_images, gen_images)]
            if ssims:
                metrics["ssim"] = float(np.mean(ssims))
            if psnrs:
                metrics["psnr"] = float(np.mean(psnrs))
        return metrics
