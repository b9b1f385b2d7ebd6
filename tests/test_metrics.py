"""Metrics: global-SSIM / PSNR formulas, Frechet distance vs scipy."""

import numpy as np
import pytest

from diffusionmodel_tpu.metrics.image_metrics import (
    ImageMetrics,
    calc_psnr,
    calc_ssim,
    frechet_distance,
    matrix_sqrt_psd,
)


def test_ssim_identical_is_one():
    img = np.random.RandomState(0).rand(3, 16, 16).astype(np.float32)
    assert calc_ssim(img, img) == pytest.approx(1.0, abs=1e-6)


def test_ssim_global_formula_manual():
    rng = np.random.RandomState(1)
    a = rng.rand(3, 8, 8)
    b = rng.rand(3, 8, 8)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    mu1, mu2, s1, s2 = a.mean(), b.mean(), a.std(), b.std()
    s12 = ((a - mu1) * (b - mu2)).mean()
    want = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 ** 2 + s2 ** 2 + c2))
    assert calc_ssim(a, b) == pytest.approx(want, rel=1e-9)


def test_ssim_renormalizes_negative_range():
    rng = np.random.RandomState(2)
    a01 = rng.rand(3, 8, 8)
    b01 = rng.rand(3, 8, 8)
    # same images in [-1,1] must give the same score
    assert calc_ssim(a01 * 2 - 1, b01 * 2 - 1) == pytest.approx(
        calc_ssim(a01, b01), rel=1e-6)


def test_psnr():
    a = np.zeros((3, 4, 4), np.float32)
    assert calc_psnr(a, a) == float("inf")
    b = np.full((3, 4, 4), 0.1, np.float32)
    assert calc_psnr(a, b) == pytest.approx(20 * np.log10(1 / 0.1), rel=1e-5)


def test_matrix_sqrt_vs_scipy():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.RandomState(3)
    a = rng.randn(16, 16)
    psd = a @ a.T + 0.1 * np.eye(16)
    got = np.asarray(matrix_sqrt_psd(psd))
    want = scipy_linalg.sqrtm(psd).real
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frechet_distance_zero_for_identical():
    rng = np.random.RandomState(4)
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T + 0.1 * np.eye(8)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-3)


def test_frechet_distance_vs_scipy_formula():
    scipy_linalg = pytest.importorskip("scipy.linalg")
    rng = np.random.RandomState(5)
    f1 = rng.randn(64, 8)
    f2 = rng.randn(64, 8) + 1.0
    mu1, mu2 = f1.mean(0), f2.mean(0)
    s1 = np.cov(f1, rowvar=False)
    s2 = np.cov(f2, rowvar=False)
    covmean, _ = scipy_linalg.sqrtm(s1.dot(s2), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    want = (mu1 - mu2).dot(mu1 - mu2) + np.trace(s1 + s2 - 2 * covmean)
    got = frechet_distance(mu1, s1, mu2, s2)
    assert got == pytest.approx(want, rel=1e-3)


def test_evaluate_batch_dispatcher():
    m = ImageMetrics()
    rng = np.random.RandomState(6)
    small_r = rng.rand(4, 8, 8, 3).astype(np.float32)
    small_g = rng.rand(4, 8, 8, 3).astype(np.float32)
    # < 10 samples: no FID, but SSIM/PSNR present (equal lengths)
    out = m.evaluate_batch(small_r, small_g)
    assert "fid" not in out and "ssim" in out and "psnr" in out
    # unequal lengths: no SSIM/PSNR
    out2 = m.evaluate_batch(small_r, small_g[:3])
    assert "ssim" not in out2 and "psnr" not in out2


def test_fid_discriminates_distributions():
    # With the fallback feature extractor, FID(same-dist) << FID(diff-dist).
    m = ImageMetrics(batch_size=4)
    rng = np.random.RandomState(7)
    a = rng.rand(12, 32, 32, 3).astype(np.float32)
    b = rng.rand(12, 32, 32, 3).astype(np.float32)
    c = np.clip(b + 0.7, 0, 1)  # strongly shifted distribution
    fid_same = m.calc_fid(a, b)
    fid_diff = m.calc_fid(a, c)
    assert np.isfinite(fid_same) and np.isfinite(fid_diff)
    assert fid_diff > fid_same


def test_polynomial_mmd2_unbiased_near_zero_on_same_dist():
    from diffusionmodel_tpu.metrics.image_metrics import polynomial_mmd2

    rng = np.random.RandomState(8)
    x = rng.randn(200, 16)
    y = rng.randn(200, 16)
    same = polynomial_mmd2(x, y)
    # unbiased estimator: near zero (can be slightly negative) on
    # identically distributed sets; large under a clear mean shift
    shifted = polynomial_mmd2(x, y + 1.0)
    assert abs(same) < 0.5
    assert shifted > 10 * abs(same)


def test_kid_from_feats_orders_distances():
    from diffusionmodel_tpu.metrics.image_metrics import kid_from_feats

    rng = np.random.RandomState(9)
    real = rng.randn(300, 32)
    near = rng.randn(120, 32) + 0.1
    far = rng.randn(120, 32) + 1.5
    kid_near, std_near = kid_from_feats(real, near, n_subsets=20,
                                        subset_size=64)
    kid_far, _ = kid_from_feats(real, far, n_subsets=20, subset_size=64)
    assert kid_far > kid_near
    assert std_near >= 0.0
    # deterministic for a fixed seed
    again, _ = kid_from_feats(real, near, n_subsets=20, subset_size=64)
    assert again == pytest.approx(kid_near)


def test_cli_eval_mode_folder_vs_folder(tmp_path):
    """--mode eval scores a generated-image directory against a real set
    offline (fid_proxy/KID/SSIM/PSNR written to JSON) — the standalone
    analogue of the reference's inline quality eval
    (new_scripy.py:1001-1029, 1082-1099)."""
    import json

    from PIL import Image

    from diffusionmodel_tpu.cli import main as cli_main

    rng = np.random.RandomState(11)
    for side, base in (("real", 0.3), ("gen", 0.5)):
        for cls in ("a", "b"):
            d = tmp_path / side / cls
            d.mkdir(parents=True)
            for i in range(6):
                arr = (rng.rand(32, 32, 3) * 0.4 + base) * 255
                Image.fromarray(arr.astype(np.uint8)).save(
                    d / f"{i}.png")
    out = tmp_path / "metrics.json"
    rc = cli_main(["--mode", "eval",
                   "--real_dir", str(tmp_path / "real"),
                   "--gen_dir", str(tmp_path / "gen"),
                   "--img_size", "32",
                   "--eval_out", str(out)])
    assert rc == 0
    doc = json.loads(out.read_text())
    assert doc["n_real"] == 12 and doc["n_gen"] == 12
    assert doc["n_pairs"] == 12  # class-aligned pairing
    for key in ("fid_proxy", "kid_proxy_x1000", "ssim", "psnr"):
        assert key in doc and np.isfinite(doc[key])
