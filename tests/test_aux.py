"""Aux capabilities: MNIST data, GIF animation, dataset visualization,
checkpoint roundtrip."""

import os

import numpy as np
import pytest

from diffusionmodel_tpu.checkpoint import (
    extract_params,
    load_checkpoint,
    save_checkpoint,
)
from diffusionmodel_tpu.data.mnist import MnistDataset, synthetic_mnist
from diffusionmodel_tpu.utils.animation import (
    reference_frame_indices,
    save_denoising_gif,
)


def test_synthetic_mnist_shapes_and_determinism():
    x1, y1 = synthetic_mnist(64, seed=3)
    x2, y2 = synthetic_mnist(64, seed=3)
    assert x1.shape == (64, 28, 28, 1) and y1.shape == (64,)
    np.testing.assert_array_equal(x1, x2)
    assert 0 <= y1.min() and y1.max() <= 9
    assert 0.0 <= x1.min() and x1.max() <= 1.0


def test_mnist_dataset_ducktype():
    ds = MnistDataset(synthetic=True, n_synthetic=32)
    assert len(ds) == 32
    x, c, m = ds.load(0)
    assert x.shape == (28, 28, 1) and m.shape == (28, 28)
    assert ds.classes == [str(i) for i in range(10)]

    from diffusionmodel_tpu.data import BatchLoader

    loader = BatchLoader(ds, np.arange(32), batch_size=8, accum_steps=1,
                         num_workers=0)
    batch = next(iter(loader))
    assert batch["x"].shape == (1, 8, 28, 28, 1)


def test_frame_indices_reference_recipe():
    # n_T=400: keep i==400, i%20==0 (380..20), i<8 (7..1)
    idx = reference_frame_indices(400)
    kept_steps = [400 - k for k in idx]
    assert kept_steps[0] == 400
    assert 380 in kept_steps and 20 in kept_steps
    assert all(s in kept_steps for s in range(1, 8))
    assert 399 not in kept_steps


def test_save_gif(tmp_path):
    hist = np.random.RandomState(0).rand(30, 4, 8, 8, 1).astype(np.float32)
    path = save_denoising_gif(hist, str(tmp_path / "anim.gif"), nrow=2)
    assert os.path.exists(path) and os.path.getsize(path) > 0


def test_checkpoint_roundtrip_pickle(tmp_path):
    payload = {"epoch": 3, "params": {"w": np.arange(4.0)}, "val_loss": 0.5}
    p = save_checkpoint(str(tmp_path / "ck.pkl"), payload)
    back = load_checkpoint(p)
    assert back["epoch"] == 3
    np.testing.assert_array_equal(extract_params(back)["w"], np.arange(4.0))


def test_checkpoint_roundtrip_orbax(tmp_path):
    payload = {"epoch": 7, "params": {"w": np.ones((2, 2))}}
    p = save_checkpoint(str(tmp_path / "ck_orbax"), payload, fmt="orbax")
    back = load_checkpoint(p)
    assert int(back["epoch"]) == 7
    np.testing.assert_array_equal(back["params"]["w"], np.ones((2, 2)))


def test_checkpoint_roundtrip_dir_pickle(tmp_path):
    """Default directory layout is the atomic single-pickle (fast on slow
    disks); load_checkpoint auto-detects it vs the orbax layout."""
    payload = {"epoch": 9, "params": {"w": np.full((3,), 2.0)}}
    p = save_checkpoint(str(tmp_path / "ck_dir"), payload)
    assert os.path.exists(os.path.join(p, "payload.pkl"))
    back = load_checkpoint(p)
    assert back["epoch"] == 9
    np.testing.assert_array_equal(back["params"]["w"], np.full((3,), 2.0))
    # overwrite in place (the trainer re-saves best_model repeatedly)
    payload2 = {"epoch": 10, "params": {"w": np.zeros((3,))}}
    save_checkpoint(str(tmp_path / "ck_dir"), payload2)
    assert load_checkpoint(p)["epoch"] == 10


def test_checkpoint_overwrite_survives_interrupted_swap(tmp_path):
    """The dir-overwrite swap is rename-aside (never rmtree-then-rename):
    a crash between the two renames leaves the previous checkpoint as
    <path>.old-<pid>, which load_checkpoint falls back to; a successful
    later save cleans stale .tmp-*/.old-* leftovers."""
    import shutil

    target = str(tmp_path / "ck_dir")
    save_checkpoint(target, {"epoch": 1, "params": {"w": np.ones(2)}})
    # simulate the crash window: old renamed aside, new rename never ran
    os.rename(target, target + ".old-99999")
    back = load_checkpoint(target)  # falls back to the stranded .old dir
    assert back["epoch"] == 1
    # a stale tmp dir from a killed writer must not break the next save
    os.makedirs(target + ".tmp-88888")
    save_checkpoint(target, {"epoch": 2, "params": {"w": np.zeros(2)}})
    assert load_checkpoint(target)["epoch"] == 2
    import glob

    assert glob.glob(target + ".tmp-*") == []
    assert glob.glob(target + ".old-*") == []


def test_ckpt_writer_coalesces_and_drains(tmp_path):
    from diffusionmodel_tpu.trainer import _CkptWriter

    w = _CkptWriter(verbose=False)
    # hold the writer busy with a first write, then queue two best_model
    # payloads — only the NEWER may land (stale snapshot skipped)
    for i in range(3):
        w.submit("ck_a", str(tmp_path / f"a{i}"),
                 {"epoch": i, "params": {"x": np.arange(8.0)}})
    w.submit("best_model", str(tmp_path / "best"),
             {"epoch": 1, "params": {"x": np.zeros(4)}},
             sidecar=(str(tmp_path / "best_val.json"),
                      {"epoch": 1, "val_loss": 0.5}))
    w.submit("best_model", str(tmp_path / "best"),
             {"epoch": 2, "params": {"x": np.ones(4)}},
             sidecar=(str(tmp_path / "best_val.json"),
                      {"epoch": 2, "val_loss": 0.4}))
    w.close()
    assert not w.errors
    # per-name coalescing: ck_a kept only the last payload per name key
    back = load_checkpoint(str(tmp_path / "a2"))
    assert back["epoch"] == 2
    best = load_checkpoint(str(tmp_path / "best"))
    assert best["epoch"] == 2
    import json as _json

    assert _json.load(open(tmp_path / "best_val.json"))["epoch"] == 2


def test_early_stop_snapshot_throttle():
    from types import SimpleNamespace

    from diffusionmodel_tpu.train import EarlyStop

    es = EarlyStop(patience=100, min_delta=0.0, verbose=False,
                   snapshot_min_epochs=5)
    state = SimpleNamespace(params={"w": np.arange(3.0)},
                            batch_stats={}, ema_params=None)
    assert es(1.0, state, 0) is True          # first improvement: snapshot
    assert es.best_state["epoch"] == 0
    assert es(0.9, state, 2) is False         # improved, snapshot throttled
    assert es.best_loss == 0.9                # bookkeeping stays exact
    assert es.best_state["epoch"] == 0
    assert es(0.8, state, 5) is True          # >=5 epochs: snapshot refresh
    assert es.best_state["epoch"] == 5
    assert es.counter == 0


def test_visualize_dataset(tmp_path):
    pytest.importorskip("PIL")
    # reuse the fake dataset fixture machinery from test_data
    from tests.test_data import _write_xml
    from PIL import Image

    root = tmp_path / "ds"
    (root / "images" / "c_0").mkdir(parents=True)
    (root / "annotations").mkdir()
    for i in range(3):
        Image.new("RGB", (64, 64), (120, 90, 60)).save(
            root / "images" / "c_0" / f"i{i}.jpg")
        _write_xml(str(root / "annotations" / f"i{i}.xml"), (10, 20, 40, 50))

    from diffusionmodel_tpu.data import CrackDataset
    from diffusionmodel_tpu.data.visualize import visualize_dataset_samples

    ds = CrackDataset(str(root), img_size=32)
    out = visualize_dataset_samples(ds, n_samples=3,
                                    out_path=str(tmp_path / "viz.png"))
    assert os.path.exists(out)


def test_cli_visualize_mode(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    from tests.test_data import _write_xml

    root = tmp_path / "ds"
    (root / "images" / "c_0").mkdir(parents=True)
    (root / "annotations").mkdir()
    for i in range(3):
        Image.new("RGB", (64, 64), (120, 90, 60)).save(
            root / "images" / "c_0" / f"i{i}.jpg")
        _write_xml(str(root / "annotations" / f"i{i}.xml"), (10, 20, 40, 50))

    from diffusionmodel_tpu.cli import main

    out = tmp_path / "sheet.png"
    rc = main(["--mode", "visualize", "--data_root", str(root),
               "--viz_out", str(out), "--samples", "2",
               "-o", "model.img_size=32"])
    assert rc == 0 and out.exists() and out.stat().st_size > 0
    # missing dataset root -> clean error, not a traceback
    rc = main(["--mode", "visualize",
               "--data_root", str(tmp_path / "nope"),
               "--viz_out", str(tmp_path / "x.png")])
    assert rc == 1


def test_mnist_eval_grid(tmp_path):
    from diffusionmodel_tpu.utils.grid import mnist_eval_grid

    rng = np.random.RandomState(0)
    gen = rng.rand(20, 28, 28, 1).astype(np.float32)
    real = rng.rand(40, 28, 28, 1).astype(np.float32)
    labels = np.tile(np.arange(10), 4)
    p = mnist_eval_grid(gen, real, labels, 10, str(tmp_path / "g.png"))
    assert os.path.exists(p) and os.path.getsize(p) > 0


def test_cli_flag_aliases():
    from diffusionmodel_tpu.cli import build_parser

    p = build_parser()
    # reference spellings
    a = p.parse_args(["--mode", "generate", "--ckpt", "x",
                      "--guide_scales", "2.0", "4.0", "--samples", "3"])
    assert a.ckpt == "x" and a.guide_scales == [2.0, 4.0] and a.samples == 3
    # BASELINE.json alias spellings
    b = p.parse_args(["--mode", "generate", "--checkpoint", "y",
                      "--guidance_scales", "6.0", "--samples_per_class", "5"])
    assert b.ckpt == "y" and b.guide_scales == [6.0] and b.samples == 5


def test_cli_serve_flags():
    from diffusionmodel_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args(["--mode", "serve", "--ckpt", "m", "--port", "8123",
                      "--max_batch", "4", "--sampler", "ddim"])
    assert a.mode == "serve" and a.port == 8123 and a.max_batch == 4
