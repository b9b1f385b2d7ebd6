"""End-to-end fit() smoke tests: MNIST preset (CPU-runnable reference
config, SURVEY section 4d) and resume-from-checkpoint."""

import glob
import json
import os

import numpy as np
import pytest

from diffusionmodel_tpu.config import preset
from diffusionmodel_tpu.data.mnist import MnistDataset
from diffusionmodel_tpu.trainer import fit


@pytest.fixture(scope="module")
def tiny_mnist_cfg(tmp_path_factory):
    save_dir = str(tmp_path_factory.mktemp("out"))
    return preset(
        "mnist",
        **{
            "model.n_feat": 8,
            "diffusion.n_T": 8,
            "train.batch_size": 16,
            "train.n_epoch": 2,
            "train.eval_every": 10,   # skip in-loop sampling (speed)
            "train.min_save_ep": 0,
            "train.save_freq": 1,
            "train.save_dir": save_dir,
            "train.eval_sample_count": 0,
        },
    )


def test_fit_mnist_synthetic_end_to_end(tiny_mnist_cfg):
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    state = fit(tiny_mnist_cfg, dataset=ds, verbose=False)
    assert int(state.step) > 0
    # checkpoints + metrics written
    sd = tiny_mnist_cfg.train.save_dir
    assert glob.glob(os.path.join(sd, "ckpt_ep*"))
    mfiles = glob.glob(os.path.join(sd, "metrics", "metrics_ep*.json"))
    assert mfiles
    log = json.load(open(sorted(mfiles)[-1]))
    assert len(log["train_loss"]) == 2
    assert np.isfinite(log["train_loss"]).all()
    assert np.isfinite(log["val_loss"]).all()


def test_fit_resume(tiny_mnist_cfg):
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    sd = tiny_mnist_cfg.train.save_dir
    ck = sorted(glob.glob(os.path.join(sd, "ckpt_ep*")))[-1]
    import dataclasses

    cfg2 = tiny_mnist_cfg.replace(
        train=dataclasses.replace(tiny_mnist_cfg.train, n_epoch=3))
    state = fit(cfg2, dataset=ds, verbose=False, resume=ck)
    assert int(state.step) > 0


def test_fit_with_profiler_trace(tmp_path, tiny_mnist_cfg):
    import dataclasses

    ds = MnistDataset(synthetic=True, n_synthetic=96)
    prof = str(tmp_path / "prof")
    cfg = tiny_mnist_cfg.replace(train=dataclasses.replace(
        tiny_mnist_cfg.train, n_epoch=1, profile_dir=prof, profile_epoch=0,
        save_dir=str(tmp_path / "out")))
    fit(cfg, dataset=ds, verbose=False)
    # a trace directory with at least one event file must exist
    found = []
    for root, _, files in os.walk(prof):
        found.extend(files)
    assert found, "profiler trace not written"
