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

pytestmark = pytest.mark.slow  # excluded from the quick tier (-m "not slow")


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


def test_resume_does_not_clobber_best_model(tmp_path):
    """A resumed run's fresh EarlyStop (best=inf) must not overwrite an
    existing better best_model — the baseline is seeded from the
    best_val.json sidecar written alongside best_model."""
    import dataclasses

    from diffusionmodel_tpu.checkpoint import load_checkpoint

    sd = str(tmp_path / "run")
    cfg = preset("mnist", **{
        "model.n_feat": 8, "diffusion.n_T": 8,
        "train.batch_size": 16, "train.n_epoch": 2,
        "train.eval_every": 10, "train.min_save_ep": 0,
        "train.save_freq": 1, "train.save_dir": sd,
        "train.eval_sample_count": 0,
    })
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    fit(cfg, dataset=ds, verbose=False)
    best = os.path.join(sd, "best_model")
    assert os.path.exists(best)
    assert os.path.exists(os.path.join(sd, "best_val.json"))
    # make the recorded best unbeatable, then resume: best_model must
    # survive untouched
    with open(os.path.join(sd, "best_val.json"), "w") as f:
        json.dump({"epoch": 999, "val_loss": 0.0}, f)
    ep_before = int(load_checkpoint(best)["epoch"])
    ck = sorted(glob.glob(os.path.join(sd, "ckpt_ep*")))[-1]
    cfg3 = cfg.replace(train=dataclasses.replace(cfg.train, n_epoch=3))
    fit(cfg3, dataset=ds, verbose=False, resume=ck)
    assert int(load_checkpoint(best)["epoch"]) == ep_before


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


def test_final_ckpt_stamped_with_actual_epoch(tmp_path):
    """The post-loop save must record the last COMPLETED epoch (so --resume
    continues from there), not n_epoch-1, and must not duplicate an in-loop
    save (ADVICE r1)."""
    import dataclasses

    ds = MnistDataset(synthetic=True, n_synthetic=96)
    cfg = preset(
        "mnist",
        **{
            "model.n_feat": 8,
            "diffusion.n_T": 8,
            "train.batch_size": 16,
            "train.n_epoch": 2,
            "train.eval_every": 10,
            "train.min_save_ep": 100,  # in-loop periodic save never fires
            "train.save_dir": str(tmp_path / "out"),
            "train.eval_sample_count": 0,
        },
    )
    fit(cfg, dataset=ds, verbose=False)
    cks = sorted(glob.glob(os.path.join(cfg.train.save_dir, "ckpt_ep*")))
    # exactly one post-loop checkpoint, stamped with the last epoch (1)
    assert [os.path.basename(c) for c in cks] == ["ckpt_ep1"]
    # resume from it trains the remaining epoch (not zero)
    cfg3 = cfg.replace(train=dataclasses.replace(
        cfg.train, n_epoch=3, save_dir=str(tmp_path / "out2")))
    state = fit(cfg3, dataset=ds, verbose=False, resume=cks[-1])
    assert int(state.step) > 0


def test_metrics_log_scheduled_lr(tiny_mnist_cfg, tmp_path):
    """metrics_log['lr'] must record the live scheduled LR per epoch, not
    the constant base lr (new_scripy.py:913-917 logs the scheduler value)."""
    import dataclasses

    cfg = tiny_mnist_cfg.replace(train=dataclasses.replace(
        tiny_mnist_cfg.train, save_dir=str(tmp_path / "lrout")))
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    fit(cfg, dataset=ds, verbose=False)
    sd = cfg.train.save_dir
    mfiles = glob.glob(os.path.join(sd, "metrics", "metrics_ep*.json"))
    assert mfiles
    log = json.load(open(sorted(mfiles)[-1]))
    lr0 = cfg.train.lr
    # mnist preset: linear decay lr0*(1 - ep/n_epoch), n_epoch=2
    assert abs(log["lr"][0] - lr0) < 1e-12
    assert abs(log["lr"][1] - lr0 * 0.5) < 1e-12


def test_gen_samples_classes_block_ordered(tmp_path, monkeypatch):
    """gen_samples must pass block-ordered classes (class i repeated n_per
    times) to the sampler so per-class filenames/grid rows are correct —
    fixing the reference's mislabeling quirk Q10 (new_scripy.py:447-448 vs
    1051-1061)."""
    import jax
    import jax.numpy as jnp

    from diffusionmodel_tpu import sample as sample_mod
    from diffusionmodel_tpu.checkpoint import save_checkpoint
    from diffusionmodel_tpu.nn import build_model

    cfg = preset(
        "mnist",
        **{
            "model.n_feat": 8,
            "diffusion.n_T": 4,
            "sample.samples_per_class": 2,
            "sample.guide_scales": (2.0,),
            "sample.eval_quality": False,
            "sample.sample_dir": str(tmp_path),
        },
    )
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    x = jnp.zeros((1, 28, 28, 1))
    variables = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
        jnp.full((1,), 0.5), jnp.ones((1,)), attn_mask=None, train=False)
    ck = str(tmp_path / "ck.pkl")
    save_checkpoint(ck, {"params": variables["params"],
                         "batch_stats": variables.get("batch_stats", {})})

    captured = {}

    def spy_make_sampler(model, cfg, sched, has_bn, n_sample, classes=None,
                         chunk=50, **kw):
        captured["classes"] = None if classes is None else np.asarray(classes)

        def fake(params, batch_stats, key, w):
            return np.zeros((n_sample, 28, 28, 1), np.float32)

        return fake

    monkeypatch.setattr(sample_mod, "make_sampler", spy_make_sampler)
    res = sample_mod.gen_samples(cfg, ck, verbose=False)
    n_per = cfg.sample.samples_per_class
    expect = np.repeat(np.arange(10), n_per)
    np.testing.assert_array_equal(captured["classes"], expect)
    assert os.path.isdir(res["out_dir"])


def test_fit_resume_across_moment_dtypes(tmp_path):
    """A checkpoint written with fp32 Adam moments must resume into a
    bf16-moment (train.moment_dtype) run without error — the restore path
    casts opt-state leaves to the fresh template's dtypes (round 3; the
    353M flagship's round-2 checkpoints are fp32-moment)."""
    import dataclasses
    import glob as _glob

    import jax
    import jax.numpy as jnp

    ds = MnistDataset(synthetic=True, n_synthetic=96)
    base = preset(
        "mnist",
        **{
            "model.n_feat": 8,
            "diffusion.n_T": 8,
            "train.batch_size": 16,
            "train.n_epoch": 1,
            "train.eval_every": 10,
            "train.min_save_ep": 0,
            "train.save_freq": 1,
            "train.save_dir": str(tmp_path / "out"),
            "train.eval_sample_count": 0,
            "train.moment_dtype": "float32",
        },
    )
    fit(base, dataset=ds, verbose=False)
    ck = sorted(_glob.glob(os.path.join(base.train.save_dir, "ckpt_ep*")))[-1]

    cfg2 = base.replace(train=dataclasses.replace(
        base.train, n_epoch=2, moment_dtype="bfloat16"))
    state = fit(cfg2, dataset=ds, verbose=False, resume=ck)
    mus = [leaf for path, leaf in
           jax.tree_util.tree_leaves_with_path(state.opt_state)
           if any(getattr(p, "name", "") == "mu" for p in path)]
    assert mus, "no mu leaves found in opt_state"
    assert all(leaf.dtype == jnp.bfloat16 for leaf in
               jax.tree.leaves(mus))
