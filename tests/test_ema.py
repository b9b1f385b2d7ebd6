"""EMA shadow params (train.ema_decay — beyond-reference extra).

The reference samples from the live training params (new_scripy.py:851-893
uses model directly), so ema_decay=0.0 (off) is the parity default; these
tests pin the opt-in behavior: in-graph warmed-up EMA update, checkpoint
round-trip, extract_params preference, and resume seeding.
"""

import dataclasses
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.checkpoint import (
    extract_params,
    load_checkpoint,
    save_checkpoint,
)
from diffusionmodel_tpu.config import preset
from diffusionmodel_tpu.data.mnist import MnistDataset
from diffusionmodel_tpu.diffusion import Schedule
from diffusionmodel_tpu.nn import build_model
from diffusionmodel_tpu.train import create_train_state, make_train_step
from diffusionmodel_tpu.trainer import fit


def _tiny_cfg(save_dir, **extra):
    return preset("mnist", **{
        "model.n_feat": 8,
        "diffusion.n_T": 8,
        "train.batch_size": 16,
        "train.n_epoch": 2,
        "train.eval_every": 10,
        "train.min_save_ep": 0,
        "train.save_freq": 1,
        "train.save_dir": save_dir,
        "train.eval_sample_count": 0,
        **extra,
    })


def _batch(key, cfg, a=1, b=4):
    mc = cfg.model
    kx, kc = jax.random.split(key)
    return {
        "x": jax.random.normal(kx, (a, b, mc.img_size, mc.img_size, mc.in_ch)),
        "c": jax.random.randint(kc, (a, b), 0, mc.n_classes),
    }


def test_ema_off_by_default(tmp_path):
    cfg = _tiny_cfg(str(tmp_path))
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    state, _ = create_train_state(model, cfg, jax.random.PRNGKey(0), 4)
    assert state.ema_params is None


def test_ema_update_matches_manual_recurrence(tmp_path):
    decay = 0.5  # large (1-d) so drift is visible in 2 steps
    cfg = _tiny_cfg(str(tmp_path), **{"train.ema_decay": decay})
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), 4)
    step = jax.jit(make_train_step(model, sched, cfg, tx,
                                   bool(state.batch_stats)))

    ema = jax.device_get(state.ema_params)  # == initial params
    key = jax.random.PRNGKey(1)
    for i in range(2):
        key, kb, ks = jax.random.split(key, 3)
        prev_step = int(state.step)
        state, _ = step(state, _batch(kb, cfg), ks)
        d = min(decay, (1.0 + prev_step) / (10.0 + prev_step))
        ema = jax.tree.map(
            lambda e, p: e * d + np.asarray(p, np.float32) * (1.0 - d),
            ema, jax.device_get(state.params))
    got = jax.device_get(state.ema_params)
    leaves_a, leaves_b = jax.tree.leaves(ema), jax.tree.leaves(got)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    # and the shadow actually differs from the live params after warmup
    diffs = [float(np.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(got), jax.tree.leaves(jax.device_get(state.params)))]
    assert max(diffs) > 0


def test_fit_ema_checkpoint_roundtrip_and_resume(tmp_path):
    sd = str(tmp_path / "ema_run")
    cfg = _tiny_cfg(sd, **{"train.ema_decay": 0.999})
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    state = fit(cfg, dataset=ds, verbose=False)
    assert state.ema_params is not None

    ck = sorted(glob.glob(os.path.join(sd, "ckpt_ep*")))[-1]
    ckpt = load_checkpoint(ck)
    assert ckpt.get("ema_params") is not None
    # sampling paths prefer the shadow; resume takes the live params
    ema = extract_params(ckpt)
    live = extract_params(ckpt, prefer_ema=False)
    d = max(float(np.abs(np.asarray(a, np.float32)
                         - np.asarray(b, np.float32)).max())
            for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(live)))
    assert d > 0

    # resume continues with the shadow restored
    cfg3 = cfg.replace(train=dataclasses.replace(cfg.train, n_epoch=3))
    state2 = fit(cfg3, dataset=ds, verbose=False, resume=ck)
    assert state2.ema_params is not None
    # the step counter is seeded from the resumed position, so the EMA
    # warm-up min(decay, (1+step)/(10+step)) does NOT restart at ~0.1
    # and blow away the restored shadow (96 imgs / batch 16 = 6
    # steps/epoch, resumed at epoch 2, ran 1 more => step >= 18)
    assert int(state2.step) >= 18


def test_resume_ema_run_from_ema_less_checkpoint(tmp_path):
    sd = str(tmp_path / "plain_run")
    ds = MnistDataset(synthetic=True, n_synthetic=96)
    fit(_tiny_cfg(sd), dataset=ds, verbose=False)
    ck = sorted(glob.glob(os.path.join(sd, "ckpt_ep*")))[-1]
    assert load_checkpoint(ck).get("ema_params") is None

    cfg = _tiny_cfg(str(tmp_path / "ema_cont"),
                    **{"train.ema_decay": 0.999, "train.n_epoch": 3})
    state = fit(cfg, dataset=ds, verbose=False, resume=ck)
    assert state.ema_params is not None  # seeded from the restored params


def test_extract_params_prefers_ema_only_when_present(tmp_path):
    payload = {"params": {"w": np.ones((2,))}, "epoch": 0}
    p = save_checkpoint(str(tmp_path / "c.pkl"), payload)
    ckpt = load_checkpoint(p)
    np.testing.assert_array_equal(extract_params(ckpt)["w"], np.ones((2,)))
    payload["ema_params"] = {"w": np.zeros((2,))}
    p = save_checkpoint(str(tmp_path / "c2.pkl"), payload)
    ckpt = load_checkpoint(p)
    np.testing.assert_array_equal(extract_params(ckpt)["w"], np.zeros((2,)))
    np.testing.assert_array_equal(
        extract_params(ckpt, prefer_ema=False)["w"], np.ones((2,)))
