"""Quality gate for the flagship: >=100 generated images per guidance
scale, evaluated against Inception-topology proxy features of the FULL
real crop set (VERDICT r2 item 1 — replaces the statistically
underpowered 20-vs-20 gate whose fid_proxy contradicted SSIM/PSNR).

Per checkpoint (epoch label):
- DDIM-50 generation of ``--n-per-class`` images/class (default 20 =>
  100 images at 5 classes) for each guidance scale, in sampler-sized
  chunks (the 16 GB chip caps the CFG-doubled batch);
- fid_proxy vs the cached features of ALL real crops (1393) — the
  extractor is the block-validated InceptionV3 trunk with deterministic
  He-scaled random weights (metrics/image_metrics._default_feature_fn);
- reference-formula SSIM/PSNR over class-matched real/gen pairs;
- a sample grid per scale;
- optionally (--ancestral-n > 0) the ancestral-700 sampler for the
  DDIM-vs-ancestral comparison.

A one-off sensitivity line (fid_proxy of real-vs-noise and
real-vs-real-holdout) calibrates the metric's scale: training quality
claims mean something only if noise sits far above the holdout floor.

Results merge into benchmarks/QUALITY.json under ``gates[label]`` so
successive checkpoints (60/120/200 epochs) build the trajectory.

Usage:
  python benchmarks/bench_quality.py --ckpt output/flagship/ckpt_ep119 \
      --label 120 [--scales 2.0 4.0] [--n-per-class 20] [--ancestral-n 0]
  python benchmarks/bench_quality.py --train-epochs 12   # legacy: train first

Reference counterpart: new_scripy.py:945-1108 (gen_samples + quality eval
vs real images) at the 400-epoch training depth of new_scripy.py:659-943.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

REF_DATA = "/root/reference/road-damage-detector-DatasetNinja/train"
CROP_DIR = "./data/bench_crops"
OUT_DIR = "./output/bench_quality"
REAL_FEATS = "./output/real_feats_inception_proxy.npz"


def ensure_crops() -> str:
    import shutil

    from diffusionmodel_tpu.data.crop_tool import (
        DatasetCropper,
        parse_datasetninja_dir,
    )

    if os.path.isdir(os.path.join(CROP_DIR, "images")):
        return CROP_DIR
    samples = parse_datasetninja_dir(os.path.join(REF_DATA, "img"),
                                     os.path.join(REF_DATA, "ann"))
    cropper = DatasetCropper(samples, CROP_DIR, 512)
    n = cropper.process_all(verbose=False)
    img_root = os.path.join(CROP_DIR, "images")
    os.makedirs(img_root, exist_ok=True)
    for name in cropper.class_map:
        d = cropper._class_dir(name)
        shutil.move(d, os.path.join(img_root, os.path.basename(d)))
    print(json.dumps({"stage": "crop", "objects": n,
                      "classes": list(cropper.class_map)}), flush=True)
    return CROP_DIR


def real_features(metrics, dataset, np):
    """Features of the FULL real set, cached on disk (the extractor is
    deterministic, so the cache is valid across runs)."""
    if os.path.exists(REAL_FEATS):
        d = np.load(REAL_FEATS)
        if d["n"] == len(dataset.labels):
            return d["feats"], d["labels"]
    t0 = time.time()
    imgs, labels = [], []
    for i in range(len(dataset.labels)):
        x, c, _ = dataset.load(i, augment=False)
        imgs.append(x)
        labels.append(c)
    feats = metrics.extract_features(np.stack(imgs))
    labels = np.asarray(labels)
    os.makedirs(os.path.dirname(REAL_FEATS), exist_ok=True)
    np.savez(REAL_FEATS, feats=feats, labels=labels, n=len(labels))
    print(json.dumps({"stage": "real_feats", "n": int(len(labels)),
                      "seconds": round(time.time() - t0, 1)}), flush=True)
    return feats, labels


def fid_from_feats(rf, gf, np):
    from diffusionmodel_tpu.metrics.image_metrics import frechet_distance

    rf = rf.astype(np.float64)
    gf = gf.astype(np.float64)
    return frechet_distance(rf.mean(0), np.cov(rf, rowvar=False),
                            gf.mean(0), np.cov(gf, rowvar=False))


def kid_x1000(rf, gf):
    """KID (x1000, the conventional scale) on the same proxy features.
    Unbiased at n=100 gen images, unlike FID's covariance estimate."""
    from diffusionmodel_tpu.metrics.image_metrics import kid_from_feats

    mean, std = kid_from_feats(rf, gf)
    return round(mean * 1000, 4), round(std * 1000, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(OUT_DIR, "best_model"))
    ap.add_argument("--label", default=None,
                    help="epoch label for QUALITY.json (e.g. 60/120/200)")
    ap.add_argument("--scales", type=float, nargs="+", default=[2.0, 4.0])
    ap.add_argument("--n-per-class", type=int, default=20)
    ap.add_argument("--chunk-per-class", type=int, default=5,
                    help="samples per class per sampler call (HBM cap)")
    ap.add_argument("--ancestral-n", type=int, default=0,
                    help="also run ancestral-700 on this many images")
    ap.add_argument("--train-epochs", type=int, default=0,
                    help="legacy: train this many epochs first")
    ap.add_argument("--raw-params", action="store_true",
                    help="gate the LIVE params even when the checkpoint "
                         "carries an EMA shadow (for EMA-vs-raw A/B)")
    ap.add_argument("--fast-sampler", default="ddim",
                    choices=["ddim", "dpmpp"],
                    help="which fast sampler the gate uses (dpmpp = "
                         "DPM-Solver++(2M), the round-3 throughput "
                         "sampler — entry keys become dpmppN_w*)")
    ap.add_argument("--fast-steps", type=int, default=None,
                    help="network evaluations for the fast sampler "
                         "(default: 50 for ddim, 20 for dpmpp)")
    ap.add_argument("--cfg-fixed-orientation", action="store_true",
                    help="Q1 A/B: sample with the CORRECTED guidance "
                         "orientation instead of the reference's as-written "
                         "(1+w)*uncond - w*cond arithmetic "
                         "(new_scripy.py:450-470; PARITY.md Q1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint
    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.data import CrackDataset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.metrics import ImageMetrics
    from diffusionmodel_tpu.metrics.image_metrics import calc_psnr, calc_ssim
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.trainer import make_sampler
    from diffusionmodel_tpu.utils import enable_compilation_cache
    from diffusionmodel_tpu.utils.grid import save_samples
    from diffusionmodel_tpu.utils.transfer import fetch_tree

    enable_compilation_cache()
    # gate grids/QUALITY artifacts land in OUT_DIR even when the gated
    # checkpoint lives elsewhere (A/B legs) — a host wipe must not crash
    # the gate at its first PNG save (round-5 leg B lost a sampled scale
    # to exactly that)
    os.makedirs(OUT_DIR, exist_ok=True)
    root = ensure_crops()

    cfg = preset("full", **{
        "model.dtype": "bfloat16",
        "train.save_dir": OUT_DIR,
    })
    cfg = cfg.replace(data_root=root)

    if args.train_epochs:
        from diffusionmodel_tpu.trainer import fit

        tcfg = cfg.replace(train=__import__("dataclasses").replace(
            cfg.train, batch_size=1, accum_steps=4,
            n_epoch=args.train_epochs, eval_sample_count=0, min_save_ep=0,
            save_freq=10_000, patience=10_000))
        resume = args.ckpt if os.path.exists(args.ckpt) else None
        t0 = time.time()
        fit(tcfg, verbose=True, resume=resume)
        print(json.dumps({"stage": "train", "epochs": args.train_epochs,
                          "seconds": round(time.time() - t0, 1)}), flush=True)
        args.ckpt = os.path.join(OUT_DIR, "best_model")

    params = extract_params(load_checkpoint(args.ckpt),
                            prefer_ema=not args.raw_params)

    dataset = CrackDataset(root, img_size=256)
    n_classes = len(dataset.classes)
    import dataclasses as _dc

    cfg = cfg.replace(model=_dc.replace(cfg.model, n_classes=n_classes))
    if args.cfg_fixed_orientation:
        cfg = cfg.replace(diffusion=_dc.replace(
            cfg.diffusion, cfg_fixed_orientation=True))
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)

    metrics = ImageMetrics()
    rf_all, r_labels = real_features(metrics, dataset, np)

    # class-matched real pairing set for SSIM/PSNR (+ sensitivity images)
    n_per = args.n_per_class
    real_imgs, real_cls = [], []
    for c in range(n_classes):
        idxs = [i for i, l in enumerate(dataset.labels) if l == c][:n_per]
        for i in idxs:
            real_imgs.append(dataset.load(i, augment=False)[0])
            real_cls.append(c)
    real_imgs = np.stack(real_imgs)

    label = args.label or "adhoc"
    qpath = "benchmarks/QUALITY.json"
    doc = {}
    if os.path.exists(qpath):
        with open(qpath) as f:
            doc = json.load(f)
    if "results" in doc:  # round-2 schema (20v20 gate): keep, demoted
        doc = {"round2_20v20": doc}
    doc.setdefault("config",
                   "flagship 353M @256px, DDIM-50 (+optional ancestral-700), "
                   "fid_proxy = InceptionV3-topology random-He features vs "
                   "the FULL real crop set")
    doc.setdefault("n_real", int(len(r_labels)))
    gates = doc.setdefault("gates", {})

    # one-off metric calibration: holdout floor vs noise ceiling
    # (kid_proxy added round 3: re-runs just the KID part on old docs)
    if "sensitivity" not in doc or \
            "kid_proxy_x1000_real_halves" not in doc["sensitivity"]:
        rng = np.random.RandomState(0)
        perm = rng.permutation(len(rf_all))
        half_a, half_b = perm[: len(perm) // 2], perm[len(perm) // 2:]
        noise = rng.randn(100, 256, 256, 3).astype(np.float32)
        nf = metrics.extract_features(np.clip(noise, -1, 1))
        sens = doc.setdefault("sensitivity", {})
        if "fid_proxy_real_halves" not in sens:
            sens["fid_proxy_real_halves"] = round(
                fid_from_feats(rf_all[half_a], rf_all[half_b], np), 4)
            sens["fid_proxy_real_vs_noise"] = round(
                fid_from_feats(rf_all, nf, np), 4)
        kh, _ = kid_x1000(rf_all[half_a], rf_all[half_b])
        kn, _ = kid_x1000(rf_all, nf)
        sens["kid_proxy_x1000_real_halves"] = kh
        sens["kid_proxy_x1000_real_vs_noise"] = kn
        print(json.dumps({"stage": "sensitivity", **sens}),
              flush=True)

    chunk_pc = args.chunk_per_class
    n_chunk = chunk_pc * n_classes
    classes = jnp.asarray(np.repeat(np.arange(n_classes), chunk_pc),
                          jnp.int32)
    fast_steps = args.fast_steps or (20 if args.fast_sampler == "dpmpp"
                                     else 50)
    dcfg = cfg.replace(sample=_dc.replace(
        cfg.sample, sampler=args.fast_sampler, ddim_steps=fast_steps,
        dpm_steps=fast_steps))
    fast_key = f"{args.fast_sampler}{fast_steps}"
    sampler = make_sampler(model, dcfg, sched, False, n_chunk,
                           classes=classes, chunk=50)

    entry = gates.setdefault(str(label), {})
    entry["ckpt"] = args.ckpt
    entry["params"] = "raw" if args.raw_params else "ema_when_present"
    entry["cfg_orientation"] = ("fixed" if args.cfg_fixed_orientation
                                else "as_written")
    rounds = -(-n_per // chunk_pc)  # ceil: never silently under-generate
    for w in args.scales:
        t0 = time.time()
        gens = []
        for r in range(rounds):
            key = jax.random.PRNGKey(123 + 1000 * r)
            # chunked fetch: a generated chunk is tens of MB, which hits
            # the tunneled platform's slow single-array path
            gens.append(fetch_tree(
                sampler(params, {}, key, jnp.float32(w))))
        gen = np.concatenate(gens)  # grouped per chunk: class-major inside
        secs = time.time() - t0
        # reorder to class-major overall, trim each class block to
        # exactly n_per (rounds * chunk_pc may exceed it)
        cls = np.tile(np.repeat(np.arange(n_classes), chunk_pc), rounds)
        order = np.argsort(cls, kind="stable")
        gen = gen[order]
        per_block = chunk_pc * rounds
        gen = np.concatenate([
            gen[c * per_block:c * per_block + n_per]
            for c in range(n_classes)])
        gen_cls = np.repeat(np.arange(n_classes), n_per)
        gf = metrics.extract_features(gen)
        # SSIM/PSNR over CLASS-ALIGNED pairs only (a class with fewer
        # than n_per real crops pairs just its available count — never
        # crossing class boundaries)
        pairs = []
        rc_arr = np.asarray(real_cls)
        for c in range(n_classes):
            rc = real_imgs[rc_arr == c]
            gc = gen[gen_cls == c]
            m = min(len(rc), len(gc))
            pairs.extend(zip(rc[:m], gc[:m]))
        ssim = float(np.mean([calc_ssim(r_, g_) for r_, g_ in pairs]))
        psnr = float(np.mean([calc_psnr(r_, g_) for r_, g_ in pairs]))
        kid_mean, kid_std = kid_x1000(rf_all, gf)
        rec = {
            "n_gen": int(len(gen)),
            "fid_proxy_vs_full_real": round(fid_from_feats(rf_all, gf, np), 4),
            "kid_proxy_x1000": kid_mean, "kid_proxy_x1000_std": kid_std,
            "ssim": round(ssim, 4), "psnr": round(psnr, 4),
            "seconds": round(secs, 1),
            "images_per_min": round(len(gen) * 60 / secs, 2),
        }
        entry[f"{fast_key}_w{w}"] = rec
        save_samples(gen, os.path.join(
            OUT_DIR, f"gate_ep{label}_{fast_key}_w{w}.png"),
            nrow=n_per, denorm=True)
        print(json.dumps({"stage": f"{fast_key}_w{w}", "label": label,
                          **rec}), flush=True)
        with open(qpath, "w") as f:
            json.dump(doc, f, indent=2)

    if args.ancestral_n:
        acls = jnp.asarray(
            np.repeat(np.arange(n_classes),
                      max(1, args.ancestral_n // n_classes)), jnp.int32)
        asampler = make_sampler(model, cfg, sched, False, int(acls.shape[0]),
                                classes=acls, chunk=50)
        t0 = time.time()
        gen = fetch_tree(asampler(params, {}, jax.random.PRNGKey(123),
                                  jnp.float32(4.0)))
        secs = time.time() - t0
        gf = metrics.extract_features(gen)
        kid_mean, kid_std = kid_x1000(rf_all, gf)
        rec = {
            "n_gen": int(len(gen)),
            "fid_proxy_vs_full_real": round(fid_from_feats(rf_all, gf, np), 4),
            "kid_proxy_x1000": kid_mean, "kid_proxy_x1000_std": kid_std,
            "seconds": round(secs, 1),
            "images_per_min": round(len(gen) * 60 / secs, 2),
        }
        entry["ancestral700_w4.0"] = rec
        save_samples(gen, os.path.join(OUT_DIR, f"gate_ep{label}_anc.png"),
                     nrow=8, denorm=True)
        print(json.dumps({"stage": "ancestral700", "label": label, **rec}),
              flush=True)

    with open(qpath, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"stage": "done", "written": qpath, "label": label}))


if __name__ == "__main__":
    main()
