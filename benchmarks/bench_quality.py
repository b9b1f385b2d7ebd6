"""Quality gate: DDIM-50 vs ancestral-700 on the SAME trained checkpoint
(VERDICT r1 item 3: back the claimed DDIM speedup with a quality number).

End-to-end on real TPU: crop RDD2022 (DatasetNinja layout shipped with the
reference) -> short flagship training run -> sample the SAME classes/seed
through both samplers -> FID(-proxy)/SSIM/PSNR vs real crops + timing.
Writes benchmarks/QUALITY.json and prints one JSON line per result.

Usage: python benchmarks/bench_quality.py [--epochs N] [--skip-train]
(--skip-train reuses ./output/bench_quality/best_model from a prior run.)
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
    # cropper emits the reference crop_pic layout (class dirs at top level,
    # crop_pic.py:47-60); CrackDataset consumes root/images/<class>/.
    img_root = os.path.join(CROP_DIR, "images")
    os.makedirs(img_root, exist_ok=True)
    for name in cropper.class_map:
        d = cropper._class_dir(name)
        shutil.move(d, os.path.join(img_root, os.path.basename(d)))
    print(json.dumps({"stage": "crop", "objects": n,
                      "classes": list(cropper.class_map)}), flush=True)
    return CROP_DIR


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--n-per-class", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.data import CrackDataset
    from diffusionmodel_tpu.diffusion import Schedule
    from diffusionmodel_tpu.metrics import ImageMetrics
    from diffusionmodel_tpu.nn import build_model
    from diffusionmodel_tpu.trainer import make_sampler
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    root = ensure_crops()

    cfg = preset("full", **{
        "model.dtype": "bfloat16",
        "train.batch_size": 1, "train.accum_steps": 4,
        "train.n_epoch": args.epochs,
        "train.eval_sample_count": 0,   # no in-loop sampling
        "train.min_save_ep": 0, "train.save_freq": 10_000,
        "train.patience": 10_000,
        "train.save_dir": OUT_DIR,
    })
    cfg = cfg.replace(data_root=root)

    ckpt = os.path.join(OUT_DIR, "best_model")
    if not args.skip_train or not os.path.exists(ckpt):
        from diffusionmodel_tpu.trainer import fit

        t0 = time.time()
        resume = ckpt if os.path.exists(ckpt) else None
        state = fit(cfg, verbose=True, resume=resume)
        print(json.dumps({"stage": "train", "epochs": args.epochs,
                          "seconds": round(time.time() - t0, 1)}), flush=True)
        params = jax.device_get(state.params)
    else:
        from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint

        params = extract_params(load_checkpoint(ckpt))

    dataset = CrackDataset(root, img_size=256)
    n_classes = len(dataset.classes)
    import dataclasses as _dc

    cfg = cfg.replace(model=_dc.replace(cfg.model, n_classes=n_classes))
    model = build_model(cfg.model, cfg.diffusion.high_thresh)
    sched = Schedule.create(cfg.diffusion.beta1, cfg.diffusion.beta2,
                            cfg.diffusion.n_T)

    n_per = args.n_per_class
    n_sample = n_per * n_classes
    classes = jnp.asarray(np.repeat(np.arange(n_classes), n_per), jnp.int32)

    # real images: n_per per class, in dataset (normalized [-1,1]) order
    real = []
    for c in range(n_classes):
        idxs = [i for i, l in enumerate(dataset.labels) if l == c][:n_per]
        for i in idxs:
            real.append(dataset.load(i, augment=False)[0])
    real = np.stack(real)

    metrics = ImageMetrics()
    key = jax.random.PRNGKey(123)
    w = jnp.float32(4.0)  # BASELINE's guidance 4.0 target
    results = {}
    for name, scfg in (
        ("ancestral_700", cfg),
        ("ddim_50", cfg.replace(sample=_dc.replace(
            cfg.sample, sampler="ddim", ddim_steps=50))),
    ):
        sampler = make_sampler(model, scfg, sched, False, n_sample,
                               classes=classes, chunk=50)
        t0 = time.time()
        gen = np.asarray(sampler(params, {}, key, w))
        secs = time.time() - t0
        qm = metrics.evaluate_batch(real[: len(gen)], gen)
        qm = {k: (round(float(v), 4) if isinstance(v, (int, float)) else v)
              for k, v in qm.items()}
        qm.update(seconds=round(secs, 1),
                  images_per_min=round(n_sample * 60 / secs, 2))
        results[name] = qm
        print(json.dumps({"stage": name, **qm}), flush=True)

    out = {
        "config": "flagship 353M @256px, guidance 4.0, matched seed/classes",
        "n_sample": n_sample, "n_classes": n_classes,
        "epochs_trained": args.epochs,
        "results": results,
    }
    with open("benchmarks/QUALITY.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"stage": "done", "written": "benchmarks/QUALITY.json"}))


if __name__ == "__main__":
    main()
