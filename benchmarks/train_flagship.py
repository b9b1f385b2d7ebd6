"""Long flagship training run (VERDICT r2 item 1: the rebuild had only
ever trained 60 of the reference's 400 epochs — run the existing
checkpoint forward to >=200 epochs on the real RDD2022 crops).

Resumes ./output/bench_quality/ckpt_ep59 (or --resume PATH) and trains to
--epochs (default 200) at the measured-fastest operating point
(benchmarks/PROBE_MFU.json: micro-batch 1 x accum 4, remat OFF, bf16
compute + bf16 Adam mu — 3.12 opt-steps/s vs 2.6 for the round-2 remat
default). Checkpoints land at epochs 119/179/199 (save_freq 60 + final),
giving the 120/200 quality-gate points.

Early stopping: the reference's patience-10/min_delta-1e-3 EarlyStop
(new_scripy.py:587-620) is implemented and tested (train.EarlyStop), but
at this loss scale (val ~0.013, per-epoch deltas ~1e-4) min_delta=1e-3
would stop within 10 epochs of any resume — defeating the point of the
run. patience is set high so the full schedule executes; the gate judges
quality, not the val plateau.

Usage: python benchmarks/train_flagship.py [--epochs 200] [--resume PATH]

Anneal leg (round 3): the reference SGDR schedule restarts at epoch 150
(cycles 10/30/70/150/310), so checkpoints at 180/199 sample at LR~0.9e-4
mid-cycle and gate far worse than epoch 120 (QUALITY.json). To finish the
run at a converged point without simulating the full 310-epoch cycle,
resume ckpt_ep199 with a constant LR at the schedule's own eta_min:

  python benchmarks/train_flagship.py --epochs 240 \
      --resume ./output/bench_quality/ckpt_ep199 \
      --lr 3e-5 --lr-schedule none --save-freq 40

Round-3b fresh-start recipe (machine reset wiped output/): train 0->150
so the SGDR leg ENDS at the cycle boundary (restarts at 10/30/70/150 —
epoch 149 samples at LR~eta_min, unlike the round-3 checkpoints at
179/199 that sampled mid-cycle), with --ema-decay 0.9995 so gates sample
the EMA shadow (all checkpoint consumers prefer_ema); then a 40-epoch
constant-eta_min anneal leg to 190:

  python benchmarks/train_flagship.py --epochs 150 --ema-decay 0.9995
  python benchmarks/train_flagship.py --epochs 190 \
      --resume ./output/bench_quality/ckpt_ep149 \
      --lr 3e-5 --lr-schedule none --save-freq 40 --ema-decay 0.9995
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT_DIR = "./output/bench_quality"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--resume", default=os.path.join(OUT_DIR, "ckpt_ep59"))
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--lr-schedule", default=None,
                    help="override train.lr_schedule (e.g. 'none' for the anneal leg)")
    ap.add_argument("--save-freq", type=int, default=60)
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="maintain an EMA shadow of the params "
                         "(checkpoint consumers prefer it for sampling)")
    ap.add_argument("--best-min-epochs", type=int, default=10,
                    help="rate-limit the best-state device fetch (each "
                         "fetch stalls ~2-7 min on this tunneled host); "
                         "set very large for legs whose artifact of "
                         "record is the final checkpoint")
    ap.add_argument("--co-flip-mask", action="store_true",
                    help="Q5 A/B (VERDICT r3 #3): RandomHorizontalFlip "
                         "co-flips the attention mask with the image "
                         "(the reference flips the image only, "
                         "new_scripy.py:683-688)")
    ap.add_argument("--out-dir", default=OUT_DIR,
                    help="checkpoint directory (A/B legs use distinct "
                         "dirs so baselines are never overwritten)")
    args = ap.parse_args()

    from benchmarks.bench_quality import ensure_crops
    from diffusionmodel_tpu.config import preset
    from diffusionmodel_tpu.trainer import fit

    root = ensure_crops()
    overrides = {
        "model.dtype": "bfloat16",
        # exact bilinear-up2+conv fusion (same math up to summation
        # order, parameter-compatible): +4.2% steps/s (PROBE_MFU mb1r0f).
        # Legs before round 5 ran unfused (3.32 sustained at 75 epochs).
        "model.fused_upsample": True,
        "train.batch_size": 1, "train.accum_steps": 4,
        "train.remat": False,            # fits with bf16 mu; +20% steps/s
        "train.n_epoch": args.epochs,
        "train.eval_sample_count": 0,    # gates run out-of-loop
        "train.min_save_ep": 0, "train.save_freq": args.save_freq,
        "train.patience": 10_000,
        "train.save_dir": args.out_dir,
        "train.ema_decay": args.ema_decay,
        "train.co_flip_mask": args.co_flip_mask,
        # tunneled-device fetch costs ~1 min; early epochs improve every
        # epoch, so rate-limit the best-state snapshot (bookkeeping stays
        # exact per-epoch)
        "train.best_snapshot_min_epochs": args.best_min_epochs,
    }
    if args.lr is not None:
        overrides["train.lr"] = args.lr
    if args.lr_schedule is not None:
        overrides["train.lr_schedule"] = args.lr_schedule
    cfg = preset("full", **overrides)
    cfg = cfg.replace(data_root=root)

    t0 = time.time()
    fit(cfg, verbose=True,
        resume=args.resume if os.path.exists(args.resume) else None)
    print(json.dumps({
        "stage": "train_flagship", "epochs": args.epochs,
        "resumed_from": args.resume,
        "seconds": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
