"""Measured end-to-end NATIVE LDM training on the crack crops (VERDICT
r4 #6: the claimed beyond-reference training capability gets an on-chip
opt-steps/s figure and a calibrated-gate sample score).

Pipeline (arch "mid", ~1/10 of SD-v1, runner.ARCHS):
 1. first-stage VAE trained on the 1393 real crops @256px (fit_ae —
    recon L1 + tiny KL; the reference only ever LOADS a pretrained VAE,
    reference/stable_diffusion/util.py:28-103, which cannot exist in
    this zero-egress image) — measured steps/s + recon trajectory;
 2. latent UNet trained in THAT VAE's latent space (fit_ldm, CFG
    dropout 0.1, class-name prompts via the deterministic hash
    embedder) — measured opt-steps/s;
 3. 20 samples/class through the native txt2img path (DDIM-50, CFG) —
    gated with the same calibrated fid_proxy/KID machinery as the
    flagship (features vs the FULL real set; floor 0.083 / noise 258,
    QUALITY.json `sensitivity`). Results land in QUALITY.json under
    gates["ldm_mid_native"] and benchmarks/LDM_TRAIN.json.

Usage: python benchmarks/bench_ldm_train.py [--ae-epochs 8]
           [--ldm-epochs 40] [--img-size 256] [--n-per-class 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")

OUT = "benchmarks/LDM_TRAIN.json"
CKPT = "./output/ldm_native_mid.pkl"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae-epochs", type=int, default=8)
    ap.add_argument("--ae-batch", type=int, default=8)
    ap.add_argument("--ldm-epochs", type=int, default=40)
    ap.add_argument("--ldm-batch", type=int, default=16)
    ap.add_argument("--img-size", type=int, default=256)
    ap.add_argument("--n-per-class", type=int, default=20)
    ap.add_argument("--arch", default="mid")
    ap.add_argument("--skip-gate", action="store_true")
    ap.add_argument("--resume", action="store_true",
                    help="skip training if the native ckpt already exists")
    ap.add_argument("--max-images", type=int, default=0,
                    help="subset the dataset (smoke runs); gates against "
                         "the subset's own features and does NOT write "
                         "QUALITY.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.bench_quality import (
        ensure_crops,
        fid_from_feats,
        kid_x1000,
        real_features,
    )
    from diffusionmodel_tpu.data import CrackDataset
    from diffusionmodel_tpu.models.latent_diffusion.runner import LdmRunner
    from diffusionmodel_tpu.models.latent_diffusion.training import (
        fit_ae,
        fit_ldm,
    )
    from diffusionmodel_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    root = ensure_crops()
    ds = CrackDataset(root, img_size=args.img_size)
    n_classes = len(ds.classes)
    n_imgs = len(ds.labels)
    if args.max_images:
        n_imgs = min(n_imgs, args.max_images)
    images = np.stack([ds.load(i, augment=False)[0]
                       for i in range(n_imgs)])
    prompts = [f"a photo of a {ds.classes[ds.labels[i]]}"
               for i in range(n_imgs)]
    rec = {"arch": args.arch, "img_size": args.img_size,
           "n_images": int(n_imgs), "n_classes": n_classes}
    print(json.dumps({"stage": "data", **rec}), flush=True)

    runner = LdmRunner(arch=args.arch, use_flash=True, verbose=True,
                       sampler="ddim", steps=50, seed=0, use_clip=False)

    if args.resume and os.path.exists(CKPT):
        runner2 = LdmRunner(arch=args.arch, use_flash=True, verbose=True,
                            sampler="ddim", steps=50, seed=0,
                            use_clip=False, native_ckpt=CKPT)
        runner = runner2
    else:
        # ---- leg 1: first-stage VAE ---------------------------------
        t0 = time.time()
        ae_params, ae_hist = fit_ae(
            runner.ae, images, epochs=args.ae_epochs,
            batch_size=args.ae_batch, lr=1e-4, seed=0)
        ae_secs = time.time() - t0
        ae_steps = args.ae_epochs * (len(images) // args.ae_batch)
        runner.ae_params = jax.tree.map(jnp.asarray, ae_params)
        rec["ae"] = {
            "epochs": args.ae_epochs, "batch": args.ae_batch,
            "steps_per_sec": round(ae_steps / ae_secs, 2),
            "images_per_sec": round(
                ae_steps * args.ae_batch / ae_secs, 1),
            "seconds": round(ae_secs, 1),
            "rec_first": round(ae_hist[0]["rec"], 4),
            "rec_last": round(ae_hist[-1]["rec"], 4),
            "kl_last": round(ae_hist[-1]["kl"], 1),
        }
        print(json.dumps({"stage": "ae", **rec["ae"]}), flush=True)

        # ---- leg 2: latent UNet --------------------------------------
        t0 = time.time()
        _, hist = fit_ldm(
            runner, images, prompts, epochs=args.ldm_epochs,
            batch_size=args.ldm_batch, lr=1e-4, uncond_prob=0.1,
            remat=False, seed=0, out_path=CKPT)
        ldm_secs = time.time() - t0
        ldm_steps = args.ldm_epochs * (len(images) // args.ldm_batch)
        rec["ldm"] = {
            "epochs": args.ldm_epochs, "batch": args.ldm_batch,
            "opt_steps_per_sec": round(ldm_steps / ldm_secs, 2),
            "images_per_sec": round(
                ldm_steps * args.ldm_batch / ldm_secs, 1),
            "seconds": round(ldm_secs, 1),
            "loss_first": round(hist[0], 4),
            "loss_last": round(hist[-1], 4),
            "ckpt": CKPT,
        }
        print(json.dumps({"stage": "ldm", **rec["ldm"]}), flush=True)
        # reload from the saved ckpt: fit_ldm's donated train step
        # consumed the runner's live param buffers, and sampling must use
        # the TRAINED UNet + its paired VAE anyway
        runner = LdmRunner(arch=args.arch, use_flash=True, verbose=True,
                           sampler="ddim", steps=50, seed=0,
                           use_clip=False, native_ckpt=CKPT)

    # ---- leg 3: sample + calibrated gate ------------------------------
    if not args.skip_gate:
        from diffusionmodel_tpu.metrics import ImageMetrics

        metrics = ImageMetrics()
        if args.max_images:  # smoke: gate vs the subset's own features
            sub = images if args.img_size == 256 else np.asarray(
                jax.image.resize(jnp.asarray(images),
                                 (len(images), 256, 256, 3), "bilinear"))
            rf_all = metrics.extract_features(sub.astype(np.float32))
        else:
            gate_ds = ds if args.img_size == 256 else CrackDataset(
                root, img_size=256)
            rf_all, _ = real_features(metrics, gate_ds, np)
        t0 = time.time()
        gens = []
        for c, cls in enumerate(ds.classes):
            out = runner.txt2img(f"a photo of a {cls}",
                                 batch_size=args.n_per_class,
                                 h=args.img_size, w=args.img_size,
                                 uncond_scale=5.0,
                                 key=jax.random.PRNGKey(1000 + c))
            gens.append(np.asarray(out))
        gen = np.clip(np.concatenate(gens), -1, 1).astype(np.float32)
        gen_secs = time.time() - t0
        if gen.shape[1] != 256:
            g = jnp.asarray(gen)
            gen = np.asarray(jax.image.resize(
                g, (g.shape[0], 256, 256, 3), "bilinear"))
        gf = metrics.extract_features(gen)
        fid = round(fid_from_feats(rf_all, gf, np), 4)
        kid, kid_std = kid_x1000(rf_all, gf)
        rec["gate"] = {
            "n_gen": int(gen.shape[0]),
            "sampler": "ddim50", "uncond_scale": 5.0,
            "fid_proxy_vs_full_real": fid,
            "kid_proxy_x1000": kid, "kid_proxy_x1000_std": kid_std,
            "gen_seconds": round(gen_secs, 1),
        }
        print(json.dumps({"stage": "gate", **rec["gate"]}), flush=True)

        # grid artifact + QUALITY.json entry
        try:
            from diffusionmodel_tpu.utils.grid import save_samples

            os.makedirs("./output/ldm_mid_samples", exist_ok=True)
            save_samples(gen[: 5 * min(args.n_per_class, 8)],
                         "./output/ldm_mid_samples/grid.png",
                         nrow=min(args.n_per_class, 8))
        except Exception as e:
            print(json.dumps({"grid_error": str(e)[:120]}), flush=True)
        qpath = "benchmarks/QUALITY.json"
        try:
            if args.max_images:
                raise RuntimeError("smoke run: QUALITY.json not written")
            with open(qpath) as f:
                doc = json.load(f)
            doc.setdefault("gates", {})["ldm_mid_native"] = {
                "ckpt": CKPT, "arch": args.arch,
                "pipeline": "native VAE + native latent UNet "
                            "(bench_ldm_train.py)",
                "ddim50_w5.0": rec["gate"],
            }
            with open(qpath, "w") as f:
                json.dump(doc, f, indent=2)
        except Exception as e:
            print(json.dumps({"quality_json_error": str(e)[:120]}),
                  flush=True)

    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
    print(json.dumps({"wrote": OUT}), flush=True)


if __name__ == "__main__":
    main()
