"""CLI — public parity with new_scripy.py:1292-1321.

    python -m diffusionmodel_tpu.cli --mode train
    python -m diffusionmodel_tpu.cli --mode generate --ckpt PATH \
        --guide_scales 2.0 4.0 --samples 3 [--no_eval]

Actual reference flag spellings (--ckpt/--guide_scales/--samples) are
primary; the BASELINE.json names (--checkpoint/--guidance_scales/
--samples_per_class) are accepted as aliases. Extras beyond the reference:
--preset, --data_root, --epochs, --resume, --img_size, nested -o overrides.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native enhanced diffusion model training/generation")
    p.add_argument("--mode", type=str, default="train",
                   choices=["train", "generate", "crop", "serve", "eval",
                            "visualize",
                            "txt2img", "img2img", "inpaint", "train_ldm"],
                   help="train, generate, crop (offline dataset build), "
                        "serve (HTTP generation service), eval (offline "
                        "folder-vs-folder quality metrics), visualize "
                        "(dataset/mask inspection sheet, "
                        "test_DroneDataset.py:8-94), or the "
                        "latent-diffusion pipelines (txt2img/img2img/"
                        "inpaint, reference/stable_diffusion/scripts/*)")
    p.add_argument("--ckpt", "--checkpoint", dest="ckpt", type=str,
                   default=None, help="Checkpoint path for generation mode")
    p.add_argument("--guide_scales", "--guidance_scales", dest="guide_scales",
                   type=float, nargs="+", default=None,
                   help="Guidance scales for generation")
    p.add_argument("--samples", "--samples_per_class", dest="samples",
                   type=int, default=None, help="Samples per class")
    p.add_argument("--no_eval", action="store_true",
                   help="Skip image quality evaluation")
    p.add_argument("--inception_weights", type=str, default=None,
                   help="torchvision inception_v3 state dict (.pt/.pth/.npz) "
                        "for real Inception FID; without it the in-loop "
                        "metric is reported as fid_proxy")
    p.add_argument("--sampler", type=str, default=None,
                   choices=["ancestral", "ddim", "dpmpp"],
                   help="ancestral (reference full-T), ddim (fast), or "
                        "dpmpp (DPM-Solver++(2M), fastest)")
    p.add_argument("--steps", type=int, default=None,
                   help="DDIM sampling steps")
    p.add_argument("--preset", type=str, default="full",
                   choices=["full", "old", "mnist", "custom", "labml",
                            "generation"])
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="Checkpoint to resume training from")
    p.add_argument("-o", "--override", action="append", default=[],
                   metavar="KEY=VALUE",
                   help="Nested config override, e.g. -o model.n_feat=96")
    # crop mode
    p.add_argument("--img_dir", type=str, default=None)
    p.add_argument("--anno_dir", type=str, default=None)
    p.add_argument("--anno_format", type=str, default="voc",
                   choices=["voc", "datasetninja"])
    p.add_argument("--crop_out", type=str, default="./data/cropped_images1")
    p.add_argument("--crop_size", type=int, default=512)
    # eval mode (offline folder-vs-folder quality metrics)
    p.add_argument("--real_dir", type=str, default=None,
                   help="eval mode: directory of real images (flat or "
                        "one subdirectory per class)")
    p.add_argument("--gen_dir", type=str, default=None,
                   help="eval mode: directory of generated images")
    p.add_argument("--eval_out", type=str,
                   default="./output/eval_metrics.json",
                   help="eval mode: metrics JSON path (quality_metrics"
                        ".json analogue, new_scripy.py:1082-1099)")
    p.add_argument("--img_size", type=int, default=256,
                   help="eval mode: common image size for SSIM/PSNR")
    # visualize mode (test_DroneDataset.py capability)
    p.add_argument("--viz_out", type=str, default="dataset_visualization.png",
                   help="visualize mode: output sheet path (reference "
                        "filename, test_DroneDataset.py:92)")
    # serve mode
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8,
                   help="serve mode: fixed sampler batch (slot) size")
    # LDM modes (txt2img/img2img/inpaint) — flag parity with
    # reference/stable_diffusion/scripts/text_to_image.py:104-130 etc.
    p.add_argument("--prompt", type=str,
                   default="a painting of a virus monster playing guitar",
                   help="LDM modes: the text prompt (reference default)")
    p.add_argument("--orig_img", "--orig-img", dest="orig_img", type=str,
                   default=None, help="img2img/inpaint: input image file")
    p.add_argument("--batch_size", type=int, default=1,
                   help="LDM modes: images per prompt")
    p.add_argument("--scale", type=float, default=None,
                   help="LDM unconditional guidance scale (default 7.5 "
                        "txt2img / 5.0 img2img+inpaint)")
    p.add_argument("--strength", type=float, default=0.75,
                   help="img2img/inpaint: noising strength")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--flash", dest="flash", action="store_true",
                   default=True, help="use the Pallas flash-attention "
                   "kernel (default ON; measured 1.5-1.6x at 512px)")
    p.add_argument("--no_flash", dest="flash", action="store_false")
    p.add_argument("--ldm_arch", type=str, default="sd",
                   choices=["sd", "tiny", "mid"],
                   help="sd = SD-v1 scale (860M); tiny = smoke-test size; "
                        "mid = on-chip trainable (~1/10 of sd)")
    p.add_argument("--family", type=str, default="ldm",
                   choices=["ldm", "main"],
                   help="img2img/inpaint: which model family edits the "
                        "image — ldm (reference scripts' latent pipelines) "
                        "or main (a trained flagship checkpoint via "
                        "diffusion.sample_cfg_edit; requires --ckpt)")
    p.add_argument("--class_id", type=int, default=0,
                   help="main-family img2img/inpaint: conditioning class")
    p.add_argument("--mask_img", type=str, default=None,
                   help="inpaint: grayscale mask file, luminance > 0.5 = "
                        "PRESERVE the original pixel (default: preserve "
                        "the bottom half, in_paint.py:80-84)")
    p.add_argument("--ldm_sampler", type=str, default="ddim",
                   choices=["ddim", "ddpm", "dpmpp"],
                   help="txt2img sampler; dpmpp = DPM-Solver++(2M), "
                        "DDIM-50-class quality in ~25 steps (img2img/"
                        "inpaint use DDIM: they need q_sample/paint)")
    p.add_argument("--out_dir", type=str, default="./output/ldm/")
    # train_ldm mode (beyond-reference: the SD subtree is inference-only)
    p.add_argument("--ldm_native", type=str, default=None,
                   help="LDM modes: load a --mode train_ldm checkpoint "
                        "({arch, unet, ae} pickle); train_ldm: where to "
                        "write it (default OUT_DIR/ldm_native.pkl)")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="train_ldm: Adam learning rate")
    p.add_argument("--uncond_prob", type=float, default=0.1,
                   help="train_ldm: CFG conditioning-dropout probability")
    p.add_argument("--prompt_template", type=str, default="a photo of a {}",
                   help="train_ldm: per-image prompt from its class "
                        "subdirectory name ('{}' slot); flat folders use "
                        "--prompt for every image")
    p.add_argument("--remat", action="store_true",
                   help="train_ldm: rematerialize the UNet backward "
                        "(fits SD-scale training in 16 GB)")
    p.add_argument("--train_ae_epochs", type=int, default=0,
                   help="train_ldm: first train the first-stage VAE on "
                        "the same images for this many epochs (recon L1 "
                        "+ tiny KL) before the latent UNet — the native "
                        "path to a usable decoder when no pretrained SD "
                        "VAE exists (zero-egress environments)")
    return p


def _parse_value(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from diffusionmodel_tpu.config import preset

    overrides = {}
    for item in args.override:
        k, _, v = item.partition("=")
        overrides[k] = _parse_value(v)
    cfg = preset(args.preset, **overrides)
    if args.data_root:
        cfg = cfg.replace(data_root=args.data_root)
    if args.save_dir:
        import dataclasses as _dc

        cfg = cfg.replace(train=_dc.replace(cfg.train, save_dir=args.save_dir))
    if args.epochs is not None:
        import dataclasses as _dc

        cfg = cfg.replace(train=_dc.replace(cfg.train, n_epoch=args.epochs))
    if args.seed is not None:
        import dataclasses as _dc

        cfg = cfg.replace(train=_dc.replace(cfg.train, seed=args.seed))
    if args.sampler or args.steps:
        import dataclasses as _dc

        sc = cfg.sample
        if args.sampler:
            sc = _dc.replace(sc, sampler=args.sampler)
        if args.steps:
            # --steps targets whichever fast sampler is active
            if (args.sampler or sc.sampler) == "dpmpp":
                sc = _dc.replace(sc, dpm_steps=args.steps)
            else:
                sc = _dc.replace(sc, ddim_steps=args.steps)
        cfg = cfg.replace(sample=sc)

    metrics_impl = None
    if args.inception_weights:
        from diffusionmodel_tpu.metrics import ImageMetrics

        metrics_impl = ImageMetrics(inception_weights=args.inception_weights)

    if args.mode == "train":
        from diffusionmodel_tpu.trainer import fit

        dataset = None
        if args.preset == "mnist":
            from diffusionmodel_tpu.data.mnist import MnistDataset

            try:
                dataset = MnistDataset(cfg.data_root)
            except FileNotFoundError:
                print("MNIST IDX files not found; using synthetic fallback")
                dataset = MnistDataset(synthetic=True, n_synthetic=2048)
        elif args.preset == "labml":
            # CelebA-style image folder (reference/ddpm/experiment.py:151-186)
            from diffusionmodel_tpu.data import (
                ImageFolderDataset,
                SyntheticImageDataset,
            )

            try:
                dataset = ImageFolderDataset(
                    cfg.data_root, img_size=cfg.model.img_size,
                    channels=cfg.model.in_ch,
                    hflip_prob=cfg.train.hflip_prob)
            except (FileNotFoundError, NotADirectoryError):
                print(f"No image folder at {cfg.data_root}; "
                      "using synthetic fallback")
                dataset = SyntheticImageDataset(
                    n=512, img_size=cfg.model.img_size,
                    channels=cfg.model.in_ch)
        fit(cfg, dataset=dataset, metrics_impl=metrics_impl,
            resume=args.resume)
        return 0
    if args.mode == "generate":
        if args.ckpt is None:
            print("Error: Checkpoint path required for generation mode")
            return 1
        from diffusionmodel_tpu.sample import gen_samples

        gen_samples(
            cfg, args.ckpt,
            n_samples_per_class=args.samples,
            guide_scales=args.guide_scales,
            eval_quality=not args.no_eval,
            metrics_impl=metrics_impl,
        )
        return 0
    if args.mode == "serve":
        if args.ckpt is None:
            print("Error: Checkpoint path required for serve mode")
            return 1
        from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint
        from diffusionmodel_tpu.diffusion import Schedule
        from diffusionmodel_tpu.nn import build_model
        from diffusionmodel_tpu.serving import SamplerService, make_http_server
        from diffusionmodel_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        mc, dc = cfg.model, cfg.diffusion
        class_names = [f"class_{i}" for i in range(mc.n_classes)]
        try:
            from diffusionmodel_tpu.data import CrackDataset

            ds = CrackDataset(cfg.data_root, img_size=mc.img_size)
            if ds.classes:
                class_names = ds.classes
                if len(ds.classes) != mc.n_classes:
                    import dataclasses as _dc

                    cfg = cfg.replace(model=_dc.replace(
                        mc, n_classes=len(ds.classes)))
                    mc = cfg.model
        except FileNotFoundError:
            pass
        ckpt = load_checkpoint(args.ckpt, arch=mc.arch, norm=mc.norm)
        params = extract_params(ckpt)
        bs = ckpt.get("batch_stats", {}) if isinstance(ckpt, dict) else {}
        model = build_model(mc, dc.high_thresh)
        sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
        service = SamplerService(model, cfg, sched, params, batch_stats=bs,
                                 max_batch=args.max_batch)
        httpd = make_http_server(service, port=args.port,
                                 class_names=class_names,
                                 denorm=cfg.sample.denorm)
        print(f"Serving on :{args.port} (POST /generate, GET /healthz); "
              f"classes: {class_names}")
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            service.close()
        return 0
    if args.mode in ("img2img", "inpaint") and args.family == "main":
        if args.ckpt is None or not args.orig_img:
            print("Error: --ckpt and --orig_img required for main-family "
                  f"{args.mode}")
            return 1
        from diffusionmodel_tpu.sample import edit_samples

        edit_samples(
            cfg, args.ckpt, args.orig_img, mode=args.mode,
            class_id=args.class_id,
            guide_w=2.0 if args.scale is None else args.scale,
            strength=args.strength, n_steps=args.steps or 50,
            mask_path=args.mask_img, batch=args.batch_size,
            seed=args.seed if args.seed is not None else 0,
            out_dir=None if args.out_dir == "./output/ldm/" else args.out_dir,
        )
        return 0
    if args.mode == "train_ldm":
        if not args.data_root:
            print("Error: --data_root required for train_ldm mode")
            return 1
        import json
        import os

        import numpy as np

        from diffusionmodel_tpu.data.image_folder import ImageFolderDataset
        from diffusionmodel_tpu.models.latent_diffusion.runner import (
            LdmRunner,
        )
        from diffusionmodel_tpu.models.latent_diffusion.training import (
            fit_ldm,
        )
        from diffusionmodel_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        size = args.img_size
        if size % 8:
            print(f"Error: --img_size must be a multiple of 8 (the SD "
                  f"f=8 VAE contract), got {size}")
            return 1
        try:
            ds = ImageFolderDataset(args.data_root, img_size=size,
                                    normalize=True)
        except FileNotFoundError as e:
            print(f"Error: {e}")
            return 1
        if len(ds) == 0:
            print(f"Error: no images found under {args.data_root}")
            return 1
        images = np.stack([ds.load(i, augment=False)[0]
                           for i in range(len(ds))])
        multi = len(ds.classes) > 1
        prompts = [args.prompt_template.format(ds.classes[ds.labels[i]])
                   if multi else args.prompt for i in range(len(ds))]
        runner = LdmRunner(sd_ckpt=args.ckpt, arch=args.ldm_arch,
                           use_flash=args.flash, verbose=True,
                           seed=args.seed if args.seed is not None else 42)
        os.makedirs(args.out_dir, exist_ok=True)
        out_path = args.ldm_native or os.path.join(args.out_dir,
                                                   "ldm_native.pkl")
        bs = min(args.batch_size, len(ds))
        if args.train_ae_epochs:
            from diffusionmodel_tpu.models.latent_diffusion.training import (
                fit_ae,
            )

            ae_params, ae_hist = fit_ae(
                runner.ae, images, epochs=args.train_ae_epochs,
                batch_size=bs, lr=args.lr,
                seed=args.seed if args.seed is not None else 0)
            runner.ae_params = ae_params  # fit_ldm encodes + saves with it
            print(json.dumps({"stage": "train_ae",
                              "epochs": len(ae_hist),
                              "first": ae_hist[0], "last": ae_hist[-1]}))
        _, history = fit_ldm(
            runner, images, prompts, epochs=args.epochs or 10,
            batch_size=bs, lr=args.lr, uncond_prob=args.uncond_prob,
            remat=args.remat, out_path=out_path,
            seed=args.seed if args.seed is not None else 0)
        print(json.dumps({"mode": "train_ldm", "images": len(ds),
                          "epochs": len(history),
                          "first_loss": round(history[0], 4),
                          "last_loss": round(history[-1], 4),
                          "ckpt": out_path}))
        return 0
    if args.mode in ("txt2img", "img2img", "inpaint"):
        from diffusionmodel_tpu.models.latent_diffusion.runner import (
            LdmRunner,
        )
        from diffusionmodel_tpu.models.latent_diffusion.util import (
            load_img,
            save_images,
            set_seed,
        )
        from diffusionmodel_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        key = set_seed(args.seed if args.seed is not None else 42)
        runner = LdmRunner(
            sd_ckpt=args.ckpt, arch=args.ldm_arch, use_flash=args.flash,
            sampler=args.ldm_sampler, steps=args.steps or 50,
            native_ckpt=args.ldm_native,
        )
        scale = args.scale
        if args.mode == "txt2img":
            imgs = runner.txt2img(
                args.prompt, batch_size=args.batch_size, h=args.height,
                w=args.width,
                uncond_scale=7.5 if scale is None else scale, key=key)
        else:
            if not args.orig_img:
                print("Error: --orig_img required for "
                      f"{args.mode} mode")
                return 1
            img = load_img(args.orig_img, size=(args.height, args.width))
            img = img.repeat(args.batch_size, axis=0)
            fn = runner.img2img if args.mode == "img2img" else runner.inpaint
            imgs = fn(img, args.prompt, strength=args.strength,
                      uncond_scale=5.0 if scale is None else scale, key=key)
        paths = save_images(imgs, args.out_dir, prefix=f"{args.mode}_")
        print(f"Wrote {len(paths)} image(s): {paths[0]}"
              + (f" .. {paths[-1]}" if len(paths) > 1 else ""))
        return 0
    if args.mode == "eval":
        if not args.real_dir or not args.gen_dir:
            print("Error: --real_dir and --gen_dir required for eval mode")
            return 1
        import json
        import os

        from diffusionmodel_tpu.metrics.folder_eval import evaluate_folders

        out = evaluate_folders(args.real_dir, args.gen_dir,
                               metrics=metrics_impl,
                               img_size=args.img_size)
        os.makedirs(os.path.dirname(args.eval_out) or ".", exist_ok=True)
        with open(args.eval_out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
        print(f"Wrote {args.eval_out}")
        return 0
    if args.mode == "visualize":
        # Dataset/mask inspection sheet (test_DroneDataset.py:8-94): N
        # samples x 3 panels (original+bbox, transformed+bbox, attn-mask
        # heatmap). Unlike the reference's plt.show() script this is
        # headless — it only writes the PNG.
        from diffusionmodel_tpu.data import CrackDataset
        from diffusionmodel_tpu.data.visualize import (
            visualize_dataset_samples,
        )

        dc = cfg.diffusion
        try:
            ds = CrackDataset(
                cfg.data_root, img_size=cfg.model.img_size,
                mask_values=(dc.low_weight, dc.mid_weight, dc.high_weight))
        except (FileNotFoundError, NotADirectoryError, OSError) as e:
            print(f"Error: no dataset at {cfg.data_root}: {e}")
            return 1
        if len(ds.samples) == 0:
            # an existing root with zero annotated samples would reach
            # np.concatenate([]) inside the visualizer (ADVICE r3) —
            # same clean-error contract as the missing-root case.
            print(f"Error: no annotated samples found under {cfg.data_root}")
            return 1
        out = visualize_dataset_samples(
            ds, n_samples=args.samples or 5, out_path=args.viz_out,
            seed=cfg.train.seed)
        print(f"Wrote {out} ({min(args.samples or 5, len(ds.samples))} "
              "samples x 3 panels)")
        return 0
    if args.mode == "crop":
        from diffusionmodel_tpu.data.crop_tool import (
            DatasetCropper,
            parse_datasetninja_dir,
            parse_voc_dir,
        )

        if not args.img_dir or not args.anno_dir:
            print("Error: --img_dir and --anno_dir required for crop mode")
            return 1
        parse = (parse_voc_dir if args.anno_format == "voc"
                 else parse_datasetninja_dir)
        samples = parse(args.img_dir, args.anno_dir)
        cropper = DatasetCropper(samples, args.crop_out, args.crop_size)
        n = cropper.process_all(verbose=True)
        print(f"Cropped {n} objects into {args.crop_out}; "
              f"classes: {cropper.class_map}")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
