"""Generation sweep — the ``gen_samples`` equivalent (new_scripy.py:945-1108).

Loads a checkpoint (tolerant of full / params-only / torch layouts), runs
the jitted scan sampler per guidance scale, saves the grid
(``samples_g{w}.png``) and per-class files (``{class}_s{i}_g{w}.png``),
optionally evaluates FID/SSIM/PSNR against real images drawn from the
dataset, and dumps ``quality_metrics.json``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint
from diffusionmodel_tpu.config import Config
from diffusionmodel_tpu.data import CrackDataset
from diffusionmodel_tpu.diffusion import Schedule
from diffusionmodel_tpu.metrics import ImageMetrics
from diffusionmodel_tpu.nn import build_model
from diffusionmodel_tpu.trainer import _sanitize, make_sampler
from diffusionmodel_tpu.utils.transfer import fetch_tree
from diffusionmodel_tpu.utils import enable_compilation_cache
from diffusionmodel_tpu.utils.grid import save_image, save_samples


def gen_samples(cfg: Config, ckpt_path: str,
                n_samples_per_class: Optional[int] = None,
                guide_scales: Optional[Sequence[float]] = None,
                eval_quality: Optional[bool] = None,
                dataset: Optional[CrackDataset] = None,
                metrics_impl: Optional[ImageMetrics] = None,
                seed: int = 0, verbose: bool = True,
                sweep_one_batch: Optional[bool] = None) -> Dict:
    """``sweep_one_batch``: run the whole guidance sweep as ONE device
    batch with a per-sample guide_w vector (diffusion._guide_arr) — one
    compile, one sampler pass for every scale. Default (None): auto-on
    when the combined batch stays within the flagship HBM envelope
    (<= 48 slots). Per-scale artifacts/metrics are identical in form to
    the loop path; per-scale wall-clock is then the shared pass divided
    by the number of scales."""
    enable_compilation_cache()
    sc, mc, dc = cfg.sample, cfg.model, cfg.diffusion
    n_per = n_samples_per_class or sc.samples_per_class
    scales = list(guide_scales or sc.guide_scales)
    do_eval = sc.eval_quality if eval_quality is None else eval_quality

    if dataset is None:
        try:
            dataset = CrackDataset(cfg.data_root, img_size=mc.img_size)
        except FileNotFoundError:
            # no dataset on disk: generic class names, no quality eval
            # (the reference requires ./cropped_images/ even for pure
            # generation — relaxed here)
            dataset = None
            do_eval = False
    classes = (dataset.classes if dataset is not None and dataset.classes
               else [f"class_{i}" for i in range(mc.n_classes)])
    n_classes = len(classes)
    if n_classes != mc.n_classes:
        import dataclasses as _dc

        cfg = cfg.replace(model=_dc.replace(mc, n_classes=n_classes))
        mc = cfg.model

    if verbose:
        print(f"Loading checkpoint: {ckpt_path}")
    ckpt = load_checkpoint(ckpt_path, arch=mc.arch, norm=mc.norm)
    params = extract_params(ckpt)
    batch_stats = ckpt.get("batch_stats", {}) if isinstance(ckpt, dict) else {}

    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    n_sample = n_per * n_classes
    # Block-ordered classes (class 0 x n_per, class 1 x n_per, ...) so the
    # per-class filenames and grid rows below are correct. The reference's
    # gen_samples has a latent mislabeling bug here: its sample() regenerates
    # classes cyclically (arange(n_classes) tiled, new_scripy.py:447-448)
    # while the filenames assume block order (new_scripy.py:1051-1061).
    gen_classes = jnp.asarray(np.repeat(np.arange(n_classes), n_per), jnp.int32)
    # Generation fans out over all local devices (the BASELINE images/min
    # north star): batch sharded on the mesh's 'data' axis, per-chip PRNG
    # handled inside make_sampler. On a 1-chip host this is a 1x1x1 mesh.
    from diffusionmodel_tpu.parallel import make_mesh

    mesh = make_mesh()
    if sweep_one_batch is None:
        sweep_one_batch = len(scales) > 1 and n_sample * len(scales) <= 48
    if sweep_one_batch:
        sweep_classes = jnp.tile(gen_classes, len(scales))
        sampler = make_sampler(model, cfg, sched, bool(batch_stats),
                               int(sweep_classes.shape[0]),
                               classes=sweep_classes, mesh=mesh)
    else:
        sampler = make_sampler(model, cfg, sched, bool(batch_stats),
                               n_sample, classes=gen_classes, mesh=mesh)

    out_dir = os.path.join(sc.sample_dir, f"samples_{int(time.time())}")
    os.makedirs(out_dir, exist_ok=True)
    if verbose:
        print(f"Samples will be saved to: {out_dir}")

    real_images = None
    img_metrics = metrics_impl if metrics_impl is not None else ImageMetrics()
    if do_eval and dataset is not None and len(dataset) > 0:
        needed = n_per * min(n_classes, 4)
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(dataset))[:needed]
        real_images = np.stack(
            [dataset.load(int(i), augment=False)[0] for i in order]
        )

    key = jax.random.PRNGKey(seed)
    results: Dict = {}
    quality: Dict = {}
    sweep_gen = None
    if sweep_one_batch:
        if verbose:
            print(f"Generating all scales {scales} in ONE batch "
                  f"({n_sample * len(scales)} slots, per-sample guide_w)")
        key, sub = jax.random.split(key)
        gw = jnp.repeat(jnp.asarray(scales, jnp.float32), n_sample)
        t0 = time.time()
        with mesh:
            # fetch_tree: chunked fetch — a multi-scale sweep batch is
            # tens of MB, which hits the tunneled platform's ~5 MB/s
            # single-array path (utils/transfer.py module doc).
            sweep_gen = fetch_tree(sampler(params, batch_stats, sub, gw))
        sweep_dt = time.time() - t0
    for si, w in enumerate(scales):
        if sweep_one_batch:
            x_gen = sweep_gen[si * n_sample:(si + 1) * n_sample]
            dt = sweep_dt / len(scales)
        else:
            if verbose:
                print(f"Generating samples with guidance scale {w}")
            key, sub = jax.random.split(key)
            t0 = time.time()
            with mesh:
                x_gen = fetch_tree(sampler(params, batch_stats, sub,
                                           jnp.float32(w)))
            dt = time.time() - t0
        grid_path = os.path.join(out_dir, f"samples_g{w}.png")
        save_samples(x_gen, grid_path, nrow=n_per, denorm=sc.denorm)
        for i in range(len(x_gen)):
            cls = classes[i // n_per]
            save_image(x_gen[i], os.path.join(
                out_dir, f"{cls}_s{i % n_per}_g{w}.png"), denorm=sc.denorm)
        results[w] = {
            "grid_path": grid_path,
            "seconds": dt,
            "images_per_min": len(x_gen) / max(dt, 1e-9) * 60,
        }
        if real_images is not None:
            try:
                m = img_metrics.evaluate_batch(
                    real_images, x_gen[: len(real_images)])
                quality[w] = m
                if verbose:
                    print("  " + ", ".join(f"{k}={v:.4f}" for k, v in m.items()))
            except Exception as e:
                print(f"Quality assessment failed: {e}")

    if quality:
        with open(os.path.join(out_dir, "quality_metrics.json"), "w") as f:
            json.dump(_sanitize({str(k): v for k, v in quality.items()}), f,
                      indent=2)
    results["out_dir"] = out_dir
    results["quality"] = quality
    return results


def _load_edit_image(path: str, img_size: int, channels: int) -> np.ndarray:
    """Image file -> float32 [1, H, W, C] in [-1, 1] at the MODEL's exact
    resolution (the main family trains at a fixed img_size; unlike the LDM
    util.load_img there is no x32 constraint to honor)."""
    from PIL import Image

    im = Image.open(path).convert("RGB" if channels == 3 else "L")
    if im.size != (img_size, img_size):
        im = im.resize((img_size, img_size), resample=Image.LANCZOS)
    arr = np.asarray(im).astype(np.float32) * (2.0 / 255.0) - 1.0
    if channels == 1:
        arr = arr[..., None]
    return arr[None]


def _load_keep_mask(path: Optional[str], img_size: int) -> np.ndarray:
    """Inpaint keep-mask: luminance > 0.5 of ``path`` = PRESERVE the
    original pixel (the reference's orientation, in_paint.py:80-84);
    without a file, preserve the bottom half (its default)."""
    if path is None:
        m = np.zeros((img_size, img_size), np.float32)
        m[img_size // 2:] = 1.0
        return m
    from PIL import Image

    im = Image.open(path).convert("L")
    if im.size != (img_size, img_size):
        im = im.resize((img_size, img_size), resample=Image.NEAREST)
    return (np.asarray(im).astype(np.float32) / 255.0 > 0.5).astype(
        np.float32)


def edit_samples(cfg: Config, ckpt_path: str, img_path: str,
                 mode: str = "img2img", class_id: int = 0,
                 guide_w: float = 2.0, strength: float = 0.75,
                 n_steps: int = 50, mask_path: Optional[str] = None,
                 batch: int = 1, seed: int = 0, eta: float = 0.0,
                 out_dir: Optional[str] = None, verbose: bool = True) -> Dict:
    """Main-family img2img / inpaint front door (diffusion.sample_cfg_edit)
    — a beyond-reference capability: the reference ships image editing only
    on the vendored LDM side (reference/stable_diffusion/scripts/
    image_to_image.py:95-149, in_paint.py:100-166); this applies the same
    two recipes to a trained flagship crack model. Saves
    ``{mode}_s{i}.png`` plus a source/edited side-by-side grid and returns
    paths + timing."""
    from diffusionmodel_tpu.diffusion import sample_cfg_edit

    enable_compilation_cache()
    sc, mc, dc = cfg.sample, cfg.model, cfg.diffusion
    ckpt = load_checkpoint(ckpt_path, arch=mc.arch, norm=mc.norm)
    params = extract_params(ckpt)
    batch_stats = ckpt.get("batch_stats", {}) if isinstance(ckpt, dict) else {}
    model = build_model(mc, dc.high_thresh)
    sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)

    x0 = np.repeat(_load_edit_image(img_path, mc.img_size, mc.in_ch),
                   batch, axis=0)
    mask = (jnp.asarray(_load_keep_mask(mask_path, mc.img_size))
            if mode == "inpaint" else None)
    classes = jnp.full((batch,), int(class_id), jnp.int32)
    has_bn = bool(batch_stats)

    def run(params, batch_stats, key, x0_dev, gw):
        def apply_fn(x, c, t, ctx, attn, train):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, x, c, t, ctx, attn_mask=attn,
                               train=False)

        return sample_cfg_edit(apply_fn, key, x0_dev, mc.n_classes, sched,
                               dc, guide_w=gw, n_steps=n_steps,
                               strength=strength, inpaint_mask=mask,
                               classes=classes, eta=eta,
                               discretize=sc.ddim_discretize)

    if verbose:
        print(f"{mode} on {img_path} (class {class_id}, guide {guide_w}, "
              f"strength {strength}, {n_steps}-step DDIM)")
    t0 = time.time()
    out = fetch_tree(jax.jit(run)(params, batch_stats,
                                  jax.random.PRNGKey(seed),
                                  jnp.asarray(x0), jnp.float32(guide_w)))
    dt = time.time() - t0

    out_dir = out_dir or os.path.join(sc.sample_dir,
                                      f"edit_{int(time.time())}")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(len(out)):
        p = os.path.join(out_dir, f"{mode}_s{i}.png")
        save_image(out[i], p, denorm=sc.denorm)
        paths.append(p)
    grid_path = os.path.join(out_dir, f"{mode}_grid.png")
    save_samples(np.concatenate([x0, np.asarray(out)]), grid_path,
                 nrow=batch, denorm=sc.denorm)
    if verbose:
        print(f"Wrote {len(paths)} image(s) + {grid_path} in {dt:.1f}s")
    return {"paths": paths, "grid_path": grid_path, "seconds": dt,
            "out_dir": out_dir}
