"""Training orchestration (host loop) — the ``train_model`` equivalent
(new_scripy.py:659-943), driving the jitted step over a device mesh.

Per epoch: train phase (in-graph grad accumulation, loss EMA logging),
validation phase, early-stop check (best-state stashing,
``best_model_early``), periodic sampling + FID/SSIM/PSNR every
``eval_every`` epochs, checkpointing (save_freq/min_save_ep/best), and a
metrics JSON dump — same artifact schema as the reference
(metrics/metrics_ep{N}.json with train_loss/val_loss/img_metrics/lr), plus
TPU-native extras: steps/sec/chip and sampled images/min counters
(SURVEY 5.1, 5.5).
"""

from __future__ import annotations

import json
import os
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusionmodel_tpu.checkpoint import save_checkpoint
from diffusionmodel_tpu.config import Config
from diffusionmodel_tpu.data import BatchLoader, CrackDataset, stratified_split
from diffusionmodel_tpu.diffusion import Schedule, sample_cfg, sample_cfg_ddim
from diffusionmodel_tpu.metrics import ImageMetrics
from diffusionmodel_tpu.nn import build_model
from diffusionmodel_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)
from diffusionmodel_tpu.lr_schedules import build_schedule
from diffusionmodel_tpu.train import (
    EarlyStop,
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from diffusionmodel_tpu.utils import enable_compilation_cache
from diffusionmodel_tpu.utils.grid import save_samples
from diffusionmodel_tpu.utils.transfer import fetch_tree


def _sanitize(obj):
    if isinstance(obj, dict):
        return {k: _sanitize(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_sanitize(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return float(obj)
    if isinstance(obj, (jnp.ndarray, np.ndarray)) and obj.size == 1:
        return float(obj)
    return obj


def make_sampler(model, cfg: Config, sched: Schedule, has_bn: bool,
                 n_sample: int, classes=None, chunk: int = 50, mesh=None):
    """Sampler: (params, batch_stats, key, guide_w) -> images. guide_w is
    traced, so one compile covers every guidance scale. The ancestral path
    is chunk-driven (this environment kills XLA programs running >~4 min;
    700 full-model steps exceed it); DDIM jits whole.

    ``mesh``: shard the sample batch over the mesh's 'data' axis so
    generation fans out across chips (the BASELINE images/min north star —
    each chip denoises its slice of the batch). The global PRNG is
    partitionable (mesh-invariant bits); outputs match the single-device
    run to ~1e-5 (conv reduction order differs under GSPMD partitioning).
    Falls back to replication when n_sample does not divide evenly."""
    from diffusionmodel_tpu.diffusion import sample_cfg_chunked

    dc = cfg.diffusion
    mc = cfg.model
    shape = (mc.img_size, mc.img_size, mc.in_ch)

    rep = xshard = None
    if mesh is not None:
        from diffusionmodel_tpu.parallel import image_sharding

        rep = replicated(mesh)
        n_sp = dict(mesh.shape).get("spatial", 1)
        if n_sample % mesh.shape["data"] != 0:
            xshard = rep
        elif (n_sp > 1 and mc.img_size % n_sp == 0
              and getattr(model, "spatial_shards", 0) > 0):
            # big-image layout: batch over 'data' AND H over 'spatial'.
            # Only for models carrying constrain_spatial hooks — without
            # them XLA's sub-kernel halo exchange on small maps is
            # numerically wrong (test_gspmd_subkernel_halo_is_wrong...).
            xshard = image_sharding(mesh, 4)
        else:
            xshard = batch_sharding(mesh, 4, 0)

    def _jit_sampler(fn, in_s):
        """jit with batch-sharded output; ``in_s`` gives the sharding of
        each arg after (params, batch_stats), whose shardings are inferred
        from the actual arguments (they may arrive TP-sharded)."""
        if mesh is None:
            return jax.jit(fn)
        return jax.jit(fn, in_shardings=(None, None) + in_s,
                       out_shardings=xshard)

    if dc.schedule_family == "textbook":
        # annotated-DDPM family: unconditional textbook ancestral sampling
        # (reference/ddpm/__init__.py:230-255); guide_w/classes are ignored.
        # The eps-fn adapter + step contract are shared with serving
        # (models/annotated_ddpm.make_textbook_chunk_fn).
        from diffusionmodel_tpu.models.annotated_ddpm.diffusion import (
            make_textbook_chunk_fn,
            textbook_chunk_steps,
        )

        jchunk_tb = _jit_sampler(
            make_textbook_chunk_fn(model, dc, n_sample, shape, has_bn),
            (xshard, rep, rep))

        def sfn(params, batch_stats, key, guide_w):
            # t = n_T-1 .. 0, padded with the gated t=-1 sentinel; the
            # shared chunk driver handles noise init / padding / carry.
            return sample_cfg_chunked(
                lambda p, x, k, s, w: jchunk_tb(p, batch_stats, x, k, s),
                params, key, n_sample, shape, dc, guide_w,
                chunk=min(chunk, dc.n_T), x_sharding=xshard,
                steps=textbook_chunk_steps(dc.n_T), pad_value=-1)

        return sfn

    def _apply(params, batch_stats):
        def apply_fn(x, c, t, ctx, attn, train):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, x, c, t, ctx, attn_mask=attn,
                               train=False)

        return apply_fn

    def _precast(params):
        # When the model computes in bf16, flax casts every fp32 param to
        # bf16 inside each op anyway (promote_dtype) — precasting once per
        # sampler call is numerically IDENTICAL and removes the per-step
        # cast work (measured 576 -> 554 ms on the flagship batch-40 fwd,
        # benchmarks/profile_blocks.py).
        if getattr(model, "dtype", jnp.float32) != jnp.bfloat16:
            return params
        return jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)

    if cfg.sample.sampler == "ddim":
        def sfn(params, batch_stats, key, guide_w):
            return sample_cfg_ddim(
                _apply(_precast(params), batch_stats), key, n_sample, shape,
                mc.n_classes, sched, dc, guide_w=guide_w,
                n_steps=cfg.sample.ddim_steps, eta=cfg.sample.ddim_eta,
                classes=classes, discretize=cfg.sample.ddim_discretize)

        return _jit_sampler(sfn, (rep, rep))

    if cfg.sample.sampler == "dpmpp":
        from diffusionmodel_tpu.diffusion import sample_cfg_dpmpp

        def sfn(params, batch_stats, key, guide_w):
            return sample_cfg_dpmpp(
                _apply(_precast(params), batch_stats), key, n_sample, shape,
                mc.n_classes, sched, dc, guide_w=guide_w,
                n_steps=cfg.sample.dpm_steps, classes=classes,
                discretize=cfg.sample.ddim_discretize)

        return _jit_sampler(sfn, (rep, rep))

    if cfg.sample.sampler != "ancestral":
        raise ValueError(
            f"unknown sample.sampler {cfg.sample.sampler!r} "
            "(expected ancestral | ddim | dpmpp)")

    def jchunk(params, batch_stats, x, key, steps, guide_w):
        return sample_cfg(_apply(params, batch_stats), key, n_sample, shape,
                          mc.n_classes, sched, dc, guide_w=guide_w,
                          classes=classes, steps=steps, x_init=x)

    jchunk = _jit_sampler(jchunk, (xshard, rep, rep, rep))

    is_bf16 = getattr(model, "dtype", jnp.float32) == jnp.bfloat16
    jcast = jax.jit(_precast) if is_bf16 else None  # shardings pass through

    def sfn(params, batch_stats, key, guide_w):
        cast_params = jcast(params) if is_bf16 else params
        return sample_cfg_chunked(
            lambda p, x, k, s, w: jchunk(p, batch_stats, x, k, s, w),
            cast_params, key, n_sample, shape, dc, guide_w,
            chunk=min(chunk, dc.n_T), x_sharding=xshard)

    def aot_warm(params_struct):
        """AOT lower+compile this sampler's jitted programs from a params
        ShapeDtypeStruct tree (jax.eval_shape of model.init) WITHOUT
        executing or touching device HBM — populates the persistent
        compile cache while e.g. a training leg owns the chip (the
        remote-compile service is separate from chip execution)."""
        kstruct = jax.eval_shape(lambda: jax.random.PRNGKey(0))
        if is_bf16:
            jcast.lower(params_struct).compile()
            cast_struct = jax.eval_shape(_precast, params_struct)
        else:
            cast_struct = params_struct
        xs = jax.ShapeDtypeStruct((n_sample, *shape), jnp.float32)
        ss = jax.ShapeDtypeStruct((min(chunk, dc.n_T),), jnp.int32)
        ws = jax.ShapeDtypeStruct((), jnp.float32)
        jchunk.lower(cast_struct, {}, xs, kstruct, ss, ws).compile()

    sfn.aot_warm = aot_warm
    return sfn


def _wire_format_ok(dataset, dc) -> bool:
    """The uint8 wire format maps mask class indices back to weights with
    the CONFIG's low/mid/high_weight (train.decode_wire). An externally
    constructed dataset may carry different mask_values — ship floats
    then, so training uses the dataset's own weights (ADVICE r2)."""
    cfg_vals = (dc.low_weight, dc.mid_weight, dc.high_weight)
    return tuple(getattr(dataset, "mask_values", cfg_vals)) == cfg_vals


class _CkptWriter:
    """Asynchronous checkpoint writer: one daemon thread, FIFO by name,
    per-name coalescing.

    This host's disk persists at ~3 MB/s (measured 2026-08-17, dd
    fdatasync), so a multi-GB flagship checkpoint takes tens of minutes
    to land — far longer than an epoch. Writes therefore happen OFF the
    training thread: ``submit`` hands over an already-host-resident
    payload (the device fetch stays on the training thread — concurrent
    device access from a writer thread is not worth trusting on the
    tunneled platform) and returns immediately. If a newer payload for
    the same name (e.g. ``best_model``) arrives while an older one is
    still queued, the older one is replaced — stale snapshots are
    skipped, the newest always lands. ``close()`` drains the queue.

    The reference blocks its train loop on every torch.save
    (new_scripy.py:730-744) — fine on a local GPU box, not here.
    """

    def __init__(self, verbose: bool = True):
        self._cv = threading.Condition()
        self._pending: Dict[str, tuple] = {}  # name -> (path, payload, meta)
        self._order: list = []                # FIFO of pending names
        self._stop = False
        self.verbose = verbose
        self.errors: list = []
        self._thread = threading.Thread(
            target=self._run, name="ckpt-writer", daemon=True)
        self._thread.start()

    def submit(self, name: str, path: str, payload: dict,
               sidecar: Optional[tuple] = None) -> None:
        """Queue a checkpoint; ``sidecar=(path, json_dict)`` is written
        after the checkpoint itself lands (it mirrors on-disk state)."""
        with self._cv:
            if name not in self._pending:
                self._order.append(name)
            self._pending[name] = (path, payload, sidecar)
            self._cv.notify()

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._order and not self._stop:
                    self._cv.wait()
                if not self._order:
                    return  # stopped and drained
                name = self._order.pop(0)
                path, payload, sidecar = self._pending.pop(name)
            t0 = time.time()
            try:
                out = save_checkpoint(path, payload)
                if sidecar is not None:
                    with open(sidecar[0], "w") as f:
                        json.dump(sidecar[1], f)
                if self.verbose:
                    print(f"[{time.strftime('%H:%M:%S')}] Saved checkpoint: "
                          f"{out} ({time.time() - t0:.1f}s, async)",
                          flush=True)
            except Exception as e:  # keep the writer alive for later saves
                self.errors.append((name, e))
                print(f"[ckpt-writer] save of {name} FAILED: {e}", flush=True)

    def close(self) -> None:
        """Drain pending writes and stop the thread (blocks)."""
        with self._cv:
            self._stop = True
            self._cv.notify()
        self._thread.join()


def fit(cfg: Config, dataset: Optional[CrackDataset] = None,
        metrics_impl: Optional[ImageMetrics] = None, verbose: bool = True,
        resume: Optional[str] = None) -> TrainState:
    """Train; ``resume`` restores params/opt_state/epoch from a checkpoint —
    a capability upgrade over the reference, which saves full training state
    but never loads it (SURVEY 5.3)."""
    enable_compilation_cache()
    tc, mc, dc = cfg.train, cfg.model, cfg.diffusion
    if tc.debug_nans:
        jax.config.update("jax_debug_nans", True)

    os.makedirs(tc.save_dir, exist_ok=True)
    metrics_dir = os.path.join(tc.save_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    metrics_log: Dict[str, list] = {
        "train_loss": [], "val_loss": [], "img_metrics": [], "lr": [],
        "steps_per_sec": [],
    }

    if dataset is None:
        dataset = CrackDataset(
            cfg.data_root, img_size=mc.img_size,
            mask_values=(dc.low_weight, dc.mid_weight, dc.high_weight),
            hflip_prob=tc.hflip_prob, co_flip_mask=tc.co_flip_mask,
        )
    import dataclasses as _dc

    n_classes = len(dataset.classes) if dataset.classes else mc.n_classes
    if n_classes != mc.n_classes:
        cfg = cfg.replace(model=_dc.replace(mc, n_classes=n_classes))
        mc = cfg.model

    train_idx, val_idx = stratified_split(dataset.labels, tc.val_split,
                                          tc.split_seed)
    if verbose:
        print(f"Dataset split - Train: {len(train_idx)}, Val: {len(val_idx)}")

    wire_ok = _wire_format_ok(dataset, dc)
    train_loader = BatchLoader(dataset, train_idx, tc.batch_size,
                               tc.accum_steps, shuffle=True, augment=True,
                               seed=tc.seed, wire_u8=wire_ok)
    val_loader = BatchLoader(dataset, val_idx, tc.batch_size, 1, shuffle=False,
                             augment=False, wire_u8=wire_ok)

    mesh = make_mesh(tc.mesh_data, tc.mesh_model, tc.mesh_spatial)
    model = build_model(mc, dc.high_thresh, spatial_shards=tc.mesh_spatial)
    if dc.schedule_family == "textbook":
        from diffusionmodel_tpu.models.annotated_ddpm.diffusion import (
            textbook_schedule,
        )

        sched = textbook_schedule(dc.n_T, dc.beta1, dc.beta2)
    else:
        sched = Schedule.create(dc.beta1, dc.beta2, dc.n_T)
    steps_per_epoch = max(1, len(train_loader))

    key = jax.random.PRNGKey(tc.seed)
    key, init_key = jax.random.split(key)
    # init under the mesh context: with mesh_spatial > 1 the model carries
    # constrain_spatial hooks, and with_sharding_constraint inside the
    # jitted init requires a mesh in context.
    with mesh:
        state, tx = create_train_state(model, cfg, init_key, steps_per_epoch)
    start_epoch = 0
    if resume:
        from diffusionmodel_tpu.checkpoint import extract_params, load_checkpoint

        ckpt = load_checkpoint(resume, arch=mc.arch, norm=mc.norm)
        # prefer_ema=False: optimization must continue from the LIVE
        # weights; the EMA shadow is restored separately below.
        state = state.replace(params=extract_params(ckpt, prefer_ema=False))
        if state.ema_params is not None:
            # ema-on run: restore the shadow, or seed it from the restored
            # params when resuming an ema-less checkpoint.
            ema = ckpt.get("ema_params") if isinstance(ckpt, dict) else None
            state = state.replace(ema_params=ema if ema is not None
                                  else jax.tree.map(jnp.array, state.params))
        if isinstance(ckpt, dict):
            if ckpt.get("batch_stats"):
                state = state.replace(batch_stats=ckpt["batch_stats"])
            if ckpt.get("opt_state") is not None:
                try:
                    restored = jax.tree.unflatten(
                        jax.tree.structure(state.opt_state),
                        jax.tree.leaves(ckpt["opt_state"]))
                    # Cast restored leaves to the freshly-initialized
                    # dtypes: a ckpt written with fp32 Adam moments must
                    # load into a bf16-moment (train.moment_dtype) run
                    # without forcing a second compile of the train step
                    # mid-epoch (the first optax update would cast mu and
                    # change the donated state's dtype signature).
                    restored = jax.tree.map(
                        lambda t, l: l if getattr(l, "dtype", None)
                        == getattr(t, "dtype", None)
                        else jnp.asarray(l).astype(t.dtype),
                        state.opt_state, restored)
                    state = state.replace(opt_state=restored)
                except Exception as e:
                    print(f"opt_state restore skipped: {e}")
            start_epoch = int(ckpt.get("epoch", -1)) + 1
        # Seed the step counter from the resumed position: the EMA
        # warm-up min(decay, (1+step)/(10+step)) would otherwise restart
        # at ~0.1 and overwrite the restored shadow with the live params
        # in the first resumed steps.
        state = state.replace(
            step=jnp.asarray(start_epoch * steps_per_epoch, jnp.int32))
        if verbose:
            print(f"Resumed from {resume} at epoch {start_epoch}")
    has_bn = bool(state.batch_stats)
    norm_u8 = bool(getattr(dataset, "normalize", True))
    step_fn = make_train_step(model, sched, cfg, tx, has_bn,
                              normalize_u8=norm_u8)
    eval_fn = make_eval_step(model, sched, cfg, has_bn, normalize_u8=norm_u8)

    p_shard = param_shardings(mesh, state.params)
    if tc.zero1:
        from diffusionmodel_tpu.parallel import opt_state_shardings

        o_shard = opt_state_shardings(mesh, state.opt_state)
    else:
        o_shard = jax.tree.map(lambda _: replicated(mesh), state.opt_state)
    state_shard = state.replace(
        step=replicated(mesh), params=p_shard,
        batch_stats=jax.tree.map(lambda _: replicated(mesh), state.batch_stats),
        opt_state=o_shard,
        ema_params=p_shard if state.ema_params is not None else None,
    )
    # Batch layout: micro-batch over 'data'; with mesh_spatial > 1 (and a
    # model carrying constrain_spatial hooks) the image H axis additionally
    # shards over 'spatial' — the data x spatial TRAIN layout certified by
    # __graft_entry__.dryrun_multichip (GSPMD conv halo exchange + psum'd
    # pooled stats; loss matches single-device to fp32 tolerance).
    use_spatial_batches = (
        dict(mesh.shape).get("spatial", 1) > 1
        and mc.img_size % mesh.shape["spatial"] == 0
        and getattr(model, "spatial_shards", 0) > 0)
    if use_spatial_batches:
        from diffusionmodel_tpu.parallel import image_sharding

        bshard = {
            "x": image_sharding(mesh, 5, batch_axis=1, h_axis=2),
            "c": batch_sharding(mesh, 2, 1),
            "mask": image_sharding(mesh, 4, batch_axis=1, h_axis=2),
        }
        vshard = {
            "x": image_sharding(mesh, 4, batch_axis=0, h_axis=1),
            "c": batch_sharding(mesh, 1, 0),
            "mask": image_sharding(mesh, 3, batch_axis=0, h_axis=1),
        }
    else:
        bshard = {
            "x": batch_sharding(mesh, 5, 1),
            "c": batch_sharding(mesh, 2, 1),
            "mask": batch_sharding(mesh, 4, 1),
        }
        vshard = {
            "x": batch_sharding(mesh, 4, 0),
            "c": batch_sharding(mesh, 1, 0),
            "mask": batch_sharding(mesh, 3, 0),
        }
    # out_shardings pins the updated state to the same layout the next
    # step expects — without it GSPMD may emit e.g. new_params still
    # data-sharded under zero1 (deferring the all-gather), and feeding
    # that committed output back conflicts with the declared input spec.
    jstep = jax.jit(step_fn, in_shardings=(state_shard, bshard, replicated(mesh)),
                    out_shardings=(state_shard, replicated(mesh)),
                    donate_argnums=(0,))
    jeval = jax.jit(eval_fn, in_shardings=(state_shard, vshard, replicated(mesh)))
    state = jax.device_put(state, state_shard)

    # Eval-sample collection: stratified <= eval_sample_count from val
    # (new_scripy.py:747-765).
    eval_samples = []
    eval_count = min(tc.eval_sample_count, len(val_idx))
    per_class = max(2, eval_count // max(n_classes, 1))
    class_counts = {i: 0 for i in range(n_classes)}
    for i in val_idx:
        x, c, _ = dataset.load(int(i), augment=False)
        if class_counts.get(c, per_class) < per_class and len(eval_samples) < eval_count:
            eval_samples.append((x, c))
            class_counts[c] += 1
        if len(eval_samples) >= eval_count:
            break
    if verbose:
        print(f"Collected {len(eval_samples)} samples for evaluation")

    sampler = None
    if eval_samples:
        classes = jnp.asarray([c for _, c in eval_samples], jnp.int32)
        sampler = make_sampler(model, cfg, sched, has_bn, len(eval_samples),
                               classes=classes, mesh=mesh)
    img_metrics = metrics_impl if metrics_impl is not None else ImageMetrics()

    early_stop = EarlyStop(tc.patience, tc.min_delta, verbose=verbose,
                           snapshot_min_epochs=tc.best_snapshot_min_epochs)
    # A resumed run must not clobber an existing best_model with a
    # worse-val state just because its EarlyStop baseline restarts at inf:
    # seed the baseline from the sidecar written alongside best_model.
    best_sidecar = os.path.join(tc.save_dir, "best_val.json")
    if resume and os.path.exists(best_sidecar):
        try:
            with open(best_sidecar) as f:
                prev_best = json.load(f)
            early_stop.best_loss = float(prev_best["val_loss"])
            if verbose:
                print(f"EarlyStop baseline from existing best_model: "
                      f"{early_stop.best_loss:.6f} "
                      f"(epoch {prev_best.get('epoch')})")
        except Exception as e:
            print(f"best_val sidecar ignored: {e}")
    lr_schedule_fn = build_schedule(
        tc.lr_schedule, tc.lr, steps_per_epoch, n_epoch=tc.n_epoch,
        t0=tc.sgdr_t0, t_mult=tc.sgdr_t_mult, eta_min=tc.sgdr_eta_min)

    ckpt_writer = _CkptWriter(verbose=verbose)

    def save_ckpt(state, epoch, loss, is_best=False, host_state=None):
        name = "best_model" if is_best else f"ckpt_ep{epoch}"
        t0 = time.time()
        if host_state is not None:
            # best_model: reuse the host copy EarlyStop already fetched
            # (a second device fetch costs minutes on the tunneled
            # platform) and omit opt_state — best_model is a sampling
            # artifact, like the reference's bare state_dict best save
            # (new_scripy.py:836-846); full resume state lives in the
            # periodic ckpt_epN.
            payload = {
                "epoch": epoch,
                "params": host_state["params"],
                "batch_stats": host_state["batch_stats"],
                "loss": float(loss),
            }
            if host_state.get("ema_params") is not None:
                payload["ema_params"] = host_state["ema_params"]
        else:
            # fetch to host ON THE TRAIN THREAD (chunked, utils/transfer),
            # then hand the numpy tree to the async disk writer
            payload = {
                "epoch": epoch,
                "params": fetch_tree(state.params),
                "batch_stats": fetch_tree(state.batch_stats),
                "opt_state": fetch_tree(state.opt_state),
                "loss": float(loss),
            }
            if state.ema_params is not None:
                payload["ema_params"] = fetch_tree(state.ema_params)
        sidecar = None
        if is_best:
            sidecar = (best_sidecar, {"epoch": epoch,
                                      "val_loss": float(loss)})
        path = os.path.join(tc.save_dir, name)
        ckpt_writer.submit(name, path, payload, sidecar=sidecar)
        if verbose:
            print(f"[{time.strftime('%H:%M:%S')}] Queued "
                  f"{'best ' if is_best else ''}checkpoint: {path} "
                  f"(fetch {time.time() - t0:.1f}s)", flush=True)

    train_loss_ema = None
    last_ep = start_epoch - 1  # actual last completed epoch
    last_saved_ep = -1
    try:
      with mesh:
        for ep in range(start_epoch, tc.n_epoch):
            t_ep = time.time()
            profiling = bool(tc.profile_dir) and ep == tc.profile_epoch
            if profiling:
                jax.profiler.start_trace(tc.profile_dir)
            losses = []
            nsteps = 0
            t_steps = time.time()
            for batch in train_loader:
                key, sub = jax.random.split(key)
                batch = jax.device_put(batch, bshard)
                state, loss = jstep(state, batch, sub)
                losses.append(loss)
                nsteps += 1
            losses = [float(l) for l in losses]  # sync once per epoch
            if profiling:
                jax.profiler.stop_trace()
                if verbose:
                    print(f"Saved profiler trace to {tc.profile_dir}")
            steps_per_sec = nsteps / max(time.time() - t_steps, 1e-9)
            avg_train = float(np.mean(losses)) if losses else float("nan")
            for l in losses:
                train_loss_ema = l if train_loss_ema is None else (
                    0.95 * train_loss_ema + 0.05 * l)
            metrics_log["train_loss"].append(avg_train)
            metrics_log["steps_per_sec"].append(steps_per_sec)

            # validation
            vlosses = []
            for batch in val_loader:
                key, sub = jax.random.split(key)
                vb = {k: v[0] for k, v in batch.items()}
                vb = jax.device_put(vb, vshard)
                vlosses.append(jeval(state, vb, sub))
            val_loss = float(np.mean([float(v) for v in vlosses])) if vlosses \
                else float("nan")
            metrics_log["val_loss"].append(val_loss)
            # the LIVE scheduled LR for this epoch, not the base lr — the
            # reference logs the scheduler's current value
            # (new_scripy.py:913-917).
            metrics_log["lr"].append(float(lr_schedule_fn(ep * steps_per_epoch)))
            if verbose:
                print(f"[{time.strftime('%H:%M:%S')}] "
                      f"Epoch {ep+1}/{tc.n_epoch} train {avg_train:.4f} "
                      f"val {val_loss:.4f} ({steps_per_sec:.2f} steps/s)",
                      flush=True)

            is_best = early_stop(val_loss, state, ep)
            if early_stop.early_stop:
                if early_stop.best_state is not None:
                    ckpt_writer.submit(
                        "best_model_early",
                        os.path.join(tc.save_dir, "best_model_early"),
                        early_stop.best_state)
                break

            # periodic sampling + quality metrics (new_scripy.py:851-893);
            # eval_every=0 disables periodic sampling entirely.
            if sampler is not None and tc.eval_every > 0 and (
                    ep % tc.eval_every == 0 or ep == tc.n_epoch - 1):
                real = np.stack([x for x, _ in eval_samples])
                # sample from the EMA shadow when maintained — that is
                # what it exists for (train.ema_decay docstring).
                sample_params = (state.ema_params
                                 if state.ema_params is not None
                                 else state.params)
                for w in cfg.sample.guide_scales:
                    key, sub = jax.random.split(key)
                    t_s = time.time()
                    gen = fetch_tree(sampler(sample_params, state.batch_stats,
                                             sub, jnp.float32(w)))
                    imgs_per_min = len(gen) / max(time.time() - t_s, 1e-9) * 60
                    save_samples(gen, os.path.join(
                        tc.save_dir, f"img_ep{ep}_w{w}.png"), nrow=4,
                        denorm=cfg.sample.denorm)
                    try:
                        qm = img_metrics.evaluate_batch(real, gen)
                        qm.update(guide_scale=w, epoch=ep,
                                  images_per_min=imgs_per_min)
                        metrics_log["img_metrics"].append(qm)
                        if verbose:
                            print(f"  metrics w={w}: " + ", ".join(
                                f"{k}={v:.4f}" for k, v in qm.items()
                                if isinstance(v, float)))
                    except Exception as e:
                        print(f"Quality assessment failed: {e}")

            if ((ep + 1) % tc.save_freq == 0 or ep == tc.n_epoch - 1) \
                    and ep >= tc.min_save_ep:
                save_ckpt(state, ep, train_loss_ema or 0.0)
                last_saved_ep = ep
            if is_best:
                save_ckpt(state, ep, val_loss, is_best=True,
                          host_state=early_stop.best_state)

            with open(os.path.join(metrics_dir, f"metrics_ep{ep}.json"),
                      "w") as f:
                json.dump(_sanitize(metrics_log), f, indent=2)
            last_ep = ep
            if verbose:
                print(f"Epoch time: {time.time() - t_ep:.2f}s")

        # Final save stamped with the ACTUAL last completed epoch (so a
        # later --resume starts at last_ep+1, not n_epoch); skipped when
        # early-stopped (best_model_early holds the state) or when that
        # epoch was already checkpointed in-loop.
        if (not early_stop.early_stop and last_ep >= start_epoch
                and last_ep != last_saved_ep):
            save_ckpt(state, last_ep, train_loss_ema or 0.0)
    finally:
        # drain queued checkpoint writes — also on exceptions, so progress
        # that was already fetched to host still lands on disk
        if verbose and (ckpt_writer._order or ckpt_writer._pending):
            print("Draining pending checkpoint writes...", flush=True)
        ckpt_writer.close()
    if early_stop.best_state is not None:
        state = state.replace(
            params=jax.device_put(early_stop.best_state["params"], p_shard),
        )
        if early_stop.best_state.get("ema_params") is not None:
            state = state.replace(ema_params=jax.device_put(
                early_stop.best_state["ema_params"], p_shard))
        if verbose:
            print(f"Loaded best model (epoch "
                  f"{early_stop.best_state['epoch']}), val loss: "
                  f"{early_stop.best_state['val_loss']:.6f}")
    return state
