"""Training: state, pjit-able train/eval steps with in-graph gradient
accumulation, early stopping.

Re-design of the reference train loop internals (new_scripy.py:767-848):

- AMP + GradScaler (new_scripy.py:390, 784-802) is replaced by bf16-friendly
  XLA compute — no loss scaling needed on TPU; loss math stays fp32.
- The 4-step gradient accumulation (new_scripy.py:795-803) happens inside
  the jitted step as a ``lax.scan`` over micro-batches — one XLA program per
  optimizer step, no host round-trips.
- Gradient clipping (global norm 1.0) is applied to the accumulated grads,
  matching the reference's unscale-then-clip ordering.
- Optimizer: AdamW(lr, wd) + CosineAnnealingWarmRestarts per-epoch schedule
  (new_scripy.py:715-724) expressed as a step-count schedule.
- Early stopping (patience 10, min_delta 1e-3, best-state stashing) mirrors
  EarlyStop (new_scripy.py:587-620) host-side.
"""

from __future__ import annotations


from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from diffusionmodel_tpu.config import Config
from diffusionmodel_tpu.diffusion import Schedule, train_loss
from diffusionmodel_tpu.lr_schedules import build_schedule


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any  # empty dict when the model has no BatchNorm
    opt_state: Any
    # Shadow EMA of params (train.ema_decay > 0), else None. None is an
    # empty pytree, so ema-off states trace/donate exactly as before.
    ema_params: Any = None


def build_optimizer(cfg: Config, steps_per_epoch: int) -> optax.GradientTransformation:
    tc = cfg.train
    schedule = build_schedule(
        tc.lr_schedule, tc.lr, max(steps_per_epoch, 1), n_epoch=tc.n_epoch,
        t0=tc.sgdr_t0, t_mult=tc.sgdr_t_mult, eta_min=tc.sgdr_eta_min,
    )
    mu_dtype = jnp.bfloat16 if tc.moment_dtype == "bfloat16" else None
    if tc.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=tc.weight_decay,
                          mu_dtype=mu_dtype)
    elif tc.optimizer == "adam":
        opt = optax.adam(schedule, mu_dtype=mu_dtype)
    else:
        raise ValueError(f"unknown optimizer {tc.optimizer!r}")
    chain = []
    if tc.grad_clip and tc.grad_clip > 0:
        chain.append(optax.clip_by_global_norm(tc.grad_clip))
    chain.append(opt)
    return optax.chain(*chain)


def create_train_state(model, cfg: Config, key, steps_per_epoch: int,
                       sample_batch: Optional[Dict[str, jnp.ndarray]] = None
                       ) -> Tuple[TrainState, optax.GradientTransformation]:
    mc = cfg.model
    b = 2
    if sample_batch is None:
        sample_batch = {
            "x": jnp.zeros((b, mc.img_size, mc.img_size, mc.in_ch)),
            "c": jnp.zeros((b,), jnp.int32),
            "mask": jnp.ones((b, mc.img_size, mc.img_size)),
        }
    # jit the init: one compiled program instead of per-param dispatches —
    # essential on remote/tunneled TPU backends where eager dispatch of a
    # 353M-param init costs minutes. A "dropout" stream is supplied for
    # models that use nn.Dropout in train mode (ddpm_unet family).
    pkey, dkey = jax.random.split(key)
    variables = jax.jit(model.init, static_argnames=("train",))(
        {"params": pkey, "dropout": dkey},
        sample_batch["x"], sample_batch["c"],
        jnp.full((sample_batch["x"].shape[0],), 0.5),
        jnp.ones((sample_batch["x"].shape[0],)),
        attn_mask=sample_batch.get("mask"), train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = build_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=(jax.tree.map(jnp.array, params)
                    if cfg.train.ema_decay > 0 else None),
    )
    return state, tx


def decode_wire(x, mask, dc, normalize: bool):
    """On-device decode of the compact uint8 wire batch format.

    BatchLoader ships x as uint8 RGB and mask as a uint8 class index
    {0,1,2} — 16x fewer host->device bytes than fp32 (12.6 -> 0.8 MB per
    flagship step), which matters when the device is remote/tunneled or
    when many hosts feed a pod over DCN. This expands them inside the
    jitted step — bit-identical to the host-side float path (same fp32
    ops, /255 then (x-.5)/.5) and fused into the first conv by XLA. Float
    batches pass through untouched (dtype is trace-time static), so tests
    and callers that build float batches directly are unaffected. SURVEY
    north star: "preprocessing ... run on-device"."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
        if normalize:
            x = (x - 0.5) / 0.5
    if mask is not None and mask.dtype == jnp.uint8:
        values = jnp.asarray(
            [dc.low_weight, dc.mid_weight, dc.high_weight], jnp.float32)
        mask = values[mask]
    return x, mask


def _make_loss_fn(model, sched: Schedule, cfg: Config, has_bn: bool,
                  normalize_u8: bool = True):
    dc = cfg.diffusion

    def net(params, batch_stats, x_t, cc, t, ctx, attn, dkey):
        variables = {"params": params}
        rngs = {"dropout": dkey}  # unused streams are ignored by flax
        if has_bn:
            variables["batch_stats"] = batch_stats
            out, upd = model.apply(
                variables, x_t, cc, t, ctx, attn_mask=attn, train=True,
                mutable=["batch_stats"], rngs=rngs,
            )
            return out, upd["batch_stats"]
        return model.apply(variables, x_t, cc, t, ctx, attn_mask=attn,
                           train=True, rngs=rngs), batch_stats

    if cfg.train.remat:
        # rematerialize the denoiser in the backward pass: trades ~1/3 more
        # FLOPs for fitting the 353M-param 256px training step in HBM.
        # remat_policy="dots" keeps MXU outputs and recomputes only the
        # cheap elementwise/norm ops (selective remat, VERDICT r3 #1).
        if cfg.train.remat_policy == "dots":
            net = jax.checkpoint(
                net,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        elif cfg.train.remat_policy == "conv":
            # Conv-aware selective remat (ADVICE r4: the stock "dots"
            # policy only matches dot_general, a NO-OP for this
            # conv-dominated UNet). Saves every convolution/matmul output
            # (the MXU work) and recomputes only the elementwise/norm
            # tail (GN, GELU, SE gating — VPU ops) in the backward pass:
            # less recompute than "full" remat, roughly half the
            # activation HBM of remat=False, which is what can unlock
            # micro-batch >= 2 at the flagship size.
            net = jax.checkpoint(
                net,
                policy=lambda prim, *_, **__: prim.name in (
                    "conv_general_dilated", "dot_general"))
        else:
            net = jax.checkpoint(net)

    def loss_fn(params, batch_stats, key, x, c, mask):
        cell = {}
        x, mask = decode_wire(x, mask, dc, normalize_u8)
        lkey, dkey = jax.random.split(key)

        def apply_fn(x_t, cc, t, ctx, attn, train):
            out, new_bs = net(params, batch_stats, x_t, cc, t, ctx, attn,
                              dkey)
            cell["bs"] = new_bs
            return out

        loss = train_loss(apply_fn, lkey, x, c, mask, sched, dc, train=True)
        return loss, cell.get("bs", batch_stats)

    return loss_fn


def make_train_step(model, sched: Schedule, cfg: Config,
                    tx: optax.GradientTransformation, has_bn: bool,
                    normalize_u8: bool = True):
    """Returns step(state, batch, key) -> (state, loss).

    batch: x [A, B, H, W, C] (float, or uint8 wire format); c [A, B];
    mask [A, B, H, W] or None (float weights, or uint8 class indices) —
    A = accum_steps micro-batches scanned in-graph.
    """
    loss_fn = _make_loss_fn(model, sched, cfg, has_bn, normalize_u8)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # grad_accum_dtype="bfloat16" stores the scan-carried accumulator in
    # bf16: halves the carry's HBM read+write per micro-batch (~2.8 GB ->
    # 1.4 GB each way for the 353M flagship). The per-micro-batch grads
    # are still computed in fp32; only the running sum is stored narrow,
    # and the mean is taken in fp32 before the optimizer (VERDICT r3 #1).
    acc_dtype = jnp.dtype(cfg.train.grad_accum_dtype)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        a = batch["x"].shape[0]
        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, acc_dtype), state.params)

        def body(carry, mb):
            grads_acc, bs, loss_acc, key = carry
            key, sub = jax.random.split(key)
            (loss, new_bs), grads = grad_fn(
                state.params, bs, sub, mb["x"], mb["c"], mb.get("mask")
            )
            grads_acc = jax.tree.map(
                lambda acc, g: (acc + g.astype(acc_dtype)).astype(acc_dtype),
                grads_acc, grads)
            return (grads_acc, new_bs, loss_acc + loss, key), None

        (grads, new_bs, loss_sum, _), _ = jax.lax.scan(
            body, (zero_grads, state.batch_stats, jnp.zeros(()), key), batch,
            unroll=min(max(cfg.train.accum_unroll, 1), a),
        )
        grads = jax.tree.map(
            lambda g, p: (g.astype(jnp.float32) / a).astype(p.dtype),
            grads, state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if new_ema is not None:
            # Warmed-up decay (Ho et al. convention): early steps track the
            # params closely, converging to ema_decay. fp32 lerp regardless
            # of param storage dtype, cast back for storage.
            d = jnp.minimum(cfg.train.ema_decay,
                            (1.0 + state.step) / (10.0 + state.step))
            new_ema = jax.tree.map(
                lambda e, p: (e.astype(jnp.float32) * d
                              + p.astype(jnp.float32) * (1.0 - d)
                              ).astype(e.dtype),
                new_ema, new_params)
        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=new_ema,
        )
        return new_state, loss_sum / a

    return step


def make_eval_step(model, sched: Schedule, cfg: Config, has_bn: bool,
                   normalize_u8: bool = True):
    """Validation loss on one (non-accumulated) batch, eval-mode norm."""
    dc = cfg.diffusion

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], key):
        def apply_fn(x_t, cc, t, ctx, attn, train):
            variables = {"params": state.params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
            return model.apply(variables, x_t, cc, t, ctx, attn_mask=attn,
                               train=False)

        x, mask = decode_wire(batch["x"], batch.get("mask"), dc,
                              normalize_u8)
        return train_loss(apply_fn, key, x, batch["c"], mask, sched, dc,
                          train=False)

    return step


class EarlyStop:
    """Patience-based early stopping (new_scripy.py:587-620)."""

    def __init__(self, patience: int = 10, min_delta: float = 1e-3,
                 verbose: bool = True, snapshot_min_epochs: int = 0):
        self.patience = patience
        self.min_delta = min_delta
        self.verbose = verbose
        self.counter = 0
        self.best_loss = float("inf")
        self.early_stop = False
        self.best_state: Optional[dict] = None
        # rate-limit the (expensive on a tunneled device) params fetch;
        # best_loss/patience accounting stays exact per-epoch
        # (config.TrainConfig.best_snapshot_min_epochs)
        self.snapshot_min_epochs = snapshot_min_epochs

    def __call__(self, val_loss: float, state: TrainState, epoch: int) -> bool:
        if val_loss < self.best_loss - self.min_delta:
            self.best_loss = val_loss
            self.counter = 0
            if self.verbose:
                print(f"Val loss improved to {val_loss:.6f}", flush=True)
            if (self.best_state is not None and self.snapshot_min_epochs > 0
                    and epoch - self.best_state["epoch"]
                    < self.snapshot_min_epochs):
                return False  # improved, but snapshot not refreshed yet
            # chunked+threaded fetch (utils/transfer.py): plain
            # device_get costs minutes per improvement on the tunneled
            # platform's slow large-array path.
            from diffusionmodel_tpu.utils.transfer import fetch_tree

            self.best_state = {
                "epoch": epoch,
                "params": fetch_tree(state.params),
                "batch_stats": fetch_tree(state.batch_stats),
                "val_loss": val_loss,
            }
            if state.ema_params is not None:
                self.best_state["ema_params"] = fetch_tree(state.ema_params)
            return True
        self.counter += 1
        if self.verbose:
            print(f"Val loss not improved, patience: {self.counter}/{self.patience}")
        if self.counter >= self.patience:
            self.early_stop = True
            if self.verbose:
                print("Early stopping triggered.")
        return False
