"""Frozen configuration dataclasses + named presets.

Mirrors every field of the reference's ``Cfg`` class (new_scripy.py:22-67)
plus the hardcoded configs of the three legacy scripts, expressed as named
presets (the four BASELINE.json configs):

- ``"full"``    — new_scripy.py v2.0 ContextUnet (CoordAttn+SE+LocalEnhancer)
- ``"old"``     — scripy_old.py v1.x (no LocalEnhancer, mask weights {0.5,1,1.5})
- ``"mnist"``   — MNIST_script.py v1.0 (28x28, 2-level U-Net, CPU-runnable)
- ``"custom"``  — custom_dataset.py v1.5 (128px, CBAM variant)

Quirk flags (SURVEY.md section 2.10) default to reference-faithful behavior
where the reference is runnable and to the documented fix where it is not:

- Q1 ``cfg_fixed_orientation``: the v2.0 sampler computes
  ``eps = (1+w)*eps_uncond - w*eps_cond`` (inverted CFG). False = as-written.
- Q3 ``local_enhancer_spatial_mask``: the reference wires the [B, n_classes]
  context mask into LocalEnhancer, which cannot broadcast against a
  [B,C,256,256] feature map (crashes as written). We wire the *spatial*
  attention mask (the evident intent) when available; during sampling no
  spatial mask exists and the enhancer branch is gated off (identity).
- Q5 ``co_flip_mask``: reference RandomHorizontalFlip flips the image only,
  not the attention mask (leaving the loss-weight map misaligned with the
  flipped crack). True (default since round 5, on a measured A/B) co-flips
  both; False = faithful.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple


@dataclass(frozen=True)
class ModelConfig:
    """Denoiser network configuration (ContextUnet family)."""

    # context_unet_v2 | context_unet_v1 | mnist_unet | cbam_unet | ddpm_unet
    arch: str = "context_unet_v2"
    in_ch: int = 3                 # new_scripy.py:25  IN_CH
    n_feat: int = 192              # new_scripy.py:24  N_FEAT
    n_classes: int = 5
    img_size: int = 256            # new_scripy.py:65  IMG_SIZE
    # "group" is the TPU-idiomatic default (BASELINE north star); "batch"
    # reproduces the reference's BatchNorm2d semantics (SURVEY Q2).
    norm: str = "group"
    group_norm_groups: int = 8
    attn_reduction: int = 16       # CoordAttn / SEBlock reduction (new_scripy.py:71,144)
    use_coord_attn: bool = True
    use_se: bool = True
    use_local_enhancer: bool = True
    # MNIST_script.py:170 flips the context mask and multiplies the kept
    # one-hot by -1; v1.5/v2.0 multiply by the keep-mask directly.
    mnist_style_ctx_flip: bool = False
    # Use fused Pallas kernels for CoordAttn/SEBlock/LocalEnhancer when on
    # TPU. Retired as a perf lever in round 5 (RESULTS.md kernels section:
    # three campaigns measured parity-to-noise vs XLA's own fusion and the
    # flagship-resolution sites fall back); kept as a tested capability.
    use_pallas: bool = False
    # Compute the UnetUp bilinear-x2 + conv3x3 pair through the exact
    # algebraic fusion (ops/fused_upconv.py): the conv runs at half the
    # rows and the 4x-resolution intermediate is never materialized —
    # same parameters, checkpoint-compatible. Measured by
    # benchmarks/bench_up4.py (VERDICT r3 #2).
    fused_upsample: bool = False
    # Compute dtype ("float32" or "bfloat16"); params always float32.
    dtype: str = "float32"
    # ddpm_unet (annotated-DDPM family) only — reference/ddpm/unet.py:308-417:
    # channel multipliers per level, attention per level, res blocks per level,
    # dropout inside residual blocks (experiment.py trains with 0.1).
    ch_mults: Tuple[int, ...] = (1, 2, 2, 4)
    is_attn: Tuple[bool, ...] = (False, False, True, True)
    n_blocks: int = 2
    dropout: float = 0.1


@dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion process: schedule, loss weighting, CFG."""

    n_T: int = 700                      # new_scripy.py:26  N_T
    beta1: float = 1e-4                 # new_scripy.py:27  BETAS
    beta2: float = 0.02
    drop_prob: float = 0.1              # new_scripy.py:28  DROP_PROB
    # Attention-mask loss weighting (new_scripy.py:31-36).
    high_thresh: float = 1.2
    mid_thresh: float = 0.8
    high_weight: float = 3.0
    mid_weight: float = 1.0
    low_weight: float = 0.5
    feat_consist_weight: float = 2.0
    use_weighted_loss: bool = True      # False => plain MSE (MNIST/old variants)
    # "reference": arange(0,T+1)/T schedule, t ~ U[1,T] (new_scripy.py:358-384).
    # "textbook": linspace/cumprod schedule, t ~ U[0,T), plain MSE — the
    # vendored labml formulation (reference/ddpm/__init__.py:187-192, 257-287).
    schedule_family: str = "reference"
    # Quirk flags — see module docstring.
    cfg_fixed_orientation: bool = False  # Q1
    local_enhancer_spatial_mask: bool = True  # Q3 (fix; literal wiring crashes)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization & loop parameters (new_scripy.py:38-53)."""

    batch_size: int = 4
    accum_steps: int = 4
    lr: float = 1e-4
    weight_decay: float = 1e-5
    n_epoch: int = 400
    save_freq: int = 50
    min_save_ep: int = 200
    patience: int = 10
    min_delta: float = 1e-3
    val_split: float = 0.1
    grad_clip: float = 1.0
    # CosineAnnealingWarmRestarts(T_0=10, T_mult=2, eta_min=3e-5)
    # (new_scripy.py:722-724); "linear" = MNIST_script.py:334 decay; "none".
    lr_schedule: str = "cosine_warm_restarts"
    sgdr_t0: int = 10
    sgdr_t_mult: int = 2
    sgdr_eta_min: float = 3e-5
    optimizer: str = "adamw"  # "adam" for mnist preset
    seed: int = 0
    split_seed: int = 42      # StratifiedShuffleSplit(random_state=42), new_scripy.py:630
    eval_every: int = 5       # sample+metrics every 5 epochs (new_scripy.py:851)
    eval_sample_count: int = 32
    save_dir: str = "./output/diffusion/"
    # Mesh axes: (data, model). Model axis > 1 enables tensor sharding of the
    # widest conv/linear kernels across chips.
    mesh_data: int = -1  # -1 => all available devices
    mesh_model: int = 1
    # Spatial (H-axis) sharding of big-image forwards — the context-parallel
    # analogue (SURVEY 5.7); >1 makes sampling shard H across chips.
    mesh_spatial: int = 1
    # ZeRO-1: partition optimizer state (Adam mu/nu) across the 'data'
    # axis (parallel.opt_state_shardings). No-op on one device; on a
    # data-parallel mesh it cuts per-chip moment HBM by the data-axis
    # size (GSPMD turns the grad psum into a reduce-scatter + params
    # all-gather). Off by default: at flagship scale on a single chip
    # there is nothing to shard over.
    zero1: bool = False
    # Data augmentation parity flags.
    hflip_prob: float = 0.5   # new_scripy.py:685
    # Q5: the reference flips the image only, leaving the attention mask
    # misaligned with the flipped crack (new_scripy.py:683-688). Round-5
    # measured A/B (QUALITY.json r4a75 vs r5b75coflip, identical recipe):
    # co-flipping wins ~1.5 fid_proxy / halves KID / triples SSIM, so the
    # fix is the default; False restores the reference-faithful behavior.
    co_flip_mask: bool = True
    # Rematerialize activations in the backward pass (jax.checkpoint) —
    # the 353M-param flagship at 256px does not fit 16GB HBM without it.
    remat: bool = True
    # Selective-remat policy when remat=True: "full" recomputes the whole
    # denoiser in the backward; "dots" saves dot_general outputs
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable — a NO-OP
    # for conv-dominated UNets, see benchmarks/PROBE_MFU.json mb2r1d);
    # "conv" saves conv_general_dilated AND dot_general outputs and
    # recomputes only the elementwise/norm tail — less recompute than
    # "full", less HBM than remat=False (VERDICT r3 #1 / ADVICE r4).
    remat_policy: str = "full"
    # lax.scan unroll factor for the in-graph gradient-accumulation loop.
    # 1 = rolled (one compiled body, smallest program); accum_steps =
    # fully unrolled (XLA may overlap/pipeline micro-batches better at
    # the cost of compile time). Probed by benchmarks/probe_mfu.py.
    accum_unroll: int = 1
    # Storage dtype of the scan-carried gradient accumulator. "bfloat16"
    # halves the carry's HBM traffic per micro-batch (2.8 GB -> 1.4 GB
    # each way for the 353M flagship); per-micro-batch grads still
    # compute in fp32 and the mean is restored to fp32 before Adam.
    grad_accum_dtype: str = "float32"
    # Storage dtype of Adam's first moment (optax mu_dtype). "bfloat16"
    # halves mu's HBM footprint (~0.7 GB for the 353M flagship); the EMA
    # update itself still computes in fp32 before the storage cast. The
    # second moment stays fp32 (b2=0.999 increments underflow bf16's
    # 8-bit mantissa). Resume casts restored moments to this dtype.
    moment_dtype: str = "bfloat16"
    # Observability (SURVEY 5.1/5.2): capture a jax.profiler trace of one
    # early epoch into this directory; debug_nans enables jax's NaN checker
    # (the reference has neither — it only prints wall-clock per epoch).
    profile_dir: str = ""
    profile_epoch: int = 1
    debug_nans: bool = False
    # Exponential moving average of params (beyond-reference extra; the
    # reference samples from the live training params, so 0.0 = off is the
    # parity default). >0 (e.g. 0.9995) maintains a shadow param tree
    # updated in-graph each optimizer step with warmup
    # min(ema_decay, (1+step)/(10+step)); checkpoints carry it and
    # sampling/eval prefer it — standard DDPM practice (Ho et al. use
    # 0.9999) that markedly improves sample quality at convergence.
    ema_decay: float = 0.0
    # Minimum epochs between EarlyStop best-state device fetches. 0 =
    # snapshot every improvement (reference behavior, new_scripy.py:
    # 596-605 — cheap on a local GPU). On the tunneled TPU a full-model
    # fetch costs ~a minute, and early epochs improve every epoch, so
    # long runs set e.g. 10: best_loss/patience bookkeeping stays exact
    # per-epoch, only the params snapshot is rate-limited.
    best_snapshot_min_epochs: int = 0


@dataclass(frozen=True)
class SampleConfig:
    """Generation sweep parameters (new_scripy.py:61-62, 1292-1321)."""

    guide_scales: Tuple[float, ...] = (2.0, 4.0)
    samples_per_class: int = 3
    eval_quality: bool = True
    sample_dir: str = "./output/samples/"
    denorm: bool = True
    # "ancestral" = the reference's full-T loop; "ddim" = fast subsequence
    # sampling (upgrade), with ddim_steps network evaluations; "dpmpp" =
    # DPM-Solver++(2M) (beyond-reference extra): second-order multistep
    # ODE solver reaching DDIM-50-class quality in dpm_steps (~15-20)
    # evaluations — the throughput/serving sampler.
    sampler: str = "ancestral"
    ddim_steps: int = 50
    ddim_eta: float = 0.0
    # "uniform" | "quad" tau spacing (reference ddim.py:42-50 offers both).
    ddim_discretize: str = "uniform"
    dpm_steps: int = 20


@dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    diffusion: DiffusionConfig = DiffusionConfig()
    train: TrainConfig = TrainConfig()
    sample: SampleConfig = SampleConfig()
    data_root: str = "./cropped_images/"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def preset(name: str, **overrides) -> Config:
    """Named presets for the four BASELINE.json reference configs."""
    if name == "full":
        cfg = Config()
    elif name == "old":
        # scripy_old.py:539-548: batch 1, no LocalEnhancer, mask weights
        # high=1.5 (scripy_old.py:514-526), plain weighted thresholds.
        cfg = Config(
            model=ModelConfig(arch="context_unet_v1", use_local_enhancer=False),
            diffusion=DiffusionConfig(
                high_weight=1.5, feat_consist_weight=0.0,
                local_enhancer_spatial_mask=False,
            ),
            train=TrainConfig(batch_size=1, accum_steps=1, n_epoch=300),
        )
    elif name == "mnist":
        # MNIST_script.py:303-334.
        cfg = Config(
            model=ModelConfig(
                arch="mnist_unet", in_ch=1, n_feat=128, n_classes=10,
                img_size=28, use_coord_attn=False, use_se=False,
                use_local_enhancer=False, mnist_style_ctx_flip=True,
                norm="batch",
            ),
            diffusion=DiffusionConfig(
                n_T=400, use_weighted_loss=False, feat_consist_weight=0.0,
            ),
            train=TrainConfig(
                batch_size=256, accum_steps=1, lr=1e-4, weight_decay=0.0,
                n_epoch=20, lr_schedule="linear", optimizer="adam",
                grad_clip=0.0,
            ),
            sample=SampleConfig(guide_scales=(0.0, 0.5, 2.0), samples_per_class=4),
        )
    elif name == "custom":
        # custom_dataset.py v1.5: 128px, n_feat=128, n_T=500.
        cfg = Config(
            model=ModelConfig(arch="cbam_unet", n_feat=128, img_size=128),
            diffusion=DiffusionConfig(n_T=500, high_weight=1.5),
            train=TrainConfig(batch_size=8, accum_steps=4),
        )
    elif name == "labml":
        # The vendored annotated-DDPM experiment (reference/ddpm/
        # experiment.py:34-99): 64ch UNet with ch_mults (1,2,2,4) /
        # attn (F,F,T,T), T=1000 linspace/cumprod schedule, plain MSE,
        # Adam 2e-5, batch 64, CelebA-style 64px image folder (or 32px
        # MNIST) — unconditional (n_classes=1).
        cfg = Config(
            model=ModelConfig(
                arch="ddpm_unet", in_ch=3, n_feat=64, n_classes=1,
                img_size=64, use_coord_attn=False, use_se=False,
                use_local_enhancer=False,
            ),
            diffusion=DiffusionConfig(
                n_T=1000, beta1=1e-4, beta2=0.02,
                schedule_family="textbook", use_weighted_loss=False,
                feat_consist_weight=0.0, drop_prob=0.0,
            ),
            train=TrainConfig(
                batch_size=64, accum_steps=1, lr=2e-5, weight_decay=0.0,
                n_epoch=100, lr_schedule="none", optimizer="adam",
                grad_clip=0.0, hflip_prob=0.0,
            ),
            # denorm=False: this family trains/samples in [0,1] (labml
            # ToTensor semantics) — x*0.5+0.5 would wash artifacts out.
            sample=SampleConfig(guide_scales=(0.0,), samples_per_class=16,
                                denorm=False),
        )
    elif name == "generation":
        # Generation sweep config: guidance 2/4/6, 5 samples/class, full eval.
        cfg = Config(
            sample=SampleConfig(guide_scales=(2.0, 4.0, 6.0), samples_per_class=5)
        )
    else:
        raise ValueError(f"unknown preset: {name!r}")
    for k, v in overrides.items():
        obj = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        if len(parts) == 1:
            cfg = dataclasses.replace(cfg, **{k: v})
        else:
            sub = dataclasses.replace(obj, **{parts[-1]: v})
            outer = cfg
            # rebuild nested frozen dataclasses (depth <= 2 in practice)
            cfg = dataclasses.replace(outer, **{parts[0]: _replace_path(getattr(outer, parts[0]), parts[1:], v)})
    return cfg


def _replace_path(obj, parts, value):
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    return dataclasses.replace(
        obj, **{parts[0]: _replace_path(getattr(obj, parts[0]), parts[1:], value)}
    )
