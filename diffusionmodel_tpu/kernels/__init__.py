"""Fused Pallas TPU kernels for the hot attention blocks (BASELINE north
star: CoordAttn, SEBlock, LocalEnhancer as fused kernels), with plain-XLA
fallbacks selected automatically off-TPU."""

from diffusionmodel_tpu.kernels.se_block import se_block_fused  # noqa: F401
from diffusionmodel_tpu.kernels.coord_attn import coord_attn_fused  # noqa: F401
