"""diffusionmodel_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-design of the
Shen-Yuuu/DiffusionModel enhanced conditional DDPM framework.

The reference is a single-GPU PyTorch research repo (see SURVEY.md). This
package rebuilds its full capability set TPU-first:

- NHWC tensor layout, bf16-friendly compute, XLA-fused conv blocks.
- The T-step CFG sampling loop is a single ``jax.lax.scan`` (vs the
  reference's host-driven Python loop, ``new_scripy.py:457-477``).
- Data/tensor parallelism via ``jax.sharding.Mesh`` + NamedSharding, with
  XLA-inserted collectives (the reference has no distributed support).
- Hot attention blocks (CoordAttn / SEBlock / LocalEnhancer) have fused
  Pallas TPU kernels with plain-XLA fallbacks.
"""

__version__ = "0.1.0"

from diffusionmodel_tpu.config import (  # noqa: F401
    DiffusionConfig,
    ModelConfig,
    SampleConfig,
    TrainConfig,
    Config,
    preset,
)
from diffusionmodel_tpu.schedules import ddpm_schedules  # noqa: F401
