from diffusionmodel_tpu.ops.resize import upsample_bilinear_align_corners  # noqa: F401
from diffusionmodel_tpu.ops.pool import adaptive_avg_pool_axis  # noqa: F401
