from diffusionmodel_tpu.models.annotated_ddpm.unet import DdpmUNet  # noqa: F401
from diffusionmodel_tpu.models.annotated_ddpm.diffusion import (  # noqa: F401
    DenoiseDiffusion,
    textbook_schedule,
)
