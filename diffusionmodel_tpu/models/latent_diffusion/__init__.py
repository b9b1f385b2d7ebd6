from diffusionmodel_tpu.models.latent_diffusion.autoencoder import (  # noqa: F401
    Autoencoder,
    Decoder,
    Encoder,
    GaussianDistribution,
)
from diffusionmodel_tpu.models.latent_diffusion.unet import UNetModel  # noqa: F401
from diffusionmodel_tpu.models.latent_diffusion.latent_diffusion import (  # noqa: F401
    CLIPTextEmbedder,
    LatentDiffusion,
)
