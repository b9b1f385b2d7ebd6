from diffusionmodel_tpu.nn.blocks import (  # noqa: F401
    EmbedFC,
    LocalEnhancer,
    ResConvBlock,
    SEBlock,
    UnetDown,
    UnetUp,
)
from diffusionmodel_tpu.nn.coord_attn import CoordAttn  # noqa: F401
from diffusionmodel_tpu.nn.context_unet import ContextUnet  # noqa: F401
from diffusionmodel_tpu.nn.mnist_unet import MnistContextUnet  # noqa: F401
from diffusionmodel_tpu.nn.factory import build_model  # noqa: F401
