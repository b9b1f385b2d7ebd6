from diffusionmodel_tpu.data.crack_dataset import (  # noqa: F401
    CrackDataset,
    build_attn_mask,
    stratified_split,
)
from diffusionmodel_tpu.data.loader import BatchLoader  # noqa: F401
from diffusionmodel_tpu.data.image_folder import (  # noqa: F401
    ImageFolderDataset,
    SyntheticImageDataset,
)
