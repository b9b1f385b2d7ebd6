from diffusionmodel_tpu.metrics.image_metrics import (  # noqa: F401
    ImageMetrics,
    kid_from_feats,
    polynomial_mmd2,
)
