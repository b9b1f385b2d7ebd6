from diffusionmodel_tpu.metrics.image_metrics import ImageMetrics  # noqa: F401
