from diffusionmodel_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    image_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
    replicated,
)
