"""InceptionV3-JAX: architecture shape checks (weights need user supply)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusionmodel_tpu.metrics.inception import (
    InceptionV3Features,
    convert_torchvision_inception,
)


@pytest.mark.slow
def test_inception_output_shape():
    model = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2048)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    # torchvision inception_v3 trunk (without fc/aux) is ~21.8M params
    assert 20_000_000 < n < 24_000_000, n


def test_convert_structure_roundtrip():
    # Fabricate a mini state dict for one BasicConv2d and check mapping.
    sd = {
        "Conv2d_1a_3x3.conv.weight": np.zeros((32, 3, 3, 3), np.float32),
        "Conv2d_1a_3x3.bn.weight": np.ones((32,), np.float32),
        "Conv2d_1a_3x3.bn.bias": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_mean": np.zeros((32,), np.float32),
        "Conv2d_1a_3x3.bn.running_var": np.ones((32,), np.float32),
        "fc.weight": np.zeros((1000, 2048), np.float32),  # must be dropped
    }
    params, stats = convert_torchvision_inception(sd)
    assert params["Conv2d_1a_3x3"]["conv"]["kernel"].shape == (3, 3, 3, 32)
    assert params["Conv2d_1a_3x3"]["bn"]["scale"].shape == (32,)
    assert stats["Conv2d_1a_3x3"]["bn"]["mean"].shape == (32,)
    assert "fc" not in params
