"""Torch-compatible parameter initializers.

PyTorch's Conv2d/Linear default init is kaiming_uniform(a=sqrt(5)), which
reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weights and biases.
Matching it keeps from-scratch training dynamics comparable to the reference
(loss curves, early-stop epochs) without loading converted weights.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _fan_in_conv(shape) -> int:
    # flax conv kernel shape: (kh, kw, in_features, out_features)
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    return int(shape[-2]) * receptive


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = _fan_in_conv(shape)
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    # flax dense kernel shape: (in_features, out_features)
    fan_in = int(shape[0])
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init
