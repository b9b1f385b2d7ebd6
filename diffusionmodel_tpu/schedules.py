"""DDPM noise-schedule precomputation.

Bit-parity target: the reference formulation at ``new_scripy.py:358-384``
(identical in scripy_old.py:327-353, MNIST_script.py:190-216,
custom_dataset.py:255-281):

    beta_t    = (beta2-beta1) * arange(0, T+1)/T + beta1      (linear, T+1 pts)
    alphabar  = exp(cumsum(log(1 - beta_t)))                  (index 0..T)

Note the endpoint semantics: index 0 carries beta1 and the buffers have
length T+1; training draws t ~ U[1, T] and the sampler walks i = T..1. This
differs from the textbook ``linspace(beta1, beta2, T)`` + ``cumprod`` used by
the vendored labml DDPM (reference/ddpm/__init__.py:187-192).

The buffers are float32 (parity is defined in fp32), but the math runs
host-side in float64 with ONE final rounding: a correctly-rounded fp32
result is within an ulp of any framework's fp32 evaluation of the same
formula and — unlike computing on-device — does not inherit the TPU's
approximate transcendentals (exp/log there cost ~1e-5 absolute error in the
cumulative product, 300+ ulps).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


SCHEDULE_KEYS = (
    "alpha_t",
    "oneover_sqrta",
    "sqrt_beta_t",
    "alphabar_t",
    "sqrtab",
    "sqrtmab",
    "mab_over_sqrtmab",
)


def ddpm_schedules_np(beta1: float, beta2: float, T: int) -> Dict[str, np.ndarray]:
    """Host-side schedule computation: float64 math, one rounding to fp32."""
    assert 0.0 < beta1 < beta2 < 1.0, "betas must satisfy 0 < beta1 < beta2 < 1"
    t = np.arange(0, T + 1, dtype=np.float64)
    beta_t = (beta2 - beta1) * t / T + beta1
    sqrt_beta_t = np.sqrt(beta_t)
    alpha_t = 1.0 - beta_t
    alphabar_t = np.exp(np.cumsum(np.log(alpha_t), axis=0))
    out64 = {
        "alpha_t": alpha_t,
        "oneover_sqrta": 1.0 / np.sqrt(alpha_t),
        "sqrt_beta_t": sqrt_beta_t,
        "alphabar_t": alphabar_t,
        "sqrtab": np.sqrt(alphabar_t),
        "sqrtmab": np.sqrt(1.0 - alphabar_t),
        "mab_over_sqrtmab": (1.0 - alpha_t) / np.sqrt(1.0 - alphabar_t),
    }
    return {k: v.astype(np.float32) for k, v in out64.items()}


def ddpm_schedules(beta1: float, beta2: float, T: int) -> Dict[str, jnp.ndarray]:
    """Precompute the 7 DDPM schedule buffers, each of shape [T+1], float32."""
    return {k: jnp.asarray(v) for k, v in ddpm_schedules_np(beta1, beta2, T).items()}
