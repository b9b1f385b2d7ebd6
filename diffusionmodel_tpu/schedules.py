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

All math is float32 on purpose — parity is defined in fp32.
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


def ddpm_schedules(beta1: float, beta2: float, T: int) -> Dict[str, jnp.ndarray]:
    """Precompute the 7 DDPM schedule buffers, each of shape [T+1], float32."""
    assert 0.0 < beta1 < beta2 < 1.0, "betas must satisfy 0 < beta1 < beta2 < 1"

    t = jnp.arange(0, T + 1, dtype=jnp.float32)
    beta_t = (beta2 - beta1) * t / T + beta1
    sqrt_beta_t = jnp.sqrt(beta_t)
    alpha_t = 1.0 - beta_t
    log_alpha_t = jnp.log(alpha_t)
    alphabar_t = jnp.exp(jnp.cumsum(log_alpha_t, axis=0))

    sqrtab = jnp.sqrt(alphabar_t)
    oneover_sqrta = 1.0 / jnp.sqrt(alpha_t)
    sqrtmab = jnp.sqrt(1.0 - alphabar_t)
    mab_over_sqrtmab = (1.0 - alpha_t) / sqrtmab

    return {
        "alpha_t": alpha_t,
        "oneover_sqrta": oneover_sqrta,
        "sqrt_beta_t": sqrt_beta_t,
        "alphabar_t": alphabar_t,
        "sqrtab": sqrtab,
        "sqrtmab": sqrtmab,
        "mab_over_sqrtmab": mab_over_sqrtmab,
    }


def ddpm_schedules_np(beta1: float, beta2: float, T: int) -> Dict[str, np.ndarray]:
    """NumPy twin of :func:`ddpm_schedules` (host-side golden reference)."""
    assert 0.0 < beta1 < beta2 < 1.0
    t = np.arange(0, T + 1, dtype=np.float32)
    beta_t = ((beta2 - beta1) * t / T + beta1).astype(np.float32)
    sqrt_beta_t = np.sqrt(beta_t)
    alpha_t = (1.0 - beta_t).astype(np.float32)
    alphabar_t = np.exp(np.cumsum(np.log(alpha_t), axis=0)).astype(np.float32)
    return {
        "alpha_t": alpha_t,
        "oneover_sqrta": (1.0 / np.sqrt(alpha_t)).astype(np.float32),
        "sqrt_beta_t": sqrt_beta_t,
        "alphabar_t": alphabar_t,
        "sqrtab": np.sqrt(alphabar_t).astype(np.float32),
        "sqrtmab": np.sqrt(1.0 - alphabar_t).astype(np.float32),
        "mab_over_sqrtmab": ((1.0 - alpha_t) / np.sqrt(1.0 - alphabar_t)).astype(
            np.float32
        ),
    }
