"""Learning-rate schedules matching the reference's per-epoch semantics.

- ``cosine_warm_restarts``: torch CosineAnnealingWarmRestarts(T_0=10,
  T_mult=2, eta_min=3e-5) stepped once per epoch (new_scripy.py:722-724,
  848). Closed form: epoch e lies in cycle i = floor(log2(e/T0 + 1)) of
  length T_i = T0 * 2^i starting at T0*(2^i - 1);
  lr = eta_min + (lr0 - eta_min) * (1 + cos(pi * t_cur / T_i)) / 2.
- ``linear_decay``: lr0 * (1 - ep/n_epoch) set at each epoch start
  (MNIST_script.py:334).

Schedules are functions of the *optimizer step count*; pass
``steps_per_epoch`` so the per-epoch stepping is reproduced exactly while
remaining jit-traceable (no host round-trip per step).
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_warm_restarts(lr0: float, steps_per_epoch: int, t0: int = 10,
                         t_mult: int = 2, eta_min: float = 3e-5):
    assert t_mult == 2, "closed form implemented for T_mult=2 (reference value)"

    def schedule(count):
        epoch = count // steps_per_epoch
        e = epoch.astype(jnp.float32) if hasattr(epoch, "astype") else float(epoch)
        i = jnp.floor(jnp.log2(e / t0 + 1.0))
        start = t0 * (2.0 ** i - 1.0)
        t_i = t0 * 2.0 ** i
        t_cur = e - start
        return eta_min + (lr0 - eta_min) * (1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0

    return schedule


def linear_decay(lr0: float, steps_per_epoch: int, n_epoch: int):
    def schedule(count):
        epoch = count // steps_per_epoch
        e = epoch.astype(jnp.float32) if hasattr(epoch, "astype") else float(epoch)
        return lr0 * (1.0 - e / n_epoch)

    return schedule


def constant(lr0: float, *_):
    def schedule(count):
        return jnp.asarray(lr0, dtype=jnp.float32)

    return schedule


def build_schedule(kind: str, lr0: float, steps_per_epoch: int, *, n_epoch: int,
                   t0: int = 10, t_mult: int = 2, eta_min: float = 3e-5):
    if kind == "cosine_warm_restarts":
        return cosine_warm_restarts(lr0, steps_per_epoch, t0, t_mult, eta_min)
    if kind == "linear":
        return linear_decay(lr0, steps_per_epoch, n_epoch)
    if kind == "none":
        return constant(lr0)
    raise ValueError(f"unknown lr schedule {kind!r}")
