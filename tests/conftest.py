"""Test bootstrap: force an 8-virtual-device CPU JAX platform.

This environment's ``sitecustomize`` (on PYTHONPATH) imports jax and
registers the tunneled TPU backend in every python process, so env vars
like JAX_PLATFORMS set here are too late. But the backend is not
*initialized* until first use, so config-level overrides still take effect:
``jax_platforms=cpu`` + ``jax_num_cpu_devices=8`` gives the standard
8-virtual-device CPU setup for Mesh/pjit sharding tests. bench.py and the
CLI do NOT go through this path and keep the real TPU.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

if not jax._src.xla_bridge._backends:  # not yet initialized
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8, (
    "tests require 8 virtual CPU devices; run via `python -m pytest tests/` "
    "from a fresh interpreter"
)

import pytest  # noqa: E402

from diffusionmodel_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
