"""Test config: force an 8-virtual-device CPU platform BEFORE jax imports.

This is the standard JAX recipe for testing Mesh/pjit sharding without real
multi-chip hardware (SURVEY.md section 4e). bench.py and the CLI do NOT go
through this path and use the real TPU.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

from diffusionmodel_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
