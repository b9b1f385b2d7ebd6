"""Environment sanity check (the CUDA_is_available.py:1-6 equivalent).

    python -m diffusionmodel_tpu.device_check
"""

from __future__ import annotations


def main() -> None:
    import jax

    devices = jax.devices()
    print(f"JAX version: {jax.__version__}")
    print(f"Default backend: {jax.default_backend()}")
    print(f"Device count: {len(devices)}")
    for d in devices:
        print(f"  {d} (platform={d.platform})")


if __name__ == "__main__":
    main()
