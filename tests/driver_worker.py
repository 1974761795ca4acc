"""Run ``colxlip_tpu.main`` in a FRESH process on the 8-virtual-CPU mesh,
passing argv through verbatim (spawned by subprocess-level driver tests —
e.g. the preemption test, which must deliver real signals to a real process).

Mirrors tests/conftest.py's platform dance: the container's sitecustomize
pre-registers the TPU plugin and ignores JAX_PLATFORMS, so the platform must
be forced via jax.config; the device-count XLA flag is overridden rather
than inherited (the pytest parent exports its own).
"""
import os
import sys


def main() -> int:
    flags = " ".join(
        f for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from colxlip_tpu.main import main as driver_main

    return driver_main(sys.argv[1:])


if __name__ == "__main__":
    sys.exit(main())
