"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Mirrors the reference's strategy of using the CPU backend as the
oracle for the GPU backend (fftw.test.cu) — here the CPU JAX backend
is the oracle platform and also hosts the multi-device sharding tests
(SURVEY.md §4: xla_force_host_platform_device_count).

Note: this environment's jax build ignores the JAX_PLATFORMS env var
(the axon TPU plugin wins), so the platform is pinned via jax.config,
which must happen before any backend initialization.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Pin the CPU platform (this image exports JAX_PLATFORMS=axon
# globally, so that env var cannot signal intent). For a manual
# hardware run of e.g. tests/test_pallas.py, opt in explicitly:
#   ZEN_TPU_TEST_PLATFORM=axon pytest tests/test_pallas.py
jax.config.update(
    "jax_platforms", os.environ.get("ZEN_TPU_TEST_PLATFORM", "cpu")
)
