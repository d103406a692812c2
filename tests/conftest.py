"""Test configuration: run the suite on a simulated 8-device CPU mesh.

Mirrors the reference's strategy of using the CPU backend as the
oracle for the GPU backend (fftw.test.cu) — here the CPU JAX backend
is the oracle platform and also hosts the multi-device sharding tests
(SURVEY.md §4: xla_force_host_platform_device_count).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
