"""The one shared JAX-platform-selection policy for every entry point.

Every entry script (CLI, benches, instruments, the driver's
__graft_entry__) must decide which backend to initialize under the
same awkward constraint: this image exports ``JAX_PLATFORMS=axon``
globally, but the axon TPU plugin both IGNORES that env var for its
own selection and fails discovery under any ``PYTHONPATH`` setting —
so the env var can neither signal user intent nor be honored
verbatim.  Before this module existed each entry point re-derived the
policy independently and they diverged (one honored JAX_PLATFORMS
verbatim, one ignored ZEN_TPU_PLATFORM, ...).

Call :func:`pin_platform` once, BEFORE anything initializes a JAX
backend (the first ``jax.devices()`` / compiled computation).  After
backend init the config update raises ``RuntimeError`` and the call
degrades to a no-op.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time


def pin_platform(force: str | None = None) -> str | None:
    """Resolve and pin the JAX platform; returns what was pinned.

    Policy ladder (first match wins):

    1. ``force`` — the caller's unconditional choice (e.g. the fuzz
       instrument always runs on the CPU oracle platform).
    2. ``ZEN_TPU_PLATFORM`` env var — this repo's explicit user knob
       (deliberately not JAX_PLATFORMS, which the image exports for
       everyone and the axon plugin ignores anyway).
    3. ``XLA_FLAGS`` containing ``xla_force_host_platform_device_count``
       — a virtual host mesh only exists on the CPU backend, so the
       flag implies CPU intent (the driver's multichip dryrun env).
    4. ``JAX_PLATFORMS=cpu`` exactly — an explicit CPU ask; pinned via
       ``jax.config`` because accelerator plugins ignore the env var.
    5. otherwise: leave auto-discovery alone (axon/TPU when the plugin
       registered, CPU otherwise) and return ``None``.

    Independently of the ladder, any ``JAX_PLATFORMS`` value naming
    the axon alias is scrubbed — from the environment (so subprocesses
    inherit auto-discovery) and from the value already latched into
    ``jax.config`` by an earlier ``import jax`` — because a pinned
    ``'axon'`` crashes backend init whenever plugin discovery failed.
    """
    env_platforms = os.environ.get("JAX_PLATFORMS", "")
    if "axon" in env_platforms.split(","):
        os.environ.pop("JAX_PLATFORMS", None)
        import jax

        try:
            latched = jax.config.jax_platforms or ""
            if "axon" in latched.split(","):
                jax.config.update("jax_platforms", None)
        except (AttributeError, RuntimeError):
            pass  # backend already initialized; nothing to fix
        env_platforms = ""

    if force:
        choice = force
    elif os.environ.get("ZEN_TPU_PLATFORM"):
        choice = os.environ["ZEN_TPU_PLATFORM"]
    elif "xla_force_host_platform_device_count" in os.environ.get(
        "XLA_FLAGS", ""
    ):
        choice = "cpu"
    elif env_platforms == "cpu":
        choice = "cpu"
    else:
        return None

    import jax

    try:
        jax.config.update("jax_platforms", choice)
    except RuntimeError:
        return None  # backend already initialized (in-process caller)
    return choice


def wait_for_device(
    probe_timeout_s: float = 180.0,
    retries: int = 3,
    sleep_s: float = 90.0,
    _probe_argv: list[str] | None = None,
) -> bool:
    """Fail-fast readiness probe for the accelerator backend.

    The axon TPU relay can hang backend init indefinitely when the
    tunnel is down (observed: ``jax.devices()`` parked in
    clock_nanosleep for 10+ minutes) — a bench that touches the device
    directly then hangs with no diagnostic instead of failing.  Backend
    init cannot be interrupted in-process, so this probes it in a
    SUBPROCESS under a timeout, retrying across transient congestion
    windows.  Returns True once a probe initializes a backend; False
    when every attempt timed out (callers should exit with a
    diagnostic rather than proceed to a hang).

    Skipped (immediately True) when the platform is already pinned to
    cpu — the host backend cannot hang.  ``_probe_argv`` is a test
    seam replacing the real probe command; supplying it also bypasses
    the cpu short-circuit (the point of a fake probe is to exercise
    the probe machinery).
    """
    if _probe_argv is None:
        import jax

        try:
            if (jax.config.jax_platforms or "") == "cpu":
                return True
        except AttributeError:
            pass
        if os.environ.get("ZEN_TPU_PLATFORM") == "cpu":
            return True

    argv = _probe_argv or [
        sys.executable,
        "-c",
        "import jax; jax.devices(); print('ZEN_PROBE_OK')",
    ]
    for attempt in range(1, retries + 1):
        try:
            # pin_platform() already scrubbed the axon alias from
            # os.environ, which the probe inherits.
            out = subprocess.run(
                argv,
                capture_output=True,
                text=True,
                timeout=probe_timeout_s,
            )
            if _probe_argv is None and "ZEN_PROBE_OK" not in out.stdout:
                raise subprocess.TimeoutExpired(argv, probe_timeout_s)
            if _probe_argv is not None and out.returncode != 0:
                raise subprocess.TimeoutExpired(argv, probe_timeout_s)
            return True
        except subprocess.TimeoutExpired:
            print(
                f"device probe {attempt}/{retries} timed out after "
                f"{probe_timeout_s:.0f}s (axon tunnel down/congested?)",
                file=sys.stderr,
                flush=True,
            )
            if attempt < retries:
                time.sleep(sleep_s)
    return False
