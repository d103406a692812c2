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
