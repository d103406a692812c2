"""Persistent XLA compilation cache.

The fused offline cascade and the streaming block steps compile in
seconds-to-tens-of-seconds; the reference pays nothing comparable
(nvcc compiles ahead of time). The JAX persistent compilation cache
closes that gap across process restarts: the second `zen offline`
invocation of a given (config, length-bucket) starts in ~5 s instead
of recompiling.

Library users opt in with zen_tpu.enable_compilation_cache(); the CLI
and the bench harness enable it automatically. Set ZEN_TPU_CACHE_DIR
to relocate (or ZEN_TPU_CACHE_DIR=0 to disable).
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.expanduser("~"), ".cache", "zen-tpu", "xla"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable the on-disk XLA executable cache. Returns the directory
    used, or None if disabled via ZEN_TPU_CACHE_DIR=0."""
    import jax

    env = os.environ.get("ZEN_TPU_CACHE_DIR")
    if env == "0":
        return None
    path = cache_dir or env or _DEFAULT
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        # read-only HOME (or an unwritable override): the cache is an
        # optimization, not a requirement — run uncached rather than
        # breaking every CLI command including `zen version`.
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
