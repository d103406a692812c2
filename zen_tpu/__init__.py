"""zen-tpu: a TPU-native harmonic/percussive/residual source
separation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
sevagh/Zen (real-time capable median-filtering HPSS/HPR + SSE,
reference mounted at /root/reference), redesigned TPU-first:

* batched framewise spectral engine instead of a per-hop GPU loop
  (engine/spectral.py) — each filtered frame computed exactly once;
* static tap-offset filters instead of NPP ROI/anchor plumbing
  (ops/median.py, ops/box.py), with jnp reference and Pallas fast paths;
* streaming as a carried pytree state + jitted block step
  (drivers/realtime.py) — no host round-trips per hop;
* pod-scale execution via jax.sharding meshes: channel data-parallel,
  time-block sequence-parallel with halo exchange (zen_tpu/parallel).
"""

import os as _os

if _os.environ.get("ZEN_TPU_PLATFORM"):
    # The repo's explicit platform knob (docs/API.md): honor it for
    # plain library imports too, not just the CLI/bench entry points —
    # on images that export JAX_PLATFORMS=axon globally, a library
    # user asking for cpu would otherwise silently initialize the TPU
    # plugin (and hang when the tunnel is down). Opt-in only: without
    # the env var set, importing zen_tpu never touches jax config.
    from .runtime.platform import pin_platform as _pin_platform

    _pin_platform()

from .engine.config import (  # noqa: F401
    OUTPUT_ALL,
    OUTPUT_HARMONIC,
    OUTPUT_PERCUSSIVE,
    OUTPUT_RESIDUAL,
    HPRConfig,
)
from .errors import ZenError  # noqa: F401
from .drivers.offline import HPRIOffline, hpr_separate  # noqa: F401
from .drivers.realtime import (  # noqa: F401
    HPRRealtime,
    MultiStreamHPR,
    block_step,
    init_state,
)
from .runtime.xla_cache import enable_compilation_cache  # noqa: F401

__version__ = "0.1.0"
