"""Error types for zen-tpu.

TPU-native analog of the reference's ``zen::ZgException``
(reference: libzen/libzen/zen.h:8-12) — parameter validation raises,
runtime backend errors propagate as native JAX/XLA errors.
"""


class ZenError(ValueError):
    """Raised on invalid configuration or parameters."""
