"""Round-4 cliff hunt, part 3: pin the time-median kernel's
super-linear term at S=512.

Probes, all on production shapes [S, H+B, bins] (hop-256 serving):
  pallas      production tap_median_time_pallas (tail form)
  pallas_pp   the same kernel on a PRE-padded, tile-aligned input
              (isolates the XLA pad/copy from the kernel)
  xla         the jnp sort-based sliding median (median_impl=xla path)
  fold_lane   time median computed with streams folded onto the LANE
              axis: transpose to [H+B, S*bins], run the same kernel as
              ONE c=1 problem (sliding axis stays on rows), transpose
              back — trades 512 small grid programs for a transpose
              plus lane tiling.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from zen_tpu.runtime.platform import pin_platform

    pin_platform()

    import jax.numpy as jnp

    from zen_tpu import HPRConfig
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE
    from zen_tpu.engine.spectral import num_bins
    from zen_tpu.drivers.realtime import resolve_multistream_fft_impl
    from zen_tpu.ops.median import sliding_median
    from zen_tpu.ops.median_pallas import tap_median_time_pallas
    from zen_tpu.runtime.profiling import scan_slope_ms
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, hop = 32, 256
    base = HPRConfig(fs=44100.0, hop=hop, beta=2.0, causal=True,
                     outputs=OUTPUT_PERCUSSIVE)
    rows = []
    for S in (64, 256, 512):
        cfg = resolve_multistream_fft_impl(base, S)
        H, bins = cfg.time_history, num_bins(cfg)
        offs = tuple(cfg.time_offsets)
        rng = np.random.default_rng(0)
        f0 = jnp.asarray(
            np.abs(rng.standard_normal((S, H + B, bins))).astype(np.float32))
        n1, n2 = (64, 512) if S * B * hop < (1 << 20) else (16, 128)

        def ret(feats, new):
            return feats + 1e-12 * jnp.pad(new, ((0, 0), (H, 0), (0, 0)))

        def pallas_leg(feats):
            return ret(feats, tap_median_time_pallas(feats, offs, 0.0, H))

        # pre-padded: pad lanes to 640 once OUTSIDE the timed fn
        fpad = jnp.pad(f0, ((0, 0), (0, 0), (0, 640 - bins)))

        def pallas_pp_leg(feats):
            out = tap_median_time_pallas(feats, offs, 0.0, H)
            return feats + 1e-12 * jnp.pad(
                out, ((0, 0), (H, 0), (0, 0)))

        def xla_leg(feats):
            out = sliding_median(feats, offs, -2, "zero", fill=0.0)[
                :, H:, :]
            return ret(feats, out)

        def fold_lane_leg(feats):
            xt = jnp.transpose(feats, (1, 0, 2)).reshape(
                H + B, S * bins)[None]
            yt = tap_median_time_pallas(xt, offs, 0.0, H)
            out = yt[0].reshape(B, S, bins).transpose(1, 0, 2)
            return ret(feats, out)

        legs = [("pallas", pallas_leg, f0),
                ("pallas_pp", pallas_pp_leg, fpad),
                ("xla", xla_leg, f0),
                ("fold_lane", fold_lane_leg, f0)]
        for name, fn, arg in legs:
            us = scan_slope_ms(fn, arg, n1, n2) * 1e3
            rows.append({"S": S, "leg": name, "us_per_step": round(us, 1)})
            print(f"S={S:4d} {name:10s} {us:9.1f} us/step", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
