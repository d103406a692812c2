"""Round-4 cliff hunt, part 2: is the 512-stream median blowup a
data-volume effect or a single-launch effect?

A/Bs on hardware:
  whole   one vmapped call over S streams (production shape)
  split2  the same work as two sequential S/2 calls
  flat    the same work presented as one UNbatched call (fold S into
          rows for freq; fold S into the kernel's c grid axis for time
          via explicit reshape — what custom_vmap does anyway)
  net     the Pallas kernel alone on the exact folded shapes, no
          surrounding concat/history plumbing
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
    from zen_tpu.engine.spectral import num_bins, time_filtered_tail
    from zen_tpu.drivers.realtime import resolve_multistream_fft_impl
    from zen_tpu.ops.median_pallas import (
        sliding_median_last_axis_pallas,
        tap_median_time_pallas,
    )
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
        k_t = cfg.time_filter_len
        k_f = cfg.freq_filter_len
        rng = np.random.default_rng(0)
        f0 = jnp.asarray(
            np.abs(rng.standard_normal((S, H + B, bins))).astype(np.float32))
        n1, n2 = (64, 512) if S * B * hop < (1 << 20) else (16, 128)

        def t_whole(feats):
            new = jax.vmap(lambda fs_: time_filtered_tail(fs_, cfg, H))(feats)
            return feats + 1e-12 * jnp.pad(
                new, ((0, 0), (H, 0), (0, 0)))

        def t_split2(feats):
            h = S // 2
            n1_ = jax.vmap(lambda fs_: time_filtered_tail(fs_, cfg, H))(
                feats[:h])
            n2_ = jax.vmap(lambda fs_: time_filtered_tail(fs_, cfg, H))(
                feats[h:])
            new = jnp.concatenate([n1_, n2_], axis=0)
            return feats + 1e-12 * jnp.pad(new, ((0, 0), (H, 0), (0, 0)))

        # time-direction kernel alone, exact production parameters
        x_time = f0

        def t_net(feats):
            out = tap_median_time_pallas(
                feats, tuple(cfg.time_offsets), 0.0, H)
            return feats + 1e-12 * jnp.pad(
                out, ((0, 0), (H, 0), (0, 0)))

        # freq: folded rows problem [S*B, bins + k - 1]
        pad = k_f // 2
        xf = jnp.asarray(np.abs(
            rng.standard_normal((S * B, bins + 2 * pad))).astype(np.float32))

        def f_flat(x):
            return x + 1e-12 * jnp.pad(
                sliding_median_last_axis_pallas(x, k_f),
                ((0, 0), (0, 2 * pad)))

        def f_split2(x):
            h = (S // 2) * B
            y1 = sliding_median_last_axis_pallas(x[:h], k_f)
            y2 = sliding_median_last_axis_pallas(x[h:], k_f)
            return x + 1e-12 * jnp.pad(
                jnp.concatenate([y1, y2], 0), ((0, 0), (0, 2 * pad)))

        for name, fn, arg in (
            ("time_whole", t_whole, f0),
            ("time_split2", t_split2, f0),
            ("time_net", t_net, x_time),
            ("freq_flat", f_flat, xf),
            ("freq_split2", f_split2, xf),
        ):
            us = scan_slope_ms(fn, arg, n1, n2) * 1e3
            rows.append({"S": S, "leg": name, "us_per_step": round(us, 1)})
            print(f"S={S:4d} {name:12s} {us:9.1f} us/step", flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
