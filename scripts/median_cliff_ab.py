"""One-off A/B instrument for the 512-stream median cliff (round-4).

Decomposes the serving_bound 'median' leg into its two kernels (time
tap-median on [S,H+B,bins] histories; frequency sliding median on the
row-folded [S*B, bins] block) and times each on hardware at several
stream counts under each layout policy, so the super-linear term can
be pinned to a kernel x layout instead of the combined leg.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="64,256,512")
    ap.add_argument("--layouts", default="auto,lane,sublane")
    ap.add_argument("--which", default="time,freq,transpose")
    args = ap.parse_args()

    import jax

    from zen_tpu.runtime.platform import pin_platform

    pin_platform()

    import jax.numpy as jnp

    from zen_tpu import HPRConfig
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE
    from zen_tpu.engine.spectral import freq_filtered, num_bins, time_filtered_tail
    from zen_tpu.drivers.realtime import resolve_multistream_fft_impl
    from zen_tpu.runtime.profiling import scan_slope_ms
    from zen_tpu.runtime.xla_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    B, hop = 32, 256
    base = HPRConfig(fs=44100.0, hop=hop, beta=2.0, causal=True,
                     outputs=OUTPUT_PERCUSSIVE)
    which = args.which.split(",")
    rows = []
    for S in (int(s) for s in args.streams.split(",")):
        cfg = resolve_multistream_fft_impl(base, S)
        H, bins = cfg.time_history, num_bins(cfg)
        rng = np.random.default_rng(0)
        f0 = jnp.asarray(
            np.abs(rng.standard_normal((S, H + B, bins))).astype(np.float32))
        n1, n2 = (64, 512) if S * B * hop < (1 << 20) else (16, 128)

        def time_leg(feats):
            new = jax.vmap(lambda fs_: time_filtered_tail(fs_, cfg, H))(feats)
            return jnp.concatenate(
                [feats[:, B:, :], feats[:, H:, :] + 1e-12 * new], axis=1)

        def freq_leg(feats):
            new = jax.vmap(lambda fs_: freq_filtered(fs_[H:, :], cfg))(feats)
            return jnp.concatenate(
                [feats[:, B:, :], feats[:, H:, :] + 1e-12 * new], axis=1)

        def transpose_leg(feats):
            # the sublane route's data movement alone: fold + transpose
            # + transpose back, no median network
            tail = feats[:, H:, :]
            xt = jnp.swapaxes(tail.reshape(S * B, bins)[None], -1, -2)
            y = jnp.swapaxes(xt, -1, -2)[0].reshape(S, B, bins)
            return jnp.concatenate(
                [feats[:, B:, :], feats[:, H:, :] + 1e-12 * y], axis=1)

        legs = {"time": time_leg, "freq": freq_leg,
                "transpose": transpose_leg}
        for name in which:
            for lay in args.layouts.split(","):
                if name == "transpose" and lay != "auto":
                    continue
                os.environ["ZEN_TPU_MEDIAN_LAYOUT"] = lay
                # layout env is read inside the entry; force fresh jit
                jax.clear_caches()
                us = scan_slope_ms(legs[name], f0, n1, n2) * 1e3
                rows.append({"S": S, "leg": name, "layout": lay,
                             "us_per_step": round(us, 1)})
                print(f"S={S:4d} {name:10s} {lay:8s} {us:9.1f} us/step",
                      flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
