"""In-session A/B of the round-5 serving pair kernel.

A = production block step (pair kernel: tap slab assembled in VMEM
    from (hist, fresh); the concatenated history slab never exists
    in HBM).
B = the pre-pair path, forced by shimming time_filtered_tail_pair to
    materialize concat([hist, fresh]) and run the one-input kernel —
    exactly what the block step did before commit 7b46cb3.

Both legs run interleaved per pass with the repo's slope-timer
protocol (chained lax.scan, readback-synced, chain lengths scaled to
the per-step work), so tunnel congestion drift hits both equally and
the ratio is meaningful within this artifact. Usage:

    python benches/pair_ab.py --streams 256,512 --passes 2 \
        --out benches/pair_ab_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="256,512")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--hop", type=int, default=256)
    ap.add_argument("--block-hops", type=int, default=32)
    ap.add_argument("--fs", type=float, default=44100.0)
    ap.add_argument("--stream-state", default="f32")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench as bench_mod
    from zen_tpu.runtime.platform import wait_for_device

    wait_for_device()

    import zen_tpu.drivers.realtime as rt
    from zen_tpu.engine.config import HPRConfig, OUTPUT_PERCUSSIVE
    from zen_tpu.engine.spectral import time_filtered_tail

    import jax.numpy as jnp

    def materialized_shim(hist, fresh, cfg):
        feats = jnp.concatenate([hist, fresh.astype(hist.dtype)], axis=-2)
        return time_filtered_tail(feats, cfg, hist.shape[-2])

    pair_fn = rt.time_filtered_tail_pair
    counts = [int(s) for s in args.streams.split(",")]
    cfg = HPRConfig(
        fs=args.fs, hop=args.hop, beta=2.0, causal=True,
        outputs=OUTPUT_PERCUSSIVE, stream_state=args.stream_state,
    )

    from benches.scaling import _chain_lengths

    rows = {s: {"pair": [], "materialized": []} for s in counts}
    for pi in range(args.passes):
        for s in counts:
            n1, n2 = _chain_lengths(s * args.block_hops * args.hop)
            for leg, fn in (("pair", pair_fn),
                            ("materialized", materialized_shim)):
                rt.time_filtered_tail_pair = fn
                try:
                    r = bench_mod.time_multistream(
                        cfg, s, args.block_hops, n1, n2
                    )
                finally:
                    rt.time_filtered_tail_pair = pair_fn
                rows[s][leg].append(r)
                print(
                    f"pass {pi + 1}/{args.passes} S={s:4d} {leg:12s}: "
                    f"{r / 1e6:9.2f} Msamples/s",
                    flush=True,
                )

    result = {
        "round": 5,
        "config": {
            "hop": args.hop, "block_hops": args.block_hops, "fs": args.fs,
            "stream_state": args.stream_state, "passes": args.passes,
        },
        "legs": {},
        "methodology": (
            "interleaved per pass (pair then materialized per stream "
            "count); slope-timed chained lax.scan via "
            "bench.time_multistream; speedup = per-pass ratio, "
            "summarized mean +- half-spread. Single-session artifact."
        ),
    }
    for s in counts:
        ratios = [
            p / m for p, m in zip(rows[s]["pair"], rows[s]["materialized"])
        ]
        result["legs"][s] = {
            "pair_msps": [round(v / 1e6, 2) for v in rows[s]["pair"]],
            "materialized_msps": [
                round(v / 1e6, 2) for v in rows[s]["materialized"]
            ],
            "speedup_mean": round(sum(ratios) / len(ratios), 4),
            "speedup_half_spread": round(
                (max(ratios) - min(ratios)) / 2, 4
            ),
        }
        print(
            f"S={s:4d}: pair/materialized = "
            f"{result['legs'][s]['speedup_mean']:.3f} "
            f"± {result['legs'][s]['speedup_half_spread']:.3f}",
            flush=True,
        )
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
