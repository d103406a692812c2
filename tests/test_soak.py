"""Smoke for the stability-soak instrument (benches/soak.py)."""
import jax.numpy as jnp

from zen_tpu.engine.config import OUTPUT_ALL, HPRConfig


def test_soak_run_builds_and_stays_finite():
    from benches.soak import build_soak_run

    cfg = HPRConfig(fs=8000.0, hop=32, causal=True, outputs=OUTPUT_ALL)
    run, init_carry = build_soak_run(
        cfg, n_streams=2, block_hops=4, steps=3
    )
    state, prev, stats = init_carry()
    for _ in range(2):
        state, prev, stats = run(state, prev, stats)
    mx, bad = stats
    assert int(bad) == 0
    assert jnp.isfinite(mx) and float(mx) > 0.0
