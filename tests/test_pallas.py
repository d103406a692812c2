"""Pallas kernel parity tests.

These need a real TPU (Mosaic kernels don't run on the CPU backend
without interpret mode); by default they run in interpret mode on CPU
so CI stays hermetic, and run compiled when a TPU is present.
Run manually on hardware: ZEN_TPU_TEST_PLATFORM=axon pytest tests/test_pallas.py
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zen_tpu.ops.median import sliding_median


def _interp():
    return jax.default_backend() != "tpu"


@pytest.fixture(autouse=True)
def maybe_interpret(monkeypatch):
    if _interp():
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


@pytest.mark.parametrize("t,f,k", [(16, 200, 5), (24, 513, 13), (8, 130, 47)])
def test_freq_kernel_matches_reference(t, f, k):
    from zen_tpu.ops.median_pallas import sliding_median_last_axis_pallas

    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, f)).astype(np.float32)
    fm = k // 2
    want = np.asarray(
        sliding_median(jnp.asarray(x), list(range(-fm, fm + 1)), -1, "reflect")
    )
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (fm, fm)), mode="reflect")
    got = np.asarray(sliding_median_last_axis_pallas(xp, k))
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("mode", ["reflect", "wrap", "edge"])
@pytest.mark.parametrize("shape,k", [((4, 32, 513), 13), ((256, 130), 5)])
def test_freq_fused_matches_padded(shape, k, mode, dtype):
    """The boundary-fused kernel (pad + transposes in VMEM) is
    bit-identical to jnp.pad + the padded kernel, f32 and bf16,
    including under vmap (the serving multi-stream form)."""
    from zen_tpu.ops import median_pallas as mp

    rng = np.random.default_rng(7)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32), dt)
    assert mp.fused_freq_supported(x.shape, k, x.dtype)
    fused = np.asarray(
        mp.sliding_median_last_axis_fused(x, k, mode).astype(jnp.float32)
    )
    fm = (k - 1) // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(fm, fm)]
    ref = np.asarray(
        mp.sliding_median_last_axis_pallas(
            jnp.pad(x, pad, mode=mode), k
        ).astype(jnp.float32)
    )
    np.testing.assert_array_equal(fused, ref)
    # the routed entry picks the fused path for this shape
    routed = np.asarray(
        mp.sliding_median_boundary_pallas(x, k, mode).astype(jnp.float32)
    )
    np.testing.assert_array_equal(routed, ref)
    if x.ndim == 3:
        vm = np.asarray(
            jax.vmap(
                lambda xx: mp.sliding_median_boundary_pallas(xx, k, mode)
            )(x).astype(jnp.float32)
        )
        np.testing.assert_array_equal(vm, ref)


def test_freq_boundary_falls_back_when_rows_dont_tile():
    """Odd folded row counts can't take the fused route; the boundary
    entry must still produce the padded kernel's result."""
    from zen_tpu.ops import median_pallas as mp

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((37, 200)).astype(np.float32))
    assert not mp.fused_freq_supported(x.shape, 5, x.dtype)
    got = np.asarray(mp.sliding_median_boundary_pallas(x, 5, "reflect"))
    ref = np.asarray(
        mp.sliding_median_last_axis_pallas(
            jnp.pad(x, ((0, 0), (2, 2)), mode="reflect"), 5
        )
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "offsets",
    [tuple(range(-5, 6)), tuple(range(-11, 0)), (-3, -2, -1, 0, 0, 0, 0)],
)
def test_time_kernel_matches_reference(offsets):
    from zen_tpu.ops.median_pallas import tap_median_time_pallas

    rng = np.random.default_rng(1)
    x = rng.standard_normal((40, 200)).astype(np.float32)
    want = np.asarray(
        sliding_median(jnp.asarray(x), list(offsets), -2, "zero")
    )
    got = np.asarray(tap_median_time_pallas(jnp.asarray(x), offsets))
    np.testing.assert_allclose(got, want)


def test_time_kernel_inf_fill():
    from zen_tpu.ops.median_pallas import tap_median_time_pallas

    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 130)).astype(np.float32)
    offsets = tuple(range(-3, 4))
    want = np.asarray(
        sliding_median(
            jnp.asarray(x), list(offsets), -2, "zero", fill=np.inf
        )
    )
    got = np.asarray(
        tap_median_time_pallas(jnp.asarray(x), offsets, fill=float("inf"))
    )
    np.testing.assert_allclose(got, want)


def test_sharded_engine_with_pallas_impl():
    """Pallas kernels inside shard_map (the TPU production path) —
    must trace and match the unsharded engine."""
    if len(jax.devices()) < 8:
        pytest.skip("needs an 8-device mesh (single-chip hardware run)")
    from zen_tpu import HPRConfig, OUTPUT_ALL
    from zen_tpu.drivers.offline import hpr_separate
    from zen_tpu.parallel.mesh import make_mesh
    from zen_tpu.parallel.sharded import sharded_separate

    rng = np.random.default_rng(4)
    audio = rng.standard_normal((2, 480)).astype(np.float32)
    cfg = HPRConfig(
        fs=1000.0, hop=8, causal=False, outputs=OUTPUT_ALL,
        median_impl="pallas",
    )
    mesh = make_mesh({"dp": 2, "sp": 4})
    got = sharded_separate(audio, cfg, mesh)
    want = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-3
        )


def test_engine_pallas_impl_matches_xla():
    """Full engine with median_impl='pallas' == 'xla' (interpret mode
    on CPU, compiled on TPU)."""
    from zen_tpu import HPRConfig, OUTPUT_ALL
    from zen_tpu.drivers.offline import hpr_separate

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(600).astype(np.float32)
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = HPRConfig(
            fs=1000.0,
            hop=8,
            causal=False,
            outputs=OUTPUT_ALL,
            median_impl=impl,
        )
        outs[impl] = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive", "residual"):
        np.testing.assert_allclose(
            np.asarray(outs["pallas"][k]),
            np.asarray(outs["xla"][k]),
            rtol=1e-5,
            atol=1e-3,
        )


@pytest.mark.parametrize("start", [0, 5, 21])
def test_time_kernel_start_offset(start):
    """tap_median_time_pallas(start=s) == full result's trailing rows."""
    from zen_tpu.ops.median_pallas import tap_median_time_pallas

    rng = np.random.default_rng(6)
    x = rng.standard_normal((40, 200)).astype(np.float32)
    offsets = tuple(range(-5, 1))
    full = np.asarray(tap_median_time_pallas(jnp.asarray(x), offsets))
    tail = np.asarray(
        tap_median_time_pallas(jnp.asarray(x), offsets, start=start)
    )
    np.testing.assert_allclose(tail, full[start:])


@pytest.mark.parametrize(
    "c,t,f,k,start",
    [
        (256, 24, 130, 9, 8),    # the serving shape family
        (256, 40, 513, 17, 8),   # hop-256 bins, production tap count
        (320, 12, 64, 5, 0),     # no history offset, tiny tiles
        (256, 33, 257, 7, 21),   # odd everything
    ],
)
def test_time_kernel_piped_wide_batch_parity(c, t, f, k, start):
    """The wide-serving pipelined specialization (c >= 256, single
    t/f tile — see _TIME_PIPED_MIN_BATCH) is bit-identical to the
    manual-DMA grid path it replaces on those shapes."""
    from zen_tpu.ops import median_pallas as mp

    rng = np.random.default_rng(11)
    offsets = tuple(range(-(k - 1), 1))
    x = rng.standard_normal((c, t, f)).astype(np.float32)
    piped = np.asarray(mp.tap_median_time_pallas(jnp.asarray(x), offsets, 0.0, start))
    # force the general path by lowering the threshold out of reach
    import unittest.mock as mock

    with mock.patch.object(mp, "_TIME_PIPED_MIN_BATCH", 10**9):
        general = np.asarray(
            mp.tap_median_time_pallas(jnp.asarray(x), offsets, 0.0, start)
        )
    np.testing.assert_array_equal(piped, general)


def test_time_kernel_piped_bf16_parity():
    """stream_state='bf16': the piped kernel runs natively on bf16
    histories; median is selection, so results must equal the XLA
    sort path on the same bf16 input exactly."""
    from zen_tpu.ops import median_pallas as mp
    from zen_tpu.ops.median import sliding_median

    rng = np.random.default_rng(13)
    offsets = tuple(range(-8, 1))
    x = rng.standard_normal((256, 24, 130)).astype(np.float32)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    piped = np.asarray(
        mp.tap_median_time_pallas(xb, offsets, 0.0, 8).astype(jnp.float32)
    )
    ref = np.asarray(
        sliding_median(xb, offsets, -2, "zero", fill=0.0)[:, 8:, :].astype(jnp.float32)
    )
    np.testing.assert_array_equal(piped, ref)


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize(
    "c,h,b,f,offsets",
    [
        # the production serving shape (B >= H, split causal taps)
        (8, 21, 32, 513, (-21, -20, -19, -18, -17, -5, -4, -3, -2, -1, 0)),
        (3, 5, 8, 130, tuple(range(-5, 1))),
        (1, 7, 7, 64, (-7, -3, 0)),
    ],
)
def test_time_pair_kernel_matches_concat(c, h, b, f, offsets, dtype):
    """The two-input (hist, fresh) serving kernel — which assembles
    the tap slab in VMEM so the per-step history concat never hits
    HBM — is bit-identical to the materialized-concat path, f32 and
    bf16, including under vmap (the production multi-stream form)."""
    from zen_tpu.ops import median_pallas as mp

    rng = np.random.default_rng(17)
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    hist = jnp.asarray(rng.standard_normal((c, h, f)).astype(np.float32), dt)
    fresh = jnp.asarray(rng.standard_normal((c, b, f)).astype(np.float32), dt)
    pair = np.asarray(
        mp.tap_median_time_pair_pallas(hist, fresh, offsets).astype(
            jnp.float32
        )
    )
    feats = jnp.concatenate([hist, fresh], axis=-2)
    ref = np.asarray(
        mp.tap_median_time_pallas(feats, offsets, 0.0, h).astype(jnp.float32)
    )
    np.testing.assert_array_equal(pair, ref)
    vm = np.asarray(
        jax.vmap(
            lambda hh, xx: mp.tap_median_time_pair_pallas(hh, xx, offsets)
        )(hist, fresh).astype(jnp.float32)
    )
    np.testing.assert_array_equal(vm, ref)


def test_time_pair_kernel_wide_batch_fallback(monkeypatch):
    """Above _PAIR_MAX_BATCH the entry materializes the concat and
    routes to the one-input kernel — same bits either way."""
    from zen_tpu.ops import median_pallas as mp

    rng = np.random.default_rng(23)
    offsets = (-5, -3, -1, 0)
    hist = jnp.asarray(rng.standard_normal((6, 5, 130)).astype(np.float32))
    fresh = jnp.asarray(rng.standard_normal((6, 8, 130)).astype(np.float32))
    wide = np.asarray(mp.tap_median_time_pair_pallas(hist, fresh, offsets))
    monkeypatch.setattr(mp, "_PAIR_MAX_BATCH", 4)
    mp._time_pair_entry.cache_clear()
    narrow = np.asarray(mp.tap_median_time_pair_pallas(hist, fresh, offsets))
    mp._time_pair_entry.cache_clear()
    np.testing.assert_array_equal(wide, narrow)


def test_time_pair_kernel_rejects_out_of_range_taps():
    from zen_tpu.ops import median_pallas as mp

    x = jnp.zeros((2, 4, 64))
    with pytest.raises(ValueError):
        mp.tap_median_time_pair_pallas(x, x, (-5, 0))  # reaches past hist
    with pytest.raises(ValueError):
        mp.tap_median_time_pair_pallas(x, x, (-1, 1))  # anticausal tap


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_time_kernel_pipelined_chunks_parity(dtype):
    """t_out > tb routes through the double-buffered grid kernel
    (_time_kernel_pipelined); must match the XLA sort path exactly —
    in both dtypes (the transposed freq route feeds this kernel
    hundreds of row chunks at serving shapes)."""
    from zen_tpu.ops import median_pallas as mp
    from zen_tpu.ops.median import sliding_median

    rng = np.random.default_rng(17)
    offsets = tuple(range(-5, 6))
    x = jnp.asarray(
        rng.standard_normal((600, 200)).astype(np.float32)
    ).astype(dtype)
    got = np.asarray(
        mp.tap_median_time_pallas(x, offsets).astype(jnp.float32)
    )
    ref = np.asarray(
        sliding_median(x, offsets, -2, "zero", fill=0.0).astype(jnp.float32)
    )
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("layout", ["lane", "sublane"])
def test_freq_median_bf16_native_parity(layout):
    """bf16 inputs run the freq kernels natively in BOTH layouts and
    must select exactly the same elements as the f32 kernel on the
    upcast input (median is selection; only storage precision
    changes). Output dtype follows the input."""
    from zen_tpu.ops.median_pallas import sliding_median_last_axis_pallas

    rng = np.random.default_rng(19)
    k, fm = 13, 6
    x = rng.standard_normal((256, 513)).astype(np.float32)
    xb = jnp.pad(
        jnp.asarray(x).astype(jnp.bfloat16), ((0, 0), (fm, fm)),
        mode="reflect",
    )
    got = sliding_median_last_axis_pallas(xb, k, layout=layout)
    assert got.dtype == jnp.bfloat16
    want = sliding_median_last_axis_pallas(
        xb.astype(jnp.float32), k, layout=layout
    )
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)), np.asarray(want)
    )


def test_stream_state_bf16_blocks_close_to_f32():
    """The bf16 serving-state knob quantizes features but must keep
    the stems within the bf16 noise class and the state machinery
    exact (block-size invariance still holds)."""
    from zen_tpu import HPRConfig, OUTPUT_ALL
    from zen_tpu.drivers.realtime import block_step, init_state

    rng = np.random.default_rng(3)
    audio = (rng.standard_normal((6, 256)) * 0.3).astype(np.float32)
    outs = {}
    for ss in ("f32", "bf16"):
        cfg = HPRConfig(fs=44100.0, hop=256, causal=True, outputs=OUTPUT_ALL,
                        stream_state=ss, median_impl="xla")
        st = init_state(cfg)
        ys = []
        for i in range(6):
            st, y = block_step(cfg, st, jnp.asarray(audio[i:i + 1]))
            ys.append(np.asarray(y))
        outs[ss] = np.concatenate(ys, axis=-1)
    a, b = outs["f32"], outs["bf16"]
    assert np.isfinite(b).all()
    err = ((a - b) ** 2).mean()
    sig = (a ** 2).mean()
    snr = 10 * np.log10(sig / err) if err > 0 else np.inf
    assert snr > 25, f"bf16 state too lossy: {snr:.1f} dB"


@pytest.mark.parametrize(
    "hop,border,causal,soft,sse",
    [
        (8, "wrap", False, False, False),
        (8, "wrap", True, False, False),
        (16, "replicate", False, False, False),
        (8, "valid", False, False, False),
        (8, "wrap", False, True, False),
        (8, "wrap", False, False, True),
    ],
)
def test_fast_path_fuzz_matches_reference_impls(hop, border, causal, soft, sse):
    """Fast paths (pallas medians + DFT transforms) == reference impls
    (xla medians + xla fft) across config axes. Interpret mode on CPU;
    the real Mosaic/MXU path under ZEN_TPU_TEST_PLATFORM=axon."""
    from zen_tpu import HPRConfig, OUTPUT_ALL
    from zen_tpu.drivers.offline import hpr_separate
    from zen_tpu.drivers.realtime import HPRRealtime

    rng = np.random.default_rng(13)
    audio = rng.standard_normal(hop * 24).astype(np.float32)
    outs = {}
    for median_impl, fft_impl in (("xla", "xla"), ("pallas", "dft")):
        cfg = HPRConfig(
            fs=1000.0, hop=hop, causal=causal, border=border,
            soft_mask=soft, use_sse=sse, outputs=OUTPUT_ALL,
            median_impl=median_impl, fft_impl=fft_impl,
        )
        if causal:
            rt = HPRRealtime(1000.0, hop, 2.0, outputs=OUTPUT_ALL)
            rt.cfg = cfg
            rt.reset_buffers()
            arr = rt.process_stream(audio, block_hops=6)
            outs[median_impl] = {
                k: arr[i]
                for i, k in enumerate(
                    ("harmonic", "percussive", "residual")
                )
            }
        else:
            outs[median_impl] = {
                k: np.asarray(v) for k, v in hpr_separate(audio, cfg).items()
            }
    for k in ("harmonic", "percussive", "residual"):
        a = np.nan_to_num(outs["xla"][k], posinf=0, neginf=0)
        b = np.nan_to_num(outs["pallas"][k], posinf=0, neginf=0)
        scale = max(1.0, np.abs(a).max())
        # hard-mask bit flips near the beta threshold under the DFT's
        # ~3e-5 transform error can move isolated bins; bound both the
        # typical and the worst-case deviation
        assert np.mean(np.abs(a - b)) / scale < 1e-3, k
        np.testing.assert_allclose(b / scale, a / scale, atol=0.2, err_msg=k)


def test_freq_kernel_batched_fold_parity():
    """The row-fold (leading dims + T -> one row axis) is bit-exact in
    every route: direct 3-D call, jax.vmap (MultiStreamHPR's form),
    fold=False (the round-2 per-stream grid), and both layouts."""
    from zen_tpu.ops.median_pallas import sliding_median_last_axis_pallas

    rng = np.random.default_rng(7)
    k, fm = 13, 6
    x = rng.standard_normal((3, 2, 12, 200)).astype(np.float32)
    want = np.asarray(
        sliding_median(jnp.asarray(x), list(range(-fm, fm + 1)), -1, "reflect")
    )
    xp = jnp.pad(
        jnp.asarray(x), ((0, 0), (0, 0), (0, 0), (fm, fm)), mode="reflect"
    )
    for kw in (
        {},
        {"fold": False},
        {"layout": "lane"},
        {"layout": "sublane"},
    ):
        got = np.asarray(sliding_median_last_axis_pallas(xp, k, **kw))
        np.testing.assert_allclose(got, want, err_msg=str(kw))
    # vmap over the leading axis == direct call (custom_vmap rule)
    got_v = np.asarray(
        jax.vmap(lambda v: sliding_median_last_axis_pallas(v, k))(xp)
    )
    np.testing.assert_allclose(got_v, want)


def test_freq_median_layout_auto_decisions():
    """Pin the data-derived layout crossover (benches/kernels_r02/r03
    CSVs) at the shapes the ENGINE actually produces — a regression
    here means someone changed the heuristic without re-measuring.
    The decision runs on the FULL (batch-folded) shape: leading dims
    multiply into the row count (round-3 row-fold)."""
    import zen_tpu.ops.median_pallas as mp

    cases = [
        # (shape sans freq pad, K) -> expected layout, from the r03
        # interleaved A/Bs (see _auto_layout's docstring for numbers)
        (((32, 2049), 47), "lane"),      # hop-1024 single-stream block
        (((32, 513), 13), "lane"),       # hop-256 single-stream block
        (((631, 513), 13), "sublane"),   # offline pass-2: 1.5-1.8x
        (((128, 513), 13), "sublane"),   # short clips: 2.2-2.5x
        (((4088, 513), 13), "sublane"),  # long pass-2: 1.46x (nocap)
        (((256, 2049), 47), "sublane"),  # short hop-1024 pass: 1.15-1.4x
        (((1023, 2049), 47), "lane"),    # tie band -> simpler layout
        (((2048, 2049), 47), "lane"),    # lane 1.33x at folded serving
        (((4088, 513), 47), "lane"),     # lane 1.56x
        (((40, 8193), 187), "lane"),     # hop-4096 pass-1 (huge K)
        (((4088, 8193), 187), "lane"),   # huge K stays lane at any T
        (((2048, 2049), 13), "sublane"), # long blocked pass: 1.39x
        # serving shapes: 64 streams fold to 2048 rows (r03 A/B)
        (((64, 32, 2049), 47), "lane"),
        (((64, 32, 513), 13), "sublane"),  # 1.2x over r02's lane
    ]
    for (shape, k), want in cases:
        padded = shape[:-1] + (shape[-1] + k - 1,)
        assert mp._auto_layout(k, padded) == want, (shape, k)


def test_exact_c2c_borders_compile_and_run():
    """The exact-C2C transform path (fast_rfft=False — every 'valid'
    and 'replicate' border config) must compile and run on the active
    platform: a TPU backend was observed rejecting some complex-FFT
    scan forms (benches/kernels.py c2c note), and the CPU-only suite
    would never notice if the engine's form regressed the same way.
    Runs on hardware under ZEN_TPU_TEST_PLATFORM=axon."""
    import numpy as np

    from zen_tpu.drivers.offline import HPRIOffline

    rng = np.random.default_rng(3)
    audio = rng.standard_normal(3000).astype(np.float32) * 0.3
    for border in ("valid", "replicate"):
        h, p, r = HPRIOffline(1000.0, 16, 8, border=border).process(audio)
        assert np.isfinite(np.asarray(p)).all(), border
