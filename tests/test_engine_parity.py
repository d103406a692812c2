"""Engine parity: the batched TPU engine must reproduce the hop-by-hop
reference state machine (numpy oracle) for every variant.

This is the central correctness claim of the rebuild: the framewise
reformulation (engine/spectral.py) + decoded tap offsets
(engine/config.py) == the reference per-hop loop (engine/oracle.py,
a transcription of libzen/hps.cu:429-652).
"""
import dataclasses

import numpy as np
import pytest

from zen_tpu import HPRConfig, HPRIOffline, HPRRealtime, OUTPUT_ALL
from zen_tpu.drivers.offline import hpr_separate
from zen_tpu.engine.oracle import (
    oracle_offline_pass,
    oracle_realtime_stream,
)
from zen_tpu.ops.median import REPLICATE, VALID, WRAP

FS = 1000.0
HOP = 8
L = 101


def small_cfg(**kw):
    kw.setdefault("fs", FS)
    kw.setdefault("hop", HOP)
    kw.setdefault("outputs", OUTPUT_ALL)
    kw.setdefault("fast_rfft", False)  # bit-comparable against c2c oracle
    return HPRConfig(**kw)


def audio_fixture(length=L, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / FS
    sig = (
        0.7 * np.sin(2 * np.pi * 50 * t)
        + 0.4 * (rng.random(length) > 0.97)  # clicks (percussive)
        + 0.05 * rng.standard_normal(length)
    )
    return sig.astype(np.float32)


def assert_close(got, want, rtol=5e-4):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)


@pytest.mark.parametrize("border", [WRAP, VALID, REPLICATE])
@pytest.mark.parametrize("variant", ["hard", "soft", "sse"])
def test_offline_pass_matches_oracle(border, variant):
    cfg = small_cfg(
        causal=False,
        border=border,
        beta=2.0,
        soft_mask=(variant == "soft"),
        use_sse=(variant == "sse"),
    )
    audio = audio_fixture()
    want = oracle_offline_pass(audio, cfg)
    got = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive", "residual"):
        assert_close(got[k], want[k])


@pytest.mark.parametrize("border", [WRAP, VALID, REPLICATE])
@pytest.mark.parametrize("variant", ["hard", "soft", "sse"])
def test_realtime_stream_matches_oracle(border, variant):
    cfg = small_cfg(
        causal=True,
        border=border,
        soft_mask=(variant == "soft"),
        use_sse=(variant == "sse"),
    )
    audio = audio_fixture()
    want = oracle_realtime_stream(audio, cfg)
    rt = HPRRealtime(
        fs=FS,
        hop=HOP,
        beta=2.0,
        border=border,
        use_sse=(variant == "sse"),
        soft_mask=(variant == "soft"),
    )
    rt.cfg = dataclasses.replace(rt.cfg, fast_rfft=False)
    rt.reset_buffers()
    got = rt.process_stream(audio, block_hops=5)
    for i, k in enumerate(("harmonic", "percussive", "residual")):
        assert_close(got[i], want[k])


def test_stream_block_size_invariance():
    """B hops in one device step == B per-hop steps, exactly."""
    audio = audio_fixture(160)
    outs = []
    for block in (1, 4, 20):
        rt = HPRRealtime(fs=FS, hop=HOP, beta=2.0)
        outs.append(rt.process_stream(audio, block_hops=block))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-6, atol=1e-5)


def test_fast_rfft_matches_exact_c2c():
    """Hermitian half-spectrum fast path == full C2C path."""
    audio = audio_fixture(200, seed=3)
    for variant in ("hard", "soft", "sse"):
        cfg_exact = small_cfg(
            causal=False,
            soft_mask=variant == "soft",
            use_sse=variant == "sse",
            fast_rfft=False,
        )
        cfg_fast = dataclasses.replace(cfg_exact, fast_rfft=True)
        a = hpr_separate(audio, cfg_exact)
        b = hpr_separate(audio, cfg_fast)
        for k in ("harmonic", "percussive", "residual"):
            assert_close(b[k], a[k], rtol=2e-3)


def test_reset_buffers_determinism():
    """Reprocessing after reset is bit-identical (hps.test.cu:348-372)."""
    audio = audio_fixture(120, seed=5)
    rt = HPRRealtime(fs=FS, hop=HOP)
    a = rt.process_stream(audio)
    rt.reset_buffers()
    b = rt.process_stream(audio)
    np.testing.assert_array_equal(a, b)


def test_output_flags_respected():
    """Percussive-only config leaves other stems zero
    (hps.test.cu:286-346)."""
    from zen_tpu import OUTPUT_PERCUSSIVE

    audio = audio_fixture(120)
    rt = HPRRealtime(fs=FS, hop=HOP, outputs=OUTPUT_PERCUSSIVE)
    out = rt.process_stream(audio)
    assert np.abs(out[1]).max() > 0
    assert np.abs(out[0]).max() == 0
    assert np.abs(out[2]).max() == 0


def test_border_mode_changes_output():
    """wrap (copybord) vs valid differ for the causal engine
    (hps.test.cu:230-284)."""
    audio = audio_fixture(160, seed=7)
    a = HPRRealtime(fs=FS, hop=HOP, border=WRAP).process_stream(audio)
    b = HPRRealtime(fs=FS, hop=HOP, border=VALID).process_stream(audio)
    assert np.abs(a - b).max() > 1e-3


def test_output_not_input():
    """Separation changes the signal (hps.test.cu:160-228)."""
    audio = audio_fixture(160)
    cfg = small_cfg(causal=False)
    got = hpr_separate(audio, cfg)
    assert np.abs(np.asarray(got["percussive"]) - audio).max() > 1e-3


def test_hpri_offline_two_pass_matches_oracle():
    """Full 2-pass HPR-I == oracle 2-pass cascade (hps.cu:128-221)."""
    audio = audio_fixture(130, seed=9)
    hop_h, hop_p = 16, 8
    sep = HPRIOffline(FS, hop_h, hop_p, 2.0, 2.0)
    sep.cfg_h = dataclasses.replace(sep.cfg_h, fast_rfft=False)
    sep.cfg_p = dataclasses.replace(sep.cfg_p, fast_rfft=False)
    h, p, r = sep.process(audio)

    from zen_tpu import OUTPUT_PERCUSSIVE, OUTPUT_RESIDUAL

    cfg_h = small_cfg(hop=hop_h, causal=False)
    pass1 = oracle_offline_pass(audio, cfg_h)
    inter = pass1["percussive"] + pass1["residual"]
    cfg_p = small_cfg(
        hop=hop_p, causal=False, outputs=OUTPUT_PERCUSSIVE | OUTPUT_RESIDUAL
    )
    pass2 = oracle_offline_pass(inter, cfg_p)
    assert_close(h, pass1["harmonic"])
    assert_close(p, pass2["percussive"])
    assert_close(r, pass2["residual"])


def test_hpri_offline_strict_ref_silent_residual():
    """strict_ref=True reproduces the reference GPU binary verbatim:
    pass-2 residual stem is SILENCE (the reference copies its
    never-written buffer, hps.cu:45-48,200-204) while harmonic and
    percussive are bit-identical to the default mode."""
    audio = audio_fixture(200, seed=11)
    sep = HPRIOffline(FS, 16, 8, 2.0, 2.0)
    strict = HPRIOffline(FS, 16, 8, 2.0, 2.0, strict_ref=True)
    h, p, r = sep.process(audio)
    hs, ps, rs = strict.process(audio)
    np.testing.assert_array_equal(np.asarray(hs), np.asarray(h))
    np.testing.assert_array_equal(np.asarray(ps), np.asarray(p))
    assert np.abs(np.asarray(r)).max() > 1e-6  # default carries content
    np.testing.assert_array_equal(np.asarray(rs), 0.0)
    # blocked mode honors the same quirk
    hb, pb, rb = strict.process_blocked(audio, 16, 32)
    np.testing.assert_array_equal(np.asarray(rb), 0.0)
    np.testing.assert_array_equal(np.asarray(pb), np.asarray(ps))


def test_hpri_offline_hop_divisibility():
    from zen_tpu.errors import ZenError

    with pytest.raises(ZenError):
        HPRIOffline(FS, 16, 12)


def test_size_preservation_non_multiple():
    """Non-hop-multiple input sizes are preserved
    (hps_gpu_public.test.cu:62-107)."""
    for length in (97, 128, 129):
        audio = audio_fixture(length)
        h, p, r = HPRIOffline(FS, 16, 8).process(audio)
        assert h.shape[-1] == p.shape[-1] == r.shape[-1] == length


def test_dft_fft_impl_matches_xla():
    """The MXU DFT-matmul transform seam == the XLA FFT path within
    its documented tolerance (ops/fft.py), for both precisions."""
    rng = np.random.default_rng(11)
    audio = rng.standard_normal(6000).astype(np.float32)
    outs = {}
    for impl in ("xla", "dft", "dft_f32", "dft_bf16"):
        cfg = HPRConfig(
            fs=8000.0, hop=64, causal=False, outputs=OUTPUT_ALL,
            fft_impl=impl,
        )
        outs[impl] = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive", "residual"):
        ref = np.asarray(outs["xla"][k])
        scale = max(1.0, np.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(outs["dft_f32"][k]) / scale, ref / scale, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(outs["dft"][k]) / scale, ref / scale, atol=3e-3
        )
        # the max-throughput 1-pass bf16 rung: ~4e-3 transform rel err
        # on TPU (docs/PERFORMANCE.md ladder) — bound the stems loosely
        # enough for hard-mask flips near the threshold, tight enough
        # to catch scrambled packing/twiddles
        np.testing.assert_allclose(
            np.asarray(outs["dft_bf16"][k]) / scale, ref / scale,
            atol=5e-2,
        )


def test_realtime_parity_real_config():
    """Oracle parity at a REAL config (fs=44100, hop=1024 — the
    headline sweet spot), not just the small test configs: 24 hops
    through the causal engine vs the hop-by-hop oracle."""
    rng = np.random.default_rng(20)
    fs, hop, n_hops = 44100.0, 1024, 24
    audio = rng.standard_normal(hop * n_hops).astype(np.float32)
    cfg = HPRConfig(
        fs=fs, hop=hop, beta=2.0, causal=True, outputs=OUTPUT_ALL,
        fast_rfft=False, fft_impl="xla", median_impl="xla",
    )
    want = oracle_realtime_stream(audio, cfg)
    rt = HPRRealtime(fs, hop, 2.0, outputs=OUTPUT_ALL)
    rt.cfg = cfg
    rt.reset_buffers()
    got = rt.process_stream(audio, block_hops=8)
    for i, k in enumerate(("harmonic", "percussive", "residual")):
        scale = max(1.0, np.abs(want[k]).max())
        np.testing.assert_allclose(
            got[i] / scale, want[k] / scale, atol=5e-5,
            err_msg=f"stem {k} diverges from oracle at real config",
        )


def test_long_stream_soak_matches_oracle():
    """500 hops through the block-streamed causal engine vs the
    hop-by-hop oracle: catches state-carry drift that short parity
    runs cannot (OLA tails, feature history, donated-buffer reuse)."""
    rng = np.random.default_rng(30)
    cfg = HPRConfig(
        fs=1000.0, hop=8, beta=2.0, causal=True, outputs=OUTPUT_ALL,
        fast_rfft=False, fft_impl="xla", median_impl="xla",
    )
    audio = rng.standard_normal(cfg.hop * 500).astype(np.float32)
    want = oracle_realtime_stream(audio, cfg)
    rt = HPRRealtime(1000.0, cfg.hop, 2.0, outputs=OUTPUT_ALL)
    rt.cfg = cfg
    rt.reset_buffers()
    got = rt.process_stream(audio, block_hops=37)  # ragged blocking
    for i, k in enumerate(("harmonic", "percussive", "residual")):
        scale = max(1.0, np.abs(want[k]).max())
        np.testing.assert_allclose(
            got[i] / scale, want[k] / scale, atol=1e-4,
            err_msg=f"stem {k} drifts from oracle over 500 hops",
        )


def test_offline_multichannel_matches_per_channel():
    """HPRIOffline.process on [C, L] == per-channel processing."""
    rng = np.random.default_rng(31)
    audio = rng.standard_normal((3, 2000)).astype(np.float32)
    sep = HPRIOffline(1000.0, 32, 8, 2.0, 2.0)
    hb, pb, rb = (np.asarray(x) for x in sep.process(audio))
    for c in range(3):
        h1, p1, r1 = (np.asarray(x) for x in sep.process(audio[c]))
        np.testing.assert_allclose(hb[c], h1, atol=1e-4)
        np.testing.assert_allclose(pb[c], p1, atol=1e-4)
        np.testing.assert_allclose(rb[c], r1, atol=1e-4)


def test_runtime_toggles_match_ctor_flags():
    """use_sse_filter()/use_soft_mask() (hps.cu:322-332) == the
    constructor flags."""
    rng = np.random.default_rng(32)
    audio = rng.standard_normal(1600).astype(np.float32)

    rt_a = HPRRealtime(1000.0, 8, 2.0, outputs=OUTPUT_ALL)
    rt_a.use_soft_mask()
    rt_b = HPRRealtime(1000.0, 8, 2.0, outputs=OUTPUT_ALL, soft_mask=True)
    np.testing.assert_allclose(
        rt_a.process_stream(audio, block_hops=16),
        rt_b.process_stream(audio, block_hops=16),
    )

    off_a = HPRIOffline(1000.0, 32, 8, 2.0, 2.0)
    off_a.use_sse_filter()
    off_b = HPRIOffline(1000.0, 32, 8, 2.0, 2.0, use_sse=True)
    for a, b in zip(off_a.process(audio), off_b.process(audio)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_replicate_border_fast_path_parity():
    """Regression (review finding): border='replicate' must match the
    oracle — the half-spectrum reflect boundary cannot emulate the
    full-spectrum clamp near DC, so config must force the exact C2C
    path for replicate."""
    cfg = HPRConfig(
        fs=1000.0, hop=8, causal=False, outputs=OUTPUT_ALL,
        border="replicate",
    )
    assert not cfg.fast_rfft
    rng = np.random.default_rng(40)
    audio = rng.standard_normal(800).astype(np.float32)
    want = oracle_offline_pass(audio, cfg)
    got = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive", "residual"):
        scale = max(1.0, np.abs(want[k]).max())
        np.testing.assert_allclose(
            np.asarray(got[k]) / scale, want[k] / scale, atol=1e-4
        )


@pytest.mark.parametrize("fs,hop", [(8000.0, 256), (44100.0, 4096)])
def test_valid_anticausal_unwritten_lag_row(fs, hop):
    """Regression (review finding): valid-ROI anticausal with
    l_harm <= 2 leaves the lag row unwritten in the reference (zero
    harmonic matrix); hop_h=4096 at 44.1 kHz (l_harm=1) is exactly
    `zen offline --nocopybord`'s pass 1."""
    cfg = HPRConfig(
        fs=fs, hop=hop, causal=False, outputs=OUTPUT_ALL, border="valid"
    )
    assert cfg.l_harm <= 2 and not cfg.lag_row_written
    rng = np.random.default_rng(41)
    audio = rng.standard_normal(hop * 8).astype(np.float32)
    want = oracle_offline_pass(audio, cfg)
    got = hpr_separate(audio, cfg)
    assert np.abs(want["harmonic"]).max() == 0.0  # reference: silence
    for k in ("harmonic", "percussive", "residual"):
        scale = max(1.0, np.abs(want[k]).max())
        np.testing.assert_allclose(
            np.asarray(got[k]) / scale, want[k] / scale, atol=1e-3
        )


def test_split_stream_state_continuity():
    """Regression (review finding): streaming a signal in two
    process_stream calls with a ragged block boundary must equal one
    continuous call — tail padding must not advance the state."""
    rng = np.random.default_rng(50)
    cfg_kw = dict(fs=1000.0, hop=8, beta=2.0, outputs=OUTPUT_ALL)
    audio = rng.standard_normal(8 * 13).astype(np.float32)  # 13 hops

    rt = HPRRealtime(**cfg_kw)
    whole = rt.process_stream(audio, block_hops=4)

    rt2 = HPRRealtime(**cfg_kw)
    a = rt2.process_stream(audio[: 8 * 6], block_hops=4)  # ragged: 6 hops
    b = rt2.process_stream(audio[8 * 6 :], block_hops=4)
    np.testing.assert_allclose(
        np.concatenate([a, b], axis=1), whole, atol=1e-5
    )


def test_copy_reads_return_one_hop():
    """copy_* return exactly the newest hop even after a block call
    (the reference per-hop OLA read, hps.cu:342-363)."""
    rng = np.random.default_rng(51)
    rt = HPRRealtime(fs=1000.0, hop=8, beta=2.0, outputs=OUTPUT_ALL)
    block = rng.standard_normal((4, 8)).astype(np.float32)
    outs = rt.process_block(block)
    assert rt.copy_percussive().shape == (8,)
    np.testing.assert_allclose(
        rt.copy_percussive(), np.asarray(outs[1])[-8:]
    )


@pytest.mark.parametrize(
    "fs,hop,border,causal,soft,sse",
    [
        # sampled sweep across the whole config space (the targeted
        # tests above pin specific behaviors; this is breadth insurance)
        (1000.0, 8, "wrap", False, False, False),
        (1000.0, 8, "wrap", True, True, False),
        (1000.0, 16, "replicate", False, False, False),
        (1000.0, 16, "replicate", True, False, False),
        (2000.0, 8, "valid", False, False, False),
        (2000.0, 8, "valid", True, False, False),
        (1000.0, 8, "wrap", False, False, True),
        (1000.0, 16, "wrap", True, False, True),
        (4000.0, 32, "wrap", False, True, False),
        (8000.0, 64, "replicate", False, True, False),
        (16000.0, 32, "valid", False, False, False),
    ],
)
def test_config_fuzz_matches_oracle(fs, hop, border, causal, soft, sse):
    """Engine == oracle across a sampled grid of every config axis."""
    cfg = HPRConfig(
        fs=fs, hop=hop, causal=causal, border=border,
        soft_mask=soft, use_sse=sse, outputs=OUTPUT_ALL,
        fast_rfft=False, fft_impl="xla", median_impl="xla",
    )
    rng = np.random.default_rng(hash((fs, hop, border)) % 2**32)
    audio = rng.standard_normal(hop * 20).astype(np.float32)
    if causal:
        want = oracle_realtime_stream(audio, cfg)
        rt = HPRRealtime(fs, hop, 2.0, outputs=OUTPUT_ALL)
        rt.cfg = cfg
        rt.reset_buffers()
        got_arr = rt.process_stream(audio, block_hops=7)
        got = {
            k: got_arr[i]
            for i, k in enumerate(("harmonic", "percussive", "residual"))
        }
    else:
        want = oracle_offline_pass(audio, cfg)
        got = {k: np.asarray(v) for k, v in hpr_separate(audio, cfg).items()}
    for k in ("harmonic", "percussive", "residual"):
        w = np.nan_to_num(want[k], posinf=0, neginf=0)
        g = np.nan_to_num(np.asarray(got[k])[: len(w)], posinf=0, neginf=0)
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(
            g / scale, w / scale, atol=2e-4,
            err_msg=f"{k} diverges for cfg {cfg}",
        )


def test_degenerate_low_fs_raises():
    """fs <= 500 Hz makes l_perc reach nfft (filter > matrix) — must
    raise like the reference (mfilt.h:80-87), not mis-separate."""
    with pytest.raises(Exception):
        HPRConfig(fs=500.0, hop=8, causal=True)


@pytest.mark.parametrize(
    "border,causal,variant",
    [
        ("wrap", False, {}),
        ("wrap", True, {}),
        ("replicate", False, {}),
        ("valid", False, {}),
        ("wrap", False, {"soft_mask": True}),
        ("wrap", False, {"use_sse": True}),
    ],
)
def test_blocked_pass_matches_unblocked(border, causal, variant):
    """hpr_separate_blocked (constant-memory overlap-save over time
    blocks, for hours-long tracks) == hpr_separate exactly."""
    from zen_tpu.drivers.offline import hpr_separate_blocked

    cfg = HPRConfig(
        fs=1000.0, hop=8, causal=causal, border=border,
        outputs=OUTPUT_ALL, **variant,
    )
    rng = np.random.default_rng(60)
    audio = rng.standard_normal(8 * 57 + 3).astype(np.float32)
    want = hpr_separate(audio, cfg)
    got = hpr_separate_blocked(audio, cfg, block_frames=16)
    for k in ("harmonic", "percussive", "residual"):
        w = np.nan_to_num(np.asarray(want[k]), posinf=0, neginf=0)
        g = np.nan_to_num(np.asarray(got[k]), posinf=0, neginf=0)
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g / scale, w / scale, atol=1e-4)


def test_process_blocked_matches_process():
    """HPRIOffline.process_blocked == process on the 2-pass cascade."""
    rng = np.random.default_rng(61)
    audio = rng.standard_normal(4000).astype(np.float32)
    sep = HPRIOffline(1000.0, 32, 8, 2.0, 2.0)
    want = sep.process(audio)
    got = sep.process_blocked(audio, block_frames_h=16, block_frames_p=64)
    for w, g in zip(want, got):
        w, g = np.asarray(w), np.asarray(g)
        scale = max(1.0, np.abs(w).max())
        np.testing.assert_allclose(g / scale, w / scale, atol=1e-4)


def test_short_track_long_filter_matches_oracle():
    """Frame count BELOW the time filter's reach (high fs, small hop,
    short clip: l_harm=247 taps over 148 frames) — the reference's
    always-stft_width-tall sliding matrix handles this implicitly; the
    batched form must too (regression: tap_stack crashed on it; found
    by randomized fuzzing, round 3)."""
    fs, hop, L = 29673.0, 8, 1174
    rng = np.random.default_rng(4)
    audio = (
        0.3 * np.sin(2 * np.pi * 300 * np.arange(L) / fs)
        + 0.1 * rng.standard_normal(L)
    ).astype(np.float32)
    cfg = HPRConfig(
        fs=fs, hop=hop, beta=1.17, causal=True, border="valid",
        outputs=OUTPUT_ALL, fast_rfft=False, soft_mask=True,
    )
    assert len(cfg.time_offsets) > L // hop  # the degenerate premise
    want = oracle_offline_pass(audio, cfg)
    got = hpr_separate(audio, cfg)
    for k in ("harmonic", "percussive", "residual"):
        assert_close(got[k], want[k])


@pytest.mark.slow
def test_fuzz_parity_instrument_smoke():
    """The randomized sweep instrument (scripts/fuzz_parity.py) runs
    end to end on a few cases — the extended-fuzz harness that caught
    the short-track/long-filter crash stays runnable."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "fuzz_parity.py"),
         "3", "3"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, f"\n{r.stdout}\n{r.stderr}"
    assert "PARITY SWEEP PASS" in r.stdout
