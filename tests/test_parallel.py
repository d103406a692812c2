"""Sharded drivers vs the unsharded engine on the 8-device CPU mesh.

The reference offers no distributed tests (nothing distributed
exists); the strategy here is SURVEY.md §4's: force a multi-device
host platform and assert halo-exchange correctness against the
unsharded reference implementation.
"""
import numpy as np
import pytest


from zen_tpu import HPRConfig, OUTPUT_ALL
from zen_tpu.drivers.offline import HPRIOffline, hpr_separate
from zen_tpu.parallel.mesh import make_mesh
from zen_tpu.parallel.sharded import (
    sharded_hpri_offline,
    sharded_separate,
    tp_separate,
)

FS = 1000.0
HOP = 8


def cfg_(**kw):
    kw.setdefault("fs", FS)
    kw.setdefault("hop", HOP)
    kw.setdefault("causal", False)
    kw.setdefault("outputs", OUTPUT_ALL)
    return HPRConfig(**kw)


def multichannel_audio(c=4, length=400, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / FS
    tone = np.sin(2 * np.pi * 50 * t)
    out = []
    for i in range(c):
        clicks = (rng.random(length) > 0.97).astype(np.float32)
        out.append(0.6 * tone + 0.4 * clicks + 0.02 * rng.standard_normal(length))
    return np.stack(out).astype(np.float32)


def assert_close(got, want, rtol=2e-4):
    got, want = np.asarray(got), np.asarray(want)
    scale = max(np.abs(want).max(), 1e-3)
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * scale)


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (4, 2), (8, 1)])
def test_dp_sp_matches_unsharded(dp, sp):
    mesh = make_mesh({"dp": dp, "sp": sp})
    audio = multichannel_audio(c=8)
    cfg = cfg_()
    want = hpr_separate(audio, cfg)  # batched unsharded
    got = sharded_separate(audio, cfg, mesh)
    for k in ("harmonic", "percussive", "residual"):
        assert_close(got[k], want[k])


@pytest.mark.parametrize("variant", ["soft", "sse"])
def test_sp_variants_match(variant):
    mesh = make_mesh({"dp": 2, "sp": 4})
    audio = multichannel_audio(c=2, length=480)
    cfg = cfg_(soft_mask=variant == "soft", use_sse=variant == "sse")
    want = hpr_separate(audio, cfg)
    got = sharded_separate(audio, cfg, mesh)
    for k in ("harmonic", "percussive"):
        assert_close(got[k], want[k])


def test_sharded_two_pass_matches_hpri_offline():
    mesh = make_mesh({"dp": 2, "sp": 4})
    audio = multichannel_audio(c=2, length=500)
    sep = HPRIOffline(FS, 16, 8, 2.0, 2.0)
    want = sep.process(audio)
    got = sharded_hpri_offline(audio, sep.cfg_h, sep.cfg_p, mesh)
    for g, w in zip(got, want):
        assert_close(g, w)


@pytest.mark.parametrize("sp", [1, 2, 4, 8])
def test_sharded_blocked_matches_single_device(sp):
    """The sharded constant-memory scan must be BIT-exact vs the
    single-device blocked scan (same blocks, same priming math) at
    every mesh width — the VERDICT r1 long-track path."""
    from zen_tpu.drivers.offline import hpr_separate_blocked
    from zen_tpu.parallel.sharded import sharded_separate_blocked

    mesh = make_mesh({"sp": sp})
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(HOP * 280 + 13).astype(np.float32) * 0.3
    cfg = cfg_()
    want = hpr_separate_blocked(audio, cfg, block_frames=32)
    got = sharded_separate_blocked(audio, cfg, mesh, block_frames=32)
    for k in ("harmonic", "percussive", "residual"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )


@pytest.mark.parametrize(
    "kw",
    [dict(soft_mask=True), dict(border="replicate"), dict(use_sse=True)],
    ids=["soft", "replicate", "sse"],
)
def test_sharded_blocked_variants(kw):
    from zen_tpu.drivers.offline import hpr_separate_blocked
    from zen_tpu.parallel.sharded import sharded_separate_blocked

    mesh = make_mesh({"sp": 4})
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(HOP * 200).astype(np.float32) * 0.3
    cfg = cfg_(**kw)
    want = hpr_separate_blocked(audio, cfg, block_frames=16)
    got = sharded_separate_blocked(audio, cfg, mesh, block_frames=16)
    for k in ("harmonic", "percussive"):
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want[k]), err_msg=k
        )


def test_sharded_blocked_two_pass_matches_process_blocked():
    from zen_tpu.parallel.sharded import sharded_hpri_blocked

    mesh = make_mesh({"sp": 4})
    rng = np.random.default_rng(6)
    audio = rng.standard_normal(3000).astype(np.float32) * 0.3
    sep = HPRIOffline(FS, 16, 8, 2.0, 2.0)
    want = sep.process_blocked(audio, 16, 32)
    got = sharded_hpri_blocked(
        audio, sep.cfg_h, sep.cfg_p, mesh,
        block_frames_h=16, block_frames_p=32,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sharded_blocked_on_dp_sp_mesh():
    """The corpus hands flush_long its dp x sp mesh: the blocked driver
    must shard over sp and replicate over dp without caring that the
    mesh has other axes."""
    from zen_tpu.drivers.offline import hpr_separate_blocked
    from zen_tpu.parallel.sharded import sharded_separate_blocked

    mesh = make_mesh({"dp": 2, "sp": 4})
    rng = np.random.default_rng(7)
    audio = rng.standard_normal(2000).astype(np.float32) * 0.3
    cfg = cfg_()
    want = hpr_separate_blocked(audio, cfg, block_frames=16)
    got = sharded_separate_blocked(audio, cfg, mesh, block_frames=16)
    for k in ("harmonic", "percussive", "residual"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_tp_matches_unsharded():
    mesh = make_mesh({"tp": 8})
    rng = np.random.default_rng(1)
    audio = rng.standard_normal(1600).astype(np.float32)
    import dataclasses

    # realistic fs/nfft ratio so the frequency halo fits a bin shard
    cfg = dataclasses.replace(
        cfg_(fs=8000.0, hop=16), fast_rfft=False
    )
    want = hpr_separate(audio, cfg)
    got = tp_separate(audio, cfg, mesh)
    for k in ("harmonic", "percussive", "residual"):
        assert_close(got[k], want[k])


def test_tp_realistic_nfft_precision():
    """Regression (round-2 review): the TP partial-DFT angles must be
    reduced (k*n mod nfft) in exact integers — raw float32 products
    lose ~3-4 digits at production nfft. Pin parity at nfft=2048
    (hop 512 @ 44.1k), where unreduced angles reach ~6e6 radians."""
    import dataclasses

    mesh = make_mesh({"tp": 4})
    rng = np.random.default_rng(12)
    audio = rng.standard_normal(512 * 40).astype(np.float32) * 0.4
    cfg = dataclasses.replace(
        cfg_(fs=44100.0, hop=512), fast_rfft=False
    )
    want = hpr_separate(audio, cfg)
    got = tp_separate(audio, cfg, mesh)
    for k in ("harmonic", "percussive", "residual"):
        assert_close(got[k], want[k])


def test_sp_halo_too_small_raises():
    from zen_tpu.errors import ZenError

    mesh = make_mesh({"dp": 1, "sp": 8})
    audio = multichannel_audio(c=1, length=60)  # tiny: Tl < halo
    with pytest.raises(ZenError):
        sharded_separate(audio, cfg_(), mesh)


def test_tp_partial_outputs_and_soft_mask():
    """Regression (review finding): tp_separate crashed for any config
    with a disabled stem (placeholder shape mismatched the OLA
    output); exercise percussive-only and soft-mask configs."""
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE

    rng = np.random.default_rng(8)
    audio = rng.standard_normal(800).astype(np.float32)
    mesh = make_mesh({"tp": 4})
    for kw in (dict(outputs=OUTPUT_PERCUSSIVE), dict(soft_mask=True)):
        cfg = HPRConfig(fs=8000.0, hop=16, causal=False, **kw)
        got = tp_separate(audio, cfg, mesh)
        want = hpr_separate(audio, cfg)
        np.testing.assert_allclose(
            np.asarray(got["percussive"]),
            np.asarray(want["percussive"]),
            rtol=1e-4,
            atol=1e-2,
        )


def test_tp_hpri_offline_matches_unsharded():
    """The 2-pass TP cascade (zen offline --mesh tp=N surface) matches
    HPRIOffline.process within transform tolerance: same cascade
    wiring, partial-DFT transforms instead of the bucketed C2C."""
    import dataclasses

    from zen_tpu.parallel.sharded import tp_hpri_offline

    mesh = make_mesh({"tp": 4})
    rng = np.random.default_rng(3)
    audio = rng.standard_normal(4000).astype(np.float32) * 0.5
    sep = HPRIOffline(8000.0, hop_h=64, hop_p=16, beta_h=2.0, beta_p=2.0)
    want_h, want_p, want_r = sep.process(audio)
    # pin the exact C2C transform on the unsharded side too, so the
    # comparison isolates sharding (tp_separate forces fast_rfft off)
    cfg_h = dataclasses.replace(sep.cfg_h, fast_rfft=False)
    cfg_p = dataclasses.replace(sep.cfg_p, fast_rfft=False)
    got_h, got_p, got_r = tp_hpri_offline(audio, cfg_h, cfg_p, mesh)
    assert_close(got_h, want_h)
    assert_close(got_p, want_p)
    assert_close(got_r, want_r)
