"""CLI + audio IO end-to-end tests (hps_*_public.test.cu analog)."""
import json
import subprocess
import sys

import numpy as np
import pytest

from zen_tpu.io.audio import peak_normalize, read_wav_mono, write_wav_pcm16


def make_wav(path, fs=8000, seconds=0.5):
    n = int(fs * seconds)
    t = np.arange(n) / fs
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    x[n // 2 : n // 2 + 50] += 0.4
    write_wav_pcm16(str(path), fs, x)
    return x


def test_wav_roundtrip(tmp_path):
    p = tmp_path / "t.wav"
    n = 1000
    x = np.linspace(-0.9, 0.9, n).astype(np.float32)
    write_wav_pcm16(str(p), 8000, x)
    fs, y = read_wav_mono(str(p))
    assert fs == 8000
    np.testing.assert_allclose(y, x, atol=1.5 / 32768)


def test_stereo_to_mono(tmp_path):
    from scipy.io import wavfile

    p = tmp_path / "st.wav"
    left = np.full(100, 0.5, np.float32)
    right = np.full(100, -0.25, np.float32)
    data = (np.stack([left, right], 1) * 32767).astype(np.int16)
    wavfile.write(str(p), 8000, data)
    _, y = read_wav_mono(str(p))
    np.testing.assert_allclose(y, 0.125, atol=1e-3)


def test_peak_normalize():
    x = np.array([-2.0, 1.0], np.float32)
    np.testing.assert_allclose(peak_normalize(x), [-1.0, 0.5])
    z = np.zeros(4, np.float32)
    np.testing.assert_array_equal(peak_normalize(z), z)


def run_cli(args, cwd):
    return subprocess.run(
        [sys.executable, "-m", "zen_tpu.cli", *args],
        capture_output=True,
        text=True,
        cwd=str(cwd),
        env={
            "PATH": "/usr/bin:/bin",
            "ZEN_TPU_PLATFORM": "cpu",  # the CLI's explicit backend
            # selector (JAX_PLATFORMS is unreliable under plugins)
            "HOME": "/root",
            "PYTHONPATH": "/root/repo",
        },
    )


@pytest.mark.slow
def test_cli_offline_end_to_end(tmp_path):
    wav = tmp_path / "in.wav"
    make_wav(wav)
    res = run_cli(
        [
            "offline",
            "-i",
            str(wav),
            "--hps",
            "64",
            "2.0",
            "32",
            "2.0",
            "-o",
            str(tmp_path / "out"),
        ],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr
    assert "Running zen-offline" in res.stdout
    assert "HPR-I-Offline took" in res.stdout
    metrics = [
        json.loads(line)
        for line in res.stdout.splitlines()
        if line.startswith("{")
    ]
    assert metrics and metrics[0]["metric"] == "offline_2pass_ms"
    for stem in ("harm", "perc", "residual"):
        fs, y = read_wav_mono(str(tmp_path / f"out_{stem}.wav"))
        assert len(y) == 4000
        assert np.abs(y).max() <= 1.0


@pytest.mark.slow
def test_cli_fakert_end_to_end(tmp_path):
    wav = tmp_path / "in.wav"
    make_wav(wav)
    res = run_cli(
        [
            "fakert",
            "-i",
            str(wav),
            "--hps",
            "32",
            "2.0",
            "-o",
            str(tmp_path / "perc.wav"),
            "--block-hops",
            "8",
        ],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr
    assert "PRealtime TPU" in res.stdout
    fs, y = read_wav_mono(str(tmp_path / "perc.wav"))
    assert len(y) == 4000


def test_cli_version():
    res = run_cli(["version"], "/root/repo")
    assert res.returncode == 0 and res.stdout.startswith("version")


def test_synth_to_offline_e2e(tmp_path):
    """zen synth -> zen offline -> stems correlate with ground truth
    (the full user path: no sample audio exists in a fresh checkout)."""
    import numpy as np
    from scipy.io import wavfile

    from zen_tpu.cli import main

    mix = str(tmp_path / "mix.wav")
    rc = main(
        [
            "synth", "-o", mix, "--fs", "8000", "--seconds", "2",
            "--bpm", "240", "--stems",
        ]
    )
    assert rc == 0
    out = str(tmp_path / "sep")
    rc = main(
        ["offline", "-i", mix, "--hps", "256", "2.0", "64", "2.0", "-o", out]
    )
    assert rc == 0

    def rd(p):
        _, d = wavfile.read(p)
        return d.astype(np.float64) / 32768.0

    harm, perc = rd(mix[:-4] + "_harm.wav"), rd(mix[:-4] + "_perc.wav")
    h, p = rd(out + "_harm.wav"), rd(out + "_perc.wav")
    n = len(harm)
    assert np.corrcoef(h[:n], harm)[0, 1] > 0.9
    assert np.corrcoef(p[:n], perc)[0, 1] > 0.8
    assert abs(np.corrcoef(h[:n], perc)[0, 1]) < 0.2


def test_corpus_cli_e2e(tmp_path):
    """zen synth x3 -> zen corpus over a simulated mesh -> stems on
    disk + resumable journal; second invocation is a no-op."""
    import json

    from zen_tpu.cli import main

    import numpy as np
    from scipy.io import wavfile

    for i in range(3):
        main(
            [
                "synth", "-o", str(tmp_path / f"t{i}.wav"),
                "--fs", "4000", "--seconds", "1", "--seed", str(i),
                "--stems",
            ]
        )
    out = tmp_path / "stems"
    args = [
        "corpus", "-i", str(tmp_path / "t[0-9].wav"), "-o", str(out),
        "--hps", "64", "2.0", "16", "2.0", "--mesh", "dp=2,sp=2",
        # the op-seam knobs must reach the corpus driver's configs too
        "--fft-impl", "dft_f32", "--median-impl", "xla",
    ]
    assert main(args) == 0
    for i in range(3):
        for stem in ("harm", "perc", "residual"):
            path = out / f"t{i}_{stem}.wav"
            assert path.exists()
            _, pcm = wavfile.read(str(path))
            # regression (review finding): unnormalized engine-scale
            # stems were clipped to square-wave garbage by the PCM16
            # encoder — saturated fraction must be tiny
            assert np.mean(np.abs(pcm) >= 32700) < 0.05, (i, stem)
    # stems must resemble their ground truth, not just exist
    _, perc_true = wavfile.read(str(tmp_path / "t0_perc.wav"))
    _, perc_est = wavfile.read(str(out / "t0_perc.wav"))
    n = min(len(perc_true), len(perc_est))
    assert np.corrcoef(
        perc_est[:n].astype(float), perc_true[:n].astype(float)
    )[0, 1] > 0.5
    # resume: journal says all done (and cover the --prefetch flag's
    # synchronous-IO path; the first invocation used the default 2)
    assert main(args + ["--prefetch", "0"]) == 0
    journal = (out / "progress.jsonl").read_text().strip().splitlines()
    assert len(journal) == 3


def test_stream_pipe_mode(tmp_path):
    """zen stream: raw float32 stdin -> stem on stdout via a real
    subprocess pipe, equals the library's process_stream."""
    import subprocess
    import sys as _sys

    import numpy as np

    from zen_tpu.drivers.realtime import HPRRealtime
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE

    fs, hop, n = 4000.0, 16, 16 * 40 + 7  # ragged tail
    rng = np.random.default_rng(5)
    audio = rng.standard_normal(n).astype(np.float32)
    env = dict(os.environ) if (os := __import__("os")) else {}
    env["ZEN_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [
            _sys.executable, "-m", "zen_tpu.cli", "stream",
            "--fs", "4000", "--hop", "16", "--block-hops", "8",
            "--stem", "percussive", "--cpu",
        ],
        input=audio.tobytes(),
        capture_output=True,
        timeout=300,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    got = np.frombuffer(proc.stdout, np.float32)
    assert len(got) == n
    # --cpu selects the replicate border (the reference IPP behavior);
    # stream mode calibrates the pipe to unit gain (1/synth_scale)
    rt = HPRRealtime(
        fs, hop, 2.0, outputs=OUTPUT_PERCUSSIVE, border="replicate"
    )
    want = rt.process_stream(audio, block_hops=8)[1][:n] / rt.cfg.synth_scale
    np.testing.assert_allclose(got, want, atol=1e-6)
    # unit gain: output magnitudes are input-order, not engine-scaled
    assert np.abs(got).max() < 10 * np.abs(audio).max()


def test_stream_pipe_multistream(tmp_path):
    """zen stream --streams N: N sample-interleaved streams through one
    pipe == N independent single-stream runs, stream identity intact."""
    import os
    import subprocess
    import sys as _sys

    import numpy as np

    from zen_tpu.drivers.realtime import HPRRealtime
    from zen_tpu.engine.config import OUTPUT_PERCUSSIVE

    fs, hop, S = 4000.0, 16, 3
    n = 16 * 32 + 5  # ragged tail
    rng = np.random.default_rng(9)
    t = np.arange(n) / fs
    streams = np.stack([
        (0.5 * np.sin(2 * np.pi * f0 * t)
         + 0.3 * rng.standard_normal(n)).astype(np.float32)
        for f0 in (200.0, 450.0, 800.0)
    ])  # [S, n]
    interleaved = np.ascontiguousarray(streams.T).ravel()
    env = dict(os.environ)
    env["ZEN_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [
            _sys.executable, "-m", "zen_tpu.cli", "stream",
            "--fs", "4000", "--hop", "16", "--block-hops", "8",
            "--stem", "percussive", "--cpu", "--streams", str(S),
        ],
        input=interleaved.tobytes(),
        capture_output=True,
        timeout=600,
        env=env,
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    got = np.frombuffer(proc.stdout, np.float32)
    assert len(got) == n * S
    de = got.reshape(n, S).T  # [S, n]
    for s in range(S):
        rt = HPRRealtime(
            fs, hop, 2.0, outputs=OUTPUT_PERCUSSIVE, border="replicate"
        )
        want = (
            rt.process_stream(streams[s], block_hops=8)[1][:n]
            / rt.cfg.synth_scale
        )
        np.testing.assert_allclose(de[s], want, atol=1e-4, err_msg=str(s))


def test_stream_pipe_multichip_mesh(tmp_path):
    """zen stream --streams N --mesh dp=K (round-2 verdict #4): the
    BASELINE serving config scaled over a dp mesh from the CLI. On
    the 8-device virtual mesh: output == mesh-less multi-stream run,
    and the JSON serving metric line reports the mesh."""
    import json as _json
    import os
    import subprocess
    import sys as _sys

    import numpy as np

    fs, hop, S = 4000.0, 16, 4
    n = 16 * 24
    rng = np.random.default_rng(17)
    streams = rng.standard_normal((S, n)).astype(np.float32) * 0.5
    interleaved = np.ascontiguousarray(streams.T).ravel()
    env = dict(os.environ)
    env["ZEN_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    outs = {}
    for mesh_args in ((), ("--mesh", "dp=4")):
        proc = subprocess.run(
            [
                _sys.executable, "-m", "zen_tpu.cli", "stream",
                "--fs", "4000", "--hop", "16", "--block-hops", "8",
                "--stem", "percussive", "--cpu", "--streams", str(S),
                *mesh_args,
            ],
            input=interleaved.tobytes(),
            capture_output=True,
            timeout=600,
            env=env,
        )
        assert proc.returncode == 0, proc.stderr.decode()[-2000:]
        outs[bool(mesh_args)] = np.frombuffer(proc.stdout, np.float32)
        # the serving metric line is machine-readable on stderr
        metric_lines = [
            _json.loads(ln)
            for ln in proc.stderr.decode().splitlines()
            if ln.startswith("{")
        ]
        serving = [
            m for m in metric_lines if m.get("metric") == "stream_serving"
        ]
        assert serving and serving[0]["streams"] == S
        assert serving[0]["samples_per_s"] > 0
        if mesh_args:
            assert serving[0]["mesh"] == "dp=4"
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-5)


def test_stream_mesh_rejects_bad_args():
    """--mesh validation: non-dp axes and non-divisible stream counts
    fail fast with a clear message."""
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["ZEN_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    for bad, msg in (
        (["--streams", "4", "--mesh", "sp=4"], b"dp axis only"),
        (["--streams", "3", "--mesh", "dp=2"], b"not divisible"),
    ):
        proc = subprocess.run(
            [
                _sys.executable, "-m", "zen_tpu.cli", "stream",
                "--fs", "4000", "--hop", "16", *bad,
            ],
            input=b"",
            capture_output=True,
            timeout=300,
            env=env,
        )
        assert proc.returncode == 1
        assert msg in proc.stderr


def test_parse_mesh_axes_validation():
    """Malformed mesh specs get (None, error), including duplicate
    axes — 'dp=2,dp=8' (a typo for dp=2,sp=8) must not silently keep
    only the last value (review finding)."""
    from zen_tpu.cli import _parse_mesh_axes

    ok, err = _parse_mesh_axes("dp=2,sp=4", ("dp", "sp"))
    assert err is None and ok == {"dp": 2, "sp": 4}
    for bad in ("dp", "dp=x", "dp=0", "tp=2", "dp=2,dp=8"):
        axes, err = _parse_mesh_axes(bad, ("dp", "sp"))
        assert axes is None and err, bad


@pytest.mark.slow
def test_cli_impl_seam_flags(tmp_path):
    """The op-seam performance knobs must be product-reachable
    (round-2 verdict's 'product-unreachable capability' pattern):
    --fft-impl / --median-impl flow from the CLI into HPRConfig on
    offline and fakert, an explicit choice survives the 'auto'
    resolvers, and an invalid value is rejected by argparse."""
    wav = tmp_path / "in.wav"
    make_wav(wav)
    res = run_cli(
        [
            "offline", "-i", str(wav),
            "--hps", "64", "2.0", "32", "2.0",
            "-o", str(tmp_path / "o"),
            "--fft-impl", "dft_f32", "--median-impl", "xla",
        ],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr
    for stem in ("harm", "perc", "residual"):
        _, y = read_wav_mono(str(tmp_path / f"o_{stem}.wav"))
        assert len(y) == 4000

    res = run_cli(
        [
            "fakert", "-i", str(wav), "--hps", "32", "2.0",
            "-o", str(tmp_path / "p.wav"), "--block-hops", "8",
            "--fft-impl", "xla",
        ],
        tmp_path,
    )
    assert res.returncode == 0, res.stderr

    bad = run_cli(
        ["offline", "-i", str(wav), "--fft-impl", "fft64"], tmp_path
    )
    assert bad.returncode == 2
    assert "--fft-impl" in bad.stderr


def test_impl_seam_constructor_kwargs():
    """Explicit fft_impl/median_impl constructor kwargs reach the
    config and are NOT rewritten by the auto resolvers (drivers pin
    only 'auto')."""
    from zen_tpu.drivers.offline import HPRIOffline
    from zen_tpu.drivers.realtime import HPRRealtime, MultiStreamHPR

    sep = HPRIOffline(8000.0, 64, 32, fft_impl="dft_f32", median_impl="xla")
    assert sep.cfg_h.fft_impl == "dft_f32"
    assert sep.cfg_p.median_impl == "xla"

    rt = HPRRealtime(8000.0, 64, fft_impl="dft_bf16")
    assert rt.cfg.fft_impl == "dft_bf16"

    ms = MultiStreamHPR(4, 8000.0, 64, fft_impl="dft_bf16")
    assert ms.cfg.fft_impl == "dft_bf16"  # resolver must not override

    # the serving-state precision knob reaches every driver too
    rt = HPRRealtime(8000.0, 64, stream_state="bf16")
    assert rt.cfg.stream_state == "bf16"
    import jax.numpy as jnp

    from zen_tpu.drivers.realtime import init_state

    assert init_state(rt.cfg).feat_hist.dtype == jnp.bfloat16
    ms = MultiStreamHPR(4, 8000.0, 64, stream_state="bf16")
    assert ms.cfg.stream_state == "bf16"
    sep = HPRIOffline(8000.0, 64, 32, stream_state="bf16")
    assert sep.cfg_h.stream_state == "bf16"  # accepted, inert offline


@pytest.mark.slow
def test_cli_offline_tp_mesh(tmp_path):
    """zen offline --mesh tp=4 (round-3 verdict #6: TP gets a product
    surface): frequency-sharded 2-pass cascade on the virtual mesh
    produces stems close to the unsharded run; bad axes are rejected."""
    import os

    wav = tmp_path / "in.wav"
    make_wav(wav)
    env = {
        "PATH": "/usr/bin:/bin",
        "ZEN_TPU_PLATFORM": "cpu",
        "HOME": "/root",
        "PYTHONPATH": "/root/repo",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    }
    outs = {}
    for mesh_args in ((), ("--mesh", "tp=4")):
        prefix = tmp_path / ("tp" if mesh_args else "ref")
        res = subprocess.run(
            [
                sys.executable, "-m", "zen_tpu.cli", "offline",
                "-i", str(wav), "--hps", "64", "2.0", "32", "2.0",
                "-o", str(prefix), *mesh_args,
            ],
            capture_output=True, text=True, cwd=str(tmp_path), env=env,
        )
        assert res.returncode == 0, res.stderr
        if mesh_args:
            assert "mesh: tp=4" in res.stdout
        stems = {}
        for stem in ("harm", "perc", "residual"):
            _, y = read_wav_mono(str(tmp_path / f"{prefix.name}_{stem}.wav"))
            stems[stem] = y
        outs[bool(mesh_args)] = stems
    for stem in ("harm", "perc", "residual"):
        # stems are peak-normalized PCM16; transform tolerance + the
        # quantization grid bound the disagreement
        np.testing.assert_allclose(
            outs[True][stem], outs[False][stem], atol=3e-3
        )
    # rejection: tp must divide both pass nffts (tp=5 divides neither)
    res = subprocess.run(
        [
            sys.executable, "-m", "zen_tpu.cli", "offline",
            "-i", str(wav), "--hps", "64", "2.0", "32", "2.0",
            "--mesh", "tp=5",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
    )
    assert res.returncode == 2
    assert "must divide" in res.stderr
