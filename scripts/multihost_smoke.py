"""Multi-host smoke: run the sharded corpus 2-pass as REAL processes.

Round 1 exercised drivers/corpus.py's multi-host branches only under
monkeypatched jax.process_count — proving branch wiring, not that the
global-array collectives have the right semantics across process
boundaries. This script stands up N real processes on localhost
(jax.distributed.initialize, Gloo CPU collectives, K simulated
devices per process via --xla_force_host_platform_device_count) and:

  1. runs `separate_corpus` over a small synthetic corpus on a
     dp x sp mesh spanning both processes;
  2. asserts every stem wav byte-matches a single-process run of the
     SAME global mesh shape (the pod program is deterministic);
  3. asserts mesh topology: with dp covering the process count, every
     sp ring (the halo-exchange axis) stays within one process — the
     create_hybrid_device_mesh guarantee that halos ride ICI, not DCN;
  4. kills the whole worker fleet mid-run (SIGKILL, after the first
     journal entry lands) and re-runs it, asserting the journal
     resumes — previously-done tracks are skipped and final stems
     still byte-match the golden run.

A separate --cli leg drives the PRODUCT surface end-to-end: each
worker process is `python -m zen_tpu.cli corpus --coordinator
localhost:P --nprocs 2 --proc-id I ...` (the round-3 CLI bootstrap),
and the resulting stems must byte-match a single-process CLI run of
the same global mesh — multi-host is reachable by a user typing a
command, not only by a Python caller.

Usage:
  python scripts/multihost_smoke.py            # orchestrate everything
  python scripts/multihost_smoke.py --quick    # steps 1-3 only
  python scripts/multihost_smoke.py --cli      # CLI-surface leg only
(The worker entry point is internal: --worker I N PORT MODE ...)

BASELINE configs[4] ("hours-long multi-track corpora over N hosts")
rests on this path; tests/test_multihost.py runs this script.
"""
from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# process count is env-tunable (ZEN_MH_NPROCS) so the same smoke
# exercises 2- and 3-process fleets (round-5 verdict #6); workers
# inherit the env, so golden and multi-process modes agree on the
# global mesh shape
N_PROCS = int(os.environ.get("ZEN_MH_NPROCS", "2"))
DEVS_PER_PROC = 2
FS = 8000
HOP_H, HOP_P = 256, 64


def _worker_env(n_devs: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devs}"
    ).strip()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["ZEN_TPU_CACHE_DIR"] = "0"  # compile fresh; cache dirs would race
    return env


def _make_corpus(corpus_dir: str) -> list:
    """Four distinct synthetic tracks, unequal lengths (exercises the
    batch zero-pad + truncate-on-write path); the last one is the
    long-track that routes through the sharded blocked path."""
    sys.path.insert(0, REPO)
    import numpy as np

    from zen_tpu.io.audio import write_wav_pcm16

    os.makedirs(corpus_dir, exist_ok=True)
    paths = []
    rng = np.random.default_rng(7)
    # track3 is "long": workers drop LONG_TRACK_SAMPLES so it exceeds
    # threshold*sp and routes through flush_long -> sharded_hpri_blocked
    # — the hours-long-track pod path, executed as REAL processes
    # (round-2 review: its multi-host gather had never actually run)
    for i, (f0, secs) in enumerate(
        [(220.0, 1.3), (330.0, 1.7), (147.0, 1.1), (262.0, 2.2)]
    ):
        n = int(FS * secs)
        t = np.arange(n) / FS
        harm = 0.5 * np.sin(2 * np.pi * f0 * t)
        perc = np.zeros(n, np.float32)
        for b in np.arange(0.2, secs, 0.4):
            j = int(b * FS)
            L = min(300, n - j)
            perc[j : j + L] += rng.standard_normal(L) * np.exp(
                -np.arange(L) / 50
            )
        p = os.path.join(corpus_dir, f"track{i}.wav")
        write_wav_pcm16(p, FS, (harm + perc).astype(np.float32) * 0.5)
        paths.append(p)
    return paths


def worker_main(args) -> int:
    # platform pin must precede backend init; the axon plugin ignores
    # the JAX_PLATFORMS env var (memory: axon-tpu-measurement-hazards)
    sys.path.insert(0, REPO)
    import jax

    from zen_tpu.runtime.platform import pin_platform

    pin_platform(force="cpu")
    if args.nprocs > 1:
        jax.distributed.initialize(
            f"localhost:{args.port}",
            num_processes=args.nprocs,
            process_id=args.proc_id,
        )
    n_global = N_PROCS * DEVS_PER_PROC  # same global shape in both modes
    assert jax.local_device_count() == n_global // args.nprocs, (
        jax.local_devices()
    )
    assert jax.device_count() == n_global

    import zen_tpu.drivers.offline as offline_mod
    from zen_tpu.drivers.corpus import separate_corpus
    from zen_tpu.parallel.mesh import make_mesh

    # route the 2.2 s track through the long-track (sharded blocked)
    # path: threshold*sp = 2*8000 = 16000 < 17600 samples
    offline_mod.LONG_TRACK_SAMPLES = 8000

    # the GLOBAL mesh shape must be identical in the golden
    # (single-process) and multi-process modes — derive from the
    # global device count, not nprocs
    mesh = make_mesh({"dp": N_PROCS, "sp": DEVS_PER_PROC})

    if args.nprocs > 1:
        # topology assertion (3): every sp ring within one process
        for dp_row in mesh.devices:
            procs = {d.process_index for d in dp_row}
            assert len(procs) == 1, (
                f"sp ring spans processes {procs}: halo ppermutes would "
                f"cross DCN ({[str(d) for d in dp_row]})"
            )

    tracks = sorted(
        os.path.join(args.corpus_dir, f)
        for f in os.listdir(args.corpus_dir)
        if f.endswith(".wav")
    )
    res = separate_corpus(
        tracks,
        args.out_dir,
        mesh,
        hop_h=HOP_H,
        hop_p=HOP_P,
    )
    print(
        f"[worker {args.proc_id}] done: {res} "
        f"(mesh {dict(mesh.shape)}, {jax.device_count()} global devices)",
        flush=True,
    )
    return 0


def _spawn_workers(port: int, corpus_dir: str, out_dir: str):
    procs = []
    for i in range(N_PROCS):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--worker",
                    "--proc-id",
                    str(i),
                    "--nprocs",
                    str(N_PROCS),
                    "--port",
                    str(port),
                    "--corpus-dir",
                    corpus_dir,
                    "--out-dir",
                    out_dir,
                ],
                env=_worker_env(DEVS_PER_PROC),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    return procs


def _wait_workers(procs, timeout=900):
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    return outs


def _stems(out_dir: str) -> dict:
    return {
        f: open(os.path.join(out_dir, f), "rb").read()
        for f in sorted(os.listdir(out_dir))
        if f.endswith(".wav")
    }


def orchestrate(quick: bool) -> int:
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="zen_mh_")
    corpus_dir = os.path.join(work, "corpus")
    _make_corpus(corpus_dir)
    port = 29000 + (os.getpid() % 1000)

    # --- golden: single process, same global mesh shape (dp2 x sp2) ---
    golden_dir = os.path.join(work, "golden")
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--worker",
        "--proc-id",
        "0",
        "--nprocs",
        "1",
        "--port",
        str(port),
        "--corpus-dir",
        corpus_dir,
        "--out-dir",
        golden_dir,
    ]
    r = subprocess.run(
        cmd,
        env=_worker_env(N_PROCS * DEVS_PER_PROC),
        capture_output=True,
        timeout=900,
    )
    if r.returncode != 0:
        print(r.stdout.decode(), r.stderr.decode())
        return 1
    golden = _stems(golden_dir)
    assert len(golden) == 12, sorted(golden)  # 4 tracks x 3 stems
    print(f"golden run ok: {len(golden)} stems", flush=True)

    # --- multi-process run, byte-compare ---
    mh_dir = os.path.join(work, "multihost")
    procs = _spawn_workers(port + 1, corpus_dir, mh_dir)
    outs = _wait_workers(procs)
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"--- worker {i} ---\n{o}")
            return 1
    mh = _stems(mh_dir)
    assert set(mh) == set(golden), (sorted(mh), sorted(golden))
    diff = [f for f in golden if mh[f] != golden[f]]
    assert not diff, f"stems differ from single-process run: {diff}"
    print(
        f"multihost run ok: {len(mh)} stems byte-match the "
        "single-process run; sp rings verified intra-process",
        flush=True,
    )

    if quick:
        shutil.rmtree(work)
        return 0

    # --- kill mid-run, then resume ---
    res_dir = os.path.join(work, "resume")
    procs = _spawn_workers(port + 2, corpus_dir, res_dir)
    journal = os.path.join(res_dir, "progress.jsonl")
    deadline = time.time() + 600
    while time.time() < deadline:
        if os.path.exists(journal) and os.path.getsize(journal) > 0:
            break
        if all(p.poll() is not None for p in procs):
            break  # finished before we could kill: corpus too small/fast
        time.sleep(0.05)
    killed_early = any(p.poll() is None for p in procs)
    for p in procs:
        if p.poll() is None:
            os.kill(p.pid, signal.SIGKILL)
    for p in procs:
        p.wait()
    done_before = sum(
        1 for line in open(journal) if line.strip()
    ) if os.path.exists(journal) else 0
    print(
        f"killed fleet after {done_before} journaled tracks "
        f"(killed_early={killed_early})",
        flush=True,
    )
    assert 0 < done_before < 4, (
        f"kill landed after {done_before}/4 tracks; the resume leg needs "
        "a partial journal — retune the corpus sizes"
    )

    procs = _spawn_workers(port + 3, corpus_dir, res_dir)
    outs = _wait_workers(procs)
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"--- worker {i} (resume) ---\n{o}")
            return 1
    resumed = _stems(res_dir)
    assert set(resumed) == set(golden)
    diff = [f for f in golden if resumed[f] != golden[f]]
    assert not diff, f"post-resume stems differ: {diff}"
    # the resume run must have SKIPPED the journaled tracks
    skipped = [o for o in outs if f"'done': {done_before}" in o]
    assert skipped, outs
    print(
        f"resume ok: {done_before} tracks skipped via journal, "
        "final stems byte-match golden",
        flush=True,
    )
    shutil.rmtree(work)
    return 0


def _cli_worker_cmd(i, nprocs, port, corpus_dir, out_dir):
    cmd = [
        sys.executable,
        "-m",
        "zen_tpu.cli",
        "corpus",
        "-i",
        os.path.join(corpus_dir, "*.wav"),
        "-o",
        out_dir,
        "--hps",
        str(HOP_H),
        "2.0",
        str(HOP_P),
        "2.0",
        "--mesh",
        "dp=2,sp=2",
    ]
    if nprocs > 1:
        cmd += [
            "--coordinator",
            f"localhost:{port}",
            "--nprocs",
            str(nprocs),
            "--proc-id",
            str(i),
        ]
    return cmd


def cli_leg() -> int:
    """Product-surface leg: the multi-host corpus run driven purely by
    the shipped CLI (`zen corpus --coordinator ... --nprocs N
    --proc-id I`), byte-compared against a single-process CLI run of
    the same dp2 x sp2 global mesh."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="zen_mh_cli_")
    corpus_dir = os.path.join(work, "corpus")
    _make_corpus(corpus_dir)
    port = 29000 + (os.getpid() % 1000)

    def env(n_devs):
        e = _worker_env(n_devs)
        e["ZEN_TPU_PLATFORM"] = "cpu"  # CLI's explicit backend knob
        return e

    golden_dir = os.path.join(work, "golden")
    r = subprocess.run(
        _cli_worker_cmd(0, 1, port, corpus_dir, golden_dir),
        env=env(N_PROCS * DEVS_PER_PROC),
        capture_output=True,
        timeout=900,
    )
    if r.returncode != 0:
        print(r.stdout.decode(), r.stderr.decode())
        return 1
    golden = _stems(golden_dir)
    assert len(golden) == 12, sorted(golden)
    print(f"cli golden run ok: {len(golden)} stems", flush=True)

    mh_dir = os.path.join(work, "multihost")
    procs = [
        subprocess.Popen(
            _cli_worker_cmd(i, N_PROCS, port + 1, corpus_dir, mh_dir),
            env=env(DEVS_PER_PROC),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(N_PROCS)
    ]
    outs = _wait_workers(procs)
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"--- cli worker {i} ---\n{o}")
            return 1
    assert any('"metric": "corpus_tracks"' in o for o in outs), outs
    mh = _stems(mh_dir)
    assert set(mh) == set(golden), (sorted(mh), sorted(golden))
    diff = [f for f in golden if mh[f] != golden[f]]
    assert not diff, f"CLI multihost stems differ from single-process: {diff}"
    print(
        f"cli multihost run ok: {len(mh)} stems byte-match the "
        "single-process CLI run",
        flush=True,
    )
    shutil.rmtree(work)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--nprocs", type=int, default=1)
    ap.add_argument("--port", type=int, default=29500)
    ap.add_argument("--corpus-dir", default="")
    ap.add_argument("--out-dir", default="")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cli", action="store_true")
    args = ap.parse_args()
    if args.worker:
        return worker_main(args)
    if args.cli:
        return cli_leg()
    return orchestrate(args.quick)


if __name__ == "__main__":
    sys.exit(main())
