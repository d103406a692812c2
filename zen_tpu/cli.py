"""zen CLI — flag-compatible with the reference `zen` binary.

Subcommands (reference: zen/main.cu:10-93):

  zen offline -i in.wav [--hps [hop-h beta-h hop-p beta-p]]
      [-o prefix] [--cpu] [--sse] [--soft-mask] [--nocopybord]
      [--only-percussive]
  zen fakert  -i in.wav [--hps [hop beta]] [-o out.wav]
      [--cpu] [--sse] [--soft-mask] [--nocopybord]

Mapping of the reference's backend/border flags onto the TPU build:
--cpu selects the 'replicate' filter border (the reference CPU/IPP
behavior) and also pins JAX to its CPU backend; --nocopybord selects
the 'valid' border. Default is 'wrap' (reference GPU + copybord).

Output contract preserved: the param echo block, audio info block,
timing line, plus one machine-readable JSON metrics line (SURVEY.md
§5.5) for benchmark drivers.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _border(args) -> str:
    if getattr(args, "cpu", False):
        return "replicate"
    if getattr(args, "nocopybord", False):
        return "valid"
    return "wrap"


def _add_common(p):
    p.add_argument("-i", "--input", required=True, help="input wav file")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--sse", action="store_true")
    p.add_argument("--soft-mask", action="store_true")
    p.add_argument("--nocopybord", action="store_true")


def _add_impl_flags(p):
    """The op-seam performance knobs (docs/PERFORMANCE.md): the
    precision ladder of the MXU transform path and the median kernel
    selection — product-reachable, not library-only."""
    p.add_argument(
        "--fft-impl",
        choices=("auto", "xla", "dft", "dft_bf16", "dft_f32"),
        default="auto",
        help="transform seam: 'dft_bf16' trades ~4e-3 rel err for "
        "~35%% more serving throughput; 'dft_f32' is exact-precision "
        "verification; default 'auto' picks per workload",
    )
    p.add_argument(
        "--median-impl",
        choices=("auto", "xla", "pallas"),
        default="auto",
        help="median kernel seam ('auto' = Pallas kernels on TPU)",
    )
    p.add_argument(
        "--stream-state",
        choices=("f32", "bf16"),
        default="f32",
        help="dtype of the streaming feature history: 'bf16' halves "
        "the HBM-bound carry traffic at wide serving fleets (the "
        "512-stream bound, docs/PERFORMANCE.md) for bf16-quantized "
        "median features; offline paths ignore it",
    )


def _impl_kw(args):
    return dict(
        fft_impl=getattr(args, "fft_impl", "auto"),
        median_impl=getattr(args, "median_impl", "auto"),
        stream_state=getattr(args, "stream_state", "f32"),
    )


def _echo(lines):
    print("\n".join(lines))


def cmd_offline(args) -> int:
    from .drivers.offline import HPRIOffline
    from .io.audio import peak_normalize, read_audio_mono, write_audio_pcm16

    _echo(
        [
            "Running zen-offline with the following params:",
            f"\tinfile: {args.input}",
            f"\toutfile_prefix: {args.out_prefix or ''}",
            f"\tonly_percussive: {int(args.only_percussive)}",
            "\tdo hps: yes" if args.hps is not None else "\tdo hps: no",
        ]
    )
    hop_h, beta_h, hop_p, beta_p = 4096, 2.0, 256, 2.0
    if args.hps is not None:
        vals = args.hps + [None] * (4 - len(args.hps))
        hop_h = int(vals[0]) if vals[0] is not None else hop_h
        beta_h = float(vals[1]) if vals[1] is not None else beta_h
        hop_p = int(vals[2]) if vals[2] is not None else hop_p
        beta_p = float(vals[3]) if vals[3] is not None else beta_p
        _echo(
            [
                f"\t\tharmonic hop: {hop_h}",
                f"\t\tharmonic beta: {beta_h}",
                f"\t\tpercussive hop: {hop_p}",
                f"\t\tpercussive beta: {beta_p}",
                "\t\tmask: soft/Wiener" if args.soft_mask else "\t\tmask: hard/binary",
                "\t\tfilter: sse" if args.sse else "\t\tfilter: median",
            ]
        )
    _echo([f"\tcompute: tpu-native jax (border={_border(args)})"])

    fs, audio = read_audio_mono(args.input)
    _echo(
        [
            "Audio file info:",
            f"\tsample rate: {fs}",
            f"\tlen samples: {len(audio)}",
            f"\tseconds: {len(audio) / fs}",
        ]
    )

    if args.hps is not None:
        sep = HPRIOffline(
            fs,
            hop_h,
            hop_p,
            beta_h,
            beta_p,
            border=_border(args),
            use_sse=args.sse,
            soft_mask=args.soft_mask,
            strict_ref=args.strict_ref,
            **_impl_kw(args),
        )
        # overlap-save for long tracks (the batched form's
        # spectrogram costs ~160 floats of HBM per SAMPLE — duration
        # alone doesn't determine memory); same threshold as corpus
        from .drivers.offline import LONG_TRACK_SAMPLES

        mesh = None
        if getattr(args, "mesh", ""):
            # frequency tensor parallelism: every device computes a
            # partial DFT over its own bin slice, frequency-median
            # halos ride ppermute rings, stems reassemble via psum
            # (parallel/sharded.py:_tp_shard_fn). nfft <= 16k fits one
            # chip, so this exists to prove/compose the axis
            # (SURVEY.md §2.3 TP row), not as the throughput default.
            from .parallel.mesh import make_mesh
            from .parallel.sharded import tp_hpri_offline

            axes, err = _parse_mesh_axes(args.mesh, ("tp",))
            if err:
                print(f"zen offline: {err}", file=sys.stderr)
                return 2
            if sep.cfg_h.border != "wrap":
                print(
                    "zen offline: --mesh tp requires the wrap border "
                    "(drop --nocopybord): the sharded frequency-median "
                    "halo ring is circular",
                    file=sys.stderr,
                )
                return 2
            n_tp = axes["tp"]
            for cfg in (sep.cfg_h, sep.cfg_p):
                if cfg.nfft % n_tp:
                    print(
                        f"zen offline: tp={n_tp} must divide both pass "
                        f"nffts (got nfft={cfg.nfft} at hop={cfg.hop})",
                        file=sys.stderr,
                    )
                    return 2
            mesh = make_mesh(axes)
            _echo([f"\tmesh: tp={n_tp} (frequency-sharded)"])

        long_track = len(audio) > LONG_TRACK_SAMPLES
        t1 = time.perf_counter()
        if mesh is not None:
            h, p, r = tp_hpri_offline(audio, sep.cfg_h, sep.cfg_p, mesh)
        elif args.blocked or long_track:
            if long_track and not args.blocked:
                print(
                    "long track: using constant-memory blocked mode"
                )
            h, p, r = sep.process_blocked(audio)
        else:
            h, p, r = sep.process(audio)
        import jax

        jax.block_until_ready((h, p, r))
        dur_ms = 1000 * (time.perf_counter() - t1)
        print(f"TPU-native: 2-pass HPR-I-Offline took {dur_ms:.0f} ms")
        print(
            json.dumps(
                {
                    "metric": "offline_2pass_ms",
                    "value": dur_ms,
                    "unit": "ms",
                    "audio_seconds": len(audio) / fs,
                }
            )
        )
        stems = {"harm": h, "perc": p, "residual": r}
    else:
        stems = {"harm": audio, "perc": audio, "residual": audio}

    if args.out_prefix:
        import numpy as np

        names = ["perc"] if args.only_percussive else ["harm", "perc", "residual"]
        for name in names:
            write_audio_pcm16(
                f"{args.out_prefix}_{name}.{args.stem_format}",
                fs,
                peak_normalize(np.asarray(stems[name])),
            )
    return 0


def cmd_fakert(args) -> int:
    from .drivers.realtime import HPRRealtime
    from .engine.config import OUTPUT_PERCUSSIVE
    from .io.audio import peak_normalize, read_audio_mono, write_audio_pcm16

    hop, beta = 256, 2.0
    if args.hps is not None:
        vals = args.hps + [None] * (2 - len(args.hps))
        hop = int(vals[0]) if vals[0] is not None else hop
        beta = float(vals[1]) if vals[1] is not None else beta
    _echo(
        [
            "Running zen-fakert with the following params:",
            f"\tinfile: {args.input}",
            f"\toutfile: {args.output or ''}",
            "\tdo hps: yes" if args.hps is not None else "\tdo hps: no",
            f"\t\thop: {hop}",
            f"\t\tbeta: {beta}",
            "\t\tmask: soft/Wiener" if args.soft_mask else "\t\tmask: hard/binary",
            "\t\tfilter: sse" if args.sse else "\t\tfilter: median",
            f"\tcompute: tpu-native jax (border={_border(args)})",
        ]
    )
    fs, audio = read_audio_mono(args.input)
    _echo(
        [
            "Audio file info:",
            f"\tsample rate: {fs}",
            f"\tlen samples: {len(audio)}",
            f"\tseconds: {len(audio) / fs}",
        ]
    )

    n_hops = -(-len(audio) // hop)
    delta_t_ms = 1000.0 * hop / fs
    print(
        f"Slicing buffer size {len(audio)} into {n_hops} chunks of size {hop}"
    )

    if args.hps is None:
        out = audio
        avg_us = 0.0
    else:
        rt = HPRRealtime(
            fs,
            hop,
            beta,
            outputs=OUTPUT_PERCUSSIVE,
            border=_border(args),
            use_sse=args.sse,
            soft_mask=args.soft_mask,
            **_impl_kw(args),
        )
        block_hops = max(1, int(args.block_hops))
        tail = n_hops % block_hops
        warm = (block_hops, tail) if tail else (block_hops,)
        rt.warmup(block_sizes=warm)  # incl. the ragged tail shape —
        # a fresh compile inside the timed loop would corrupt avg_us
        t1 = time.perf_counter()
        outs = rt.process_stream(audio, block_hops=block_hops)
        t2 = time.perf_counter()
        out = outs[1][: len(audio)]
        avg_us = 1e6 * (t2 - t1) / n_hops
        print(
            f"PRealtime TPU:  Δn = {hop}, Δt(ms) = {delta_t_ms:.4f},"
            f" average processing duration(us) = {avg_us:.2f}"
        )
        print(
            json.dumps(
                {
                    "metric": "fakert_us_per_hop",
                    "value": avg_us,
                    "unit": "us",
                    "hop": hop,
                    "block_hops": block_hops,
                    "budget_us": delta_t_ms * 1000,
                    "rtf": avg_us / (delta_t_ms * 1000),
                }
            )
        )

    if args.output:
        write_audio_pcm16(args.output, fs, peak_normalize(out))
    return 0


def cmd_pitch_track(args) -> int:
    """Pitch tracking demo: MPM on harmonic-separated 4096-hops vs raw
    (reference: demos/pitch-tracking/main.cu:33-125)."""
    from .apps.mpm import MPM
    from .drivers.realtime import HPRRealtime
    from .engine.config import OUTPUT_HARMONIC
    from .io.audio import read_audio_mono

    chunk = 4096
    fs, audio = read_audio_mono(args.input)
    print(f"Slicing wav file into chunks of {chunk} samples...")
    print("Audio file info:")
    print(f"\tsample rate: {fs}")
    print(f"\tlen samples: {len(audio)}")
    print(f"\tseconds: {len(audio) / fs}")

    n_chunks = len(audio) // chunk
    rt = HPRRealtime(fs, chunk, 2.5, outputs=OUTPUT_HARMONIC)
    harm = rt.process_stream(audio[: n_chunks * chunk], block_hops=8)[0]
    mpm = MPM(chunk, fs)
    raw_chunks = audio[: n_chunks * chunk].reshape(n_chunks, chunk)
    harm_chunks = harm[: n_chunks * chunk].reshape(n_chunks, chunk)
    p_h = mpm.pitch_batch(harm_chunks)
    p_r = mpm.pitch_batch(raw_chunks)
    t = 0.0
    for ph, pr in zip(p_h, p_r):
        print(f"t: {t:.2f},\tpitch (+HPR): {ph:.2f},\tpitch (-HPR): {pr:.2f}")
        t += chunk / fs
    return 0


def cmd_beat_track(args) -> int:
    """Beat tracking demo: BTrack on percussive-separated 256-hops vs
    raw (reference: demos/beat-tracking/main.cu:33-146)."""
    import numpy as np

    from .apps.btrack import frames_from_hops, odf_batch, track_beats_from_odf
    from .drivers.realtime import HPRRealtime
    from .engine.config import OUTPUT_PERCUSSIVE
    from .io.audio import read_audio_mono

    chunk = 256
    fs, audio = read_audio_mono(args.input)
    print(f"Slicing wav file into chunks of {chunk} samples...")
    print("Audio file info:")
    print(f"\tsample rate: {fs}")
    print(f"\tlen samples: {len(audio)}")
    print(f"\tseconds: {len(audio) / fs}")

    n_chunks = len(audio) // chunk
    cut = audio[: n_chunks * chunk]
    rt = HPRRealtime(fs, chunk, 2.5, outputs=OUTPUT_PERCUSSIVE)
    perc = rt.process_stream(cut, block_hops=64)[1][: len(cut)]

    beats = {}
    for name, sig in (("+HPR", perc), ("-HPR", cut)):
        odf = np.asarray(odf_batch(frames_from_hops(sig)))
        flags, _ = track_beats_from_odf(odf, fs)
        beats[name] = [
            f"{n * chunk / fs:.4f}" for n in np.nonzero(flags)[0]
        ]
    print("+HPR beat timestamps: " + " ".join(beats["+HPR"]))
    print("-HPR beat timestamps: " + " ".join(beats["-HPR"]))
    return 0


def _parse_mesh_axes(spec: str, allowed: tuple):
    """Parse 'dp=2,sp=4' into {axis: size}. Returns (axes, None) or
    (None, error_message) — shared by the stream and corpus commands
    so malformed specs get the clean stderr+exit-1 path everywhere."""
    axes = {}
    for part in spec.split(","):
        if "=" not in part:
            return None, f"bad mesh axis '{part}' (want name=N)"
        k, v = part.split("=", 1)
        try:
            n = int(v)
        except ValueError:
            return None, f"bad mesh axis size '{part}' (want an integer)"
        if n < 1:
            return None, f"mesh axis size must be >= 1 (got '{part}')"
        k = k.strip()
        if k in axes:
            return None, (
                f"duplicate mesh axis '{k}' (a typo like dp=2,dp=8 "
                f"would silently keep only the last value)"
            )
        axes[k] = n
    unknown = set(axes) - set(allowed)
    if unknown:
        return None, (
            f"mesh supports the {','.join(allowed)} "
            f"axis only (got {sorted(unknown)})"
            if len(allowed) == 1
            else f"mesh supports axes {','.join(allowed)} only "
            f"(got {sorted(unknown)})"
        )
    return axes, None


def cmd_stream(args) -> int:
    """Unix-pipe streaming: raw float32 PCM on stdin -> one separated
    stem as raw float32 on stdout, causally, block by block. The
    production-serving analog of the reference's virtual-mic plumbing
    (scripts/*.sh): e.g.

      ffmpeg -i in.wav -f f32le -ac 1 -ar 44100 - \\
        | zen stream --fs 44100 --stem percussive > perc.f32

    --streams N serves N independent streams through ONE pipe and ONE
    device program (MultiStreamHPR): stdin/stdout carry N
    sample-interleaved float32 streams, exactly the layout of
    N-channel f32le PCM (so `ffmpeg -ac N -f f32le` composes
    directly).
    """
    import numpy as np

    from .drivers.realtime import HPRRealtime, MultiStreamHPR
    from .engine.config import (
        OUTPUT_ALL,
        OUTPUT_HARMONIC,
        OUTPUT_PERCUSSIVE,
    )

    stem_flags = {
        "harmonic": (OUTPUT_HARMONIC, 0),
        "percussive": (OUTPUT_PERCUSSIVE, 1),
        # residual is defined as 1-(hmask+pmask): both other masks
        # must be computed or it degenerates to a passthrough (the
        # reference has the same trap — unwritten mask buffers)
        "residual": (OUTPUT_ALL, 2),
    }
    outputs, idx = stem_flags[args.stem]
    n_streams = max(1, args.streams)
    common = dict(
        outputs=outputs,
        border=_border(args),
        use_sse=args.sse,
        soft_mask=args.soft_mask,
        **_impl_kw(args),
    )
    mesh = None
    mesh_desc = ""
    if getattr(args, "mesh", ""):
        # multi-chip serving: shard the stream axis over a dp mesh —
        # pure data parallelism, zero collectives (BASELINE configs[3]
        # scaled out; the dryrun_multichip leg keeps this path honest)
        from .parallel.mesh import make_mesh

        axes, err = _parse_mesh_axes(args.mesh, ("dp",))
        if err:
            print(f"stream {err}", file=sys.stderr)
            return 1
        if n_streams % axes["dp"]:
            print(
                f"--streams {n_streams} not divisible by dp={axes['dp']}",
                file=sys.stderr,
            )
            return 1
        mesh = make_mesh(axes)
        mesh_desc = f"dp={axes['dp']}"
    multi = n_streams > 1 or mesh is not None  # mesh implies MultiStream
    t_proc = time.perf_counter()  # before warmup: captures compile cost
    if multi:
        ms = MultiStreamHPR(
            n_streams, args.fs, args.hop, args.beta, mesh=mesh, **common
        )
        cfg = ms.cfg
        latency = args.hop  # same one-hop OLA latency per stream
        ms.warmup(block_sizes=(args.block_hops,))  # compile before
        # 'ready': a live producer must not see the pipe stall for
        # the first block's jit
    else:
        rt = HPRRealtime(args.fs, args.hop, args.beta, **common)
        cfg = rt.cfg
        latency = rt.latency_samples
        rt.warmup(block_sizes=(args.block_hops,))
    # calibrate the pipe to unit gain: the engine carries the
    # reference's nfft*COLA synthesis scale (docs/PERFORMANCE.md);
    # dividing by synth_scale returns input-scale float32 PCM (within
    # the sqrt-Hann OLA's inherent +-1.5 dB frame ripple). --raw-scale
    # keeps the engine scale.
    out_scale = 1.0 if args.raw_scale else 1.0 / cfg.synth_scale
    print(
        f"zen stream ready: fs={args.fs:.0f} hop={args.hop} "
        f"stem={args.stem} block={args.block_hops} "
        f"streams={n_streams} "
        f"latency={latency + args.block_hops * args.hop} samples",
        file=sys.stderr,
        flush=True,
    )
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    block_bytes = args.block_hops * args.hop * 4 * n_streams

    def read_full_block():
        # BufferedReader.read(n) only guarantees a full read at EOF for
        # regular pipes; interactive/raw stdin can short-read mid-stream.
        # Treating a short read as the ragged tail would zero-pad and
        # advance the engine past phantom silence hops, desynchronizing
        # all later output — so loop until the block is full or true EOF.
        parts = []
        got = 0
        while got < block_bytes:
            part = stdin.read(block_bytes - got)
            if not part:
                break
            parts.append(part)
            got += len(part)
        return b"".join(parts)

    hops_out = 0
    t_start = time.perf_counter()
    t_first = t_last = None
    while True:
        buf = read_full_block()
        if not buf:
            break
        if len(buf) % 4:  # producer died mid-sample: drop the partial
            print(
                f"zen stream: dropping {len(buf) % 4} trailing bytes "
                "(not a whole float32)",
                file=sys.stderr,
            )
            buf = buf[: len(buf) - len(buf) % 4]
            if not buf:
                break
        samples = np.frombuffer(buf, np.float32)
        if n_streams > 1 and len(samples) % n_streams:
            # producer died mid-frame: drop the partial frame
            samples = samples[: len(samples) - len(samples) % n_streams]
            if not len(samples):
                break
        n = len(samples) // n_streams  # per-stream samples
        block_len = args.block_hops * args.hop
        if n < block_len:  # tail: zero-pad
            full = np.zeros(block_len * n_streams, np.float32)
            full[: n * n_streams] = samples
            samples = full
        if multi:
            # de-interleave [n*streams] -> [streams, B, hop]
            blocks = np.ascontiguousarray(
                samples.reshape(-1, n_streams).T
            ).reshape(n_streams, args.block_hops, args.hop)
            outs = ms.process_block(blocks)  # [S, E, B*hop] compact
            chunk = np.asarray(outs)[:, ms.stem_rows[args.stem], :n]
            out_frames = np.ascontiguousarray(chunk.T)  # re-interleave
        else:
            outs = rt.process_block(samples.reshape(-1, args.hop))
            out_frames = np.asarray(outs[idx])[:n]
        if out_scale != 1.0:
            out_frames = out_frames * np.float32(out_scale)
        stdout.write(out_frames.astype(np.float32, copy=False).tobytes())
        stdout.flush()
        if t_first is None:
            t_first = time.perf_counter()
        t_last = time.perf_counter()
        hops_out += -(-n // args.hop)
    print(f"zen stream done: {hops_out} hops", file=sys.stderr)
    wall = (t_last - t_start) if t_last is not None else 0.0
    per_hop_us = wall / max(hops_out, 1) * 1e6
    print(
        json.dumps(
            {
                "metric": "stream_serving",
                "streams": n_streams,
                "mesh": mesh_desc or "single-chip",
                "hops_per_stream": hops_out,
                "wall_s": round(wall, 6),
                # end-to-end pipe rate (includes stdin/stdout IO):
                # samples through the engine per wall second, all
                # streams combined, and the per-stream block latency
                "samples_per_s": (
                    round(hops_out * args.hop * n_streams / wall)
                    if wall > 0
                    else None
                ),
                "us_per_hop": round(per_hop_us, 3),
                # warmup_s = compile/warmup wall before 'ready' (zero
                # on a warm XLA cache); first_block_s = wall from
                # post-warmup ready to the first block OUT. A producer
                # attaching to a cold process waits warmup_s +
                # first_block_s; one attaching to a prewarmed server
                # waits first_block_s.
                "warmup_s": round(t_start - t_proc, 6),
                "first_block_s": (
                    round(t_first - t_start, 6)
                    if t_first is not None
                    else None
                ),
                "block_latency_samples": latency
                + args.block_hops * args.hop,
            }
        ),
        file=sys.stderr,
        flush=True,
    )
    return 0


def cmd_corpus(args) -> int:
    """Pod-scale resumable corpus separation (BASELINE configs[4]):
    tracks batched over the mesh's dp axis, time blocks over sp, with
    crash-safe per-track journaling (drivers/corpus.py)."""
    import glob as globmod

    from .drivers.corpus import separate_corpus
    from .parallel.mesh import default_mesh, make_mesh

    paths = sorted(
        p for pat in args.inputs for p in globmod.glob(pat)
    )
    if not paths:
        print("no input tracks matched", file=sys.stderr)
        return 1
    if args.nprocs <= 1 and (args.coordinator or args.proc_id):
        # the inverse omission (coordinator/proc-id but the default
        # --nprocs 1) must not silently run N independent
        # single-process separations against the same out_dir
        print(
            "corpus: --coordinator/--proc-id need --nprocs >= 2",
            file=sys.stderr,
        )
        return 1
    if args.nprocs > 1:
        # multi-host bootstrap (BASELINE configs[4]: corpora over N>=2
        # hosts): join the jax.distributed cluster BEFORE any device
        # query so make_mesh sees the global device set. Every process
        # runs this same command with its own --proc-id; the corpus
        # driver already handles the rest (replicated batches, only
        # process 0 writes stems/journal — drivers/corpus.py).
        if not args.coordinator:
            print(
                "corpus: --nprocs needs --coordinator HOST:PORT",
                file=sys.stderr,
            )
            return 1
        if not 0 <= args.proc_id < args.nprocs:
            print(
                f"corpus: --proc-id {args.proc_id} outside 0..{args.nprocs - 1}",
                file=sys.stderr,
            )
            return 1
        import jax

        from .parallel.mesh import distributed_init

        distributed_init(args.coordinator, args.nprocs, args.proc_id)
        if jax.process_count() != args.nprocs:
            print(
                f"corpus: distributed bootstrap failed "
                f"(process_count={jax.process_count()}, "
                f"expected {args.nprocs})",
                file=sys.stderr,
            )
            return 1
    if args.mesh:
        axes, err = _parse_mesh_axes(args.mesh, ("dp", "sp"))
        if err:
            print(f"corpus {err}", file=sys.stderr)
            return 1
        axes.setdefault("dp", 1)
        axes.setdefault("sp", 1)
        mesh = make_mesh(axes)
    else:
        mesh = default_mesh(n_channels_hint=len(paths))
    print(
        f"corpus: {len(paths)} tracks, mesh "
        f"{dict(zip(mesh.axis_names, mesh.devices.shape))}, out={args.out_dir}"
    )
    hop_h, beta_h, hop_p, beta_p = 4096, 2.0, 256, 2.0
    if args.hps:
        vals = args.hps + [None] * (4 - len(args.hps))
        hop_h = int(vals[0]) if vals[0] is not None else hop_h
        beta_h = float(vals[1]) if vals[1] is not None else beta_h
        hop_p = int(vals[2]) if vals[2] is not None else hop_p
        beta_p = float(vals[3]) if vals[3] is not None else beta_p
    res = separate_corpus(
        paths,
        args.out_dir,
        mesh,
        hop_h=hop_h,
        hop_p=hop_p,
        beta_h=beta_h,
        beta_p=beta_p,
        pp=bool(getattr(args, "pp", False)),
        prefetch=max(0, int(getattr(args, "prefetch", 2))),
        stem_format=getattr(args, "stem_format", "wav"),
        **_impl_kw(args),
    )
    print(json.dumps({"metric": "corpus_tracks", **res}))
    return 0


def cmd_synth(args) -> int:
    """Write a deterministic synthetic test mixture (+ ground truth)."""
    import numpy as np

    from .io.audio import write_wav_pcm16
    from .io.synth import synth_mixture

    harm, perc, mix = synth_mixture(
        fs=args.fs,
        seconds=args.seconds,
        bpm=args.bpm,
        hits_per_beat=args.hits_per_beat,
        sawtooth=args.sawtooth,
        vibrato_cents=args.vibrato_cents,
        seed=args.seed,
    )
    fs = int(args.fs)
    scale = 1.0 / max(np.abs(mix).max(), 1e-9)  # one shared scale so
    # the stems stay sample-aligned with the mixture
    write_wav_pcm16(args.output, fs, mix * scale)
    print(f"wrote {args.output} ({args.seconds}s @ {fs} Hz)")
    if args.stems:
        base = args.output[:-4] if args.output.endswith(".wav") else args.output
        for name, sig in (("harm", harm), ("perc", perc)):
            path = f"{base}_{name}.wav"
            write_wav_pcm16(path, fs, sig * scale)
            print(f"wrote {path}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="zen",
        description="zen-tpu: TPU-native harmonic/percussive source separation",
    )
    sub = ap.add_subparsers(dest="command", required=True)

    off = sub.add_parser(
        "offline", help="offline (process entire songs at a time)"
    )
    _add_common(off)
    off.add_argument(
        "--hps",
        nargs="*",
        default=None,
        metavar=("hop-h", "beta-h"),
        help="2-pass HPR-iterative, defaults: harmonic=4096,2.0 percussive=256,2.0",
    )
    off.add_argument("-o", "--out-prefix", default="")
    off.add_argument("--only-percussive", action="store_true")
    off.add_argument(
        "--blocked",
        action="store_true",
        help="constant-memory overlap-save mode (auto for tracks > 10 min)",
    )
    off.add_argument(
        "--strict-ref",
        action="store_true",
        help="bit-compatible reference quirks: pass-2 residual stem is "
        "silence, exactly like the upstream GPU binary (hps.cu:200-204)",
    )
    off.add_argument(
        "--stem-format", choices=("wav", "flac", "wv"), default="wav",
        help="stem container: PCM16 wav (reference behavior) or "
        "lossless 16-bit FLAC (from-scratch encoder, ~half the size)",
    )
    off.add_argument(
        "--mesh",
        default="",
        help="shard the frequency axis over a device mesh, e.g. "
        "'tp=4' (partial-DFT tensor parallelism; tp must divide "
        "both pass nffts = 4*hop)",
    )
    _add_impl_flags(off)
    off.set_defaults(func=cmd_offline)

    frt = sub.add_parser(
        "fakert", help="fakert (use slim rt algorithms with wav files)"
    )
    _add_common(frt)
    frt.add_argument(
        "--hps",
        nargs="*",
        default=None,
        metavar=("hop", "beta"),
        help="1-pass P-realtime, defaults: 256,2.0",
    )
    frt.add_argument("-o", "--output", default="")
    frt.add_argument(
        "--block-hops",
        default=32,
        type=int,
        help="hops per device dispatch (TPU streaming granularity)",
    )
    _add_impl_flags(frt)
    frt.set_defaults(func=cmd_fakert)

    for name, func, helptext in (
        ("pitch-track", cmd_pitch_track, "MPM pitch tracking demo (+/- HPR)"),
        ("beat-track", cmd_beat_track, "BTrack beat tracking demo (+/- HPR)"),
    ):
        p = sub.add_parser(name, help=helptext)
        p.add_argument("-i", "--input", required=True)
        p.set_defaults(func=func)

    stp = sub.add_parser(
        "stream",
        help="raw float32 stdin -> separated stem on stdout (pipe mode)",
    )
    stp.add_argument("--fs", type=float, default=44100.0)
    stp.add_argument("--hop", type=int, default=256)
    stp.add_argument("--beta", type=float, default=2.0)
    stp.add_argument(
        "--stem",
        choices=("harmonic", "percussive", "residual"),
        default="percussive",
    )
    stp.add_argument("--block-hops", type=int, default=16)
    stp.add_argument(
        "--streams",
        type=int,
        default=1,
        help="serve N sample-interleaved streams (N-channel f32le "
        "layout) through one pipe and one device program",
    )
    stp.add_argument(
        "--mesh",
        default="",
        help="shard streams over a device mesh, e.g. 'dp=4' "
        "(multi-chip serving; --streams must divide evenly)",
    )
    stp.add_argument(
        "--raw-scale",
        action="store_true",
        help="emit the engine's unnormalized scale instead of unit gain",
    )
    stp.add_argument("--cpu", action="store_true")
    stp.add_argument("--sse", action="store_true")
    stp.add_argument("--soft-mask", action="store_true")
    stp.add_argument("--nocopybord", action="store_true")
    _add_impl_flags(stp)
    stp.set_defaults(func=cmd_stream)

    cor = sub.add_parser(
        "corpus",
        help="resumable multi-track corpus separation over a device mesh",
    )
    cor.add_argument(
        "-i", "--inputs", nargs="+", required=True,
        help="track paths or globs",
    )
    cor.add_argument("-o", "--out-dir", required=True)
    cor.add_argument(
        "--hps", nargs="*", default=None,
        metavar=("hop-h", "beta-h"),
        help="2-pass params, defaults 4096 2.0 256 2.0",
    )
    cor.add_argument(
        "--mesh", default="",
        help="mesh axes, e.g. 'dp=2,sp=4' (default: auto over devices)",
    )
    cor.add_argument(
        "--pp", action="store_true",
        help="pipeline-parallel cascade: track i+1's pass 1 overlaps "
        "track i's pass 2 on two devices (short tracks)",
    )
    cor.add_argument(
        "--prefetch", type=int, default=2, metavar="N",
        help="decode N tracks ahead and encode stems on a background "
        "thread, overlapping host IO with device compute (0 = "
        "synchronous IO; default 2)",
    )
    cor.add_argument(
        "--coordinator", default="", metavar="HOST:PORT",
        help="multi-host run: coordinator address (same on every "
        "process); run this command once per host with its --proc-id",
    )
    cor.add_argument(
        "--nprocs", type=int, default=1,
        help="multi-host run: total process count",
    )
    cor.add_argument(
        "--proc-id", type=int, default=0,
        help="multi-host run: this process's rank (0..nprocs-1)",
    )
    cor.add_argument(
        "--stem-format", choices=("wav", "flac", "wv"), default="wav",
        help="stem container: PCM16 wav or lossless 16-bit FLAC",
    )
    _add_impl_flags(cor)
    cor.set_defaults(func=cmd_corpus)

    syn = sub.add_parser(
        "synth",
        help="generate a synthetic harmonic+percussive test mixture "
        "(the reference sample wavs ship as git-lfs pointers)",
    )
    syn.add_argument("-o", "--output", required=True, help="mixture wav path")
    syn.add_argument("--fs", type=float, default=44100.0)
    syn.add_argument("--seconds", type=float, default=4.0)
    syn.add_argument("--bpm", type=float, default=120.0)
    syn.add_argument("--hits-per-beat", type=int, default=1)
    syn.add_argument("--sawtooth", action="store_true")
    syn.add_argument("--vibrato-cents", type=float, default=0.0)
    syn.add_argument("--seed", type=int, default=42)
    syn.add_argument(
        "--stems",
        action="store_true",
        help="also write <out>_harm.wav / <out>_perc.wav ground truth",
    )
    syn.set_defaults(func=cmd_synth)

    sub.add_parser("version")
    # flag forms matching the reference CLI (`zen -v | --version`)
    from . import __version__

    ap.add_argument(
        "-v", "--version", action="version", version=f"version {__version__}"
    )
    return ap


def main(argv=None) -> int:
    import os

    # one shared platform policy for every entry point (scrubs the
    # image's global JAX_PLATFORMS=axon, honors ZEN_TPU_PLATFORM — the
    # CLI's explicit backend knob — and virtual-mesh XLA_FLAGS)
    from .runtime.platform import pin_platform
    from .runtime.xla_cache import enable_compilation_cache

    pin_platform()
    enable_compilation_cache()
    if os.environ.get("ZEN_TPU_DEBUG_NANS"):
        # sanitizer analog (SURVEY.md §5.2): fail loudly on NaN/Inf in
        # any jitted computation (reference: cuda-memcheck CTest label)
        import jax

        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)
    args = build_parser().parse_args(argv)
    if getattr(args, "cpu", False):
        # the reference's --cpu selects the IPP backend; here it pins
        # the JAX CPU platform (and 'replicate' borders, see _border).
        # Must run before the first computation initializes a backend.
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized (e.g. tests in-process)
    if args.command == "version":
        from . import __version__

        print(f"version {__version__}")
        return 0
    return args.func(args)


if __name__ == "__main__":
    sys.exit(main())
