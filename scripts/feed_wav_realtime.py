#!/usr/bin/env python
"""Simulated live input: stream a wav file into the LiveStream service
at real-time rate and write the separated percussive stem.

The analog of the reference's virtual-mic plumbing
(reference: scripts/zen_mic.sh + scripts/sine_tone_mic.sh, which pipe
ffmpeg into a PulseAudio pipe-source); here the producer thread plays
the wav into the native ring buffer in hop-sized chunks at wall-clock
rate, exercising the full real-time path end-to-end.

Usage: python scripts/feed_wav_realtime.py in.wav out_perc.wav [hop]
"""
import sys
import time

import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from zen_tpu.io.audio import read_audio_mono, write_wav_pcm16, peak_normalize
    from zen_tpu.runtime.stream import LiveStream

    infile, outfile = sys.argv[1], sys.argv[2]
    hop = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    fs, audio = read_audio_mono(infile)
    # cooperative (polled) mode: device dispatch stays on the main
    # thread (see LiveStream.poll); the producer pacing loop doubles
    # as the service loop
    ls = LiveStream(float(fs), hop, 2.0, block_hops=16).warmup()

    n_hops = len(audio) // hop
    hop_dt = hop / fs
    out = []
    t0 = time.perf_counter()
    for n in range(n_hops):
        # pace the producer at real time
        target = t0 + n * hop_dt
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        ls.push(audio[n * hop : (n + 1) * hop])
        ls.poll()
        chunk = ls.pull("percussive", hop)
        if chunk is not None:
            out.append(chunk)
    # drain: poll() only consumes whole blocks, so zero-pad the input
    # ring up to the next full block boundary (plus the tail samples
    # of a non-hop-multiple file), then pull until everything pushed
    # has come back out
    pushed = n_hops * hop
    tail = audio[n_hops * hop :]
    if len(tail):
        ls.push(tail)
        pushed += len(tail)
    block = ls.block_hops * hop
    pad = (-pushed) % block
    if pad:
        ls.push(np.zeros(pad, np.float32))
    expected = pushed  # every pushed sample yields one output sample
    deadline = time.perf_counter() + 5.0
    got = sum(len(c) for c in out)
    while got < expected and time.perf_counter() < deadline:
        ls.poll()
        chunk = ls.pull("percussive", min(hop, expected - got))
        if chunk is None:
            time.sleep(0.002)
            continue
        out.append(chunk)
        got += len(chunk)
    ls.stop()
    y = np.concatenate(out) if out else np.zeros(0, np.float32)
    y = y[: len(audio)]
    print(
        f"streamed {n_hops} hops at real time; recovered {len(y)} samples; "
        f"input overruns={ls.in_ring.overruns}"
    )
    write_wav_pcm16(outfile, fs, peak_normalize(y))


if __name__ == "__main__":
    main()
