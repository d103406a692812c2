"""Corpus IO overlap: PrefetchReader / OrderedAsyncWriter (runtime/loader.py).

The reference's host IO is synchronous (zen/offline.h:88-117, 193-253);
at corpus scale the driver overlaps decode/compute/encode. These tests
pin (a) unit semantics of the two primitives, (b) stems byte-identical
with prefetch on vs off, (c) MEASURED overlap via injected IO delays
(the same injected-delay wall-clock-bound pattern as the PP overlap
test in test_runtime.py), and (d) crash-consistency: a writer failure
journals only durably-written tracks and the run resumes cleanly.
"""
import os
import time

import numpy as np
import pytest

from zen_tpu.parallel.mesh import make_mesh
from zen_tpu.runtime.loader import OrderedAsyncWriter, PrefetchReader


def _store(n_tracks, fs=1000, length=400, seed=0):
    rng = np.random.default_rng(seed)
    return {
        f"/virt/track{i}.wav": (
            fs, rng.standard_normal(length).astype(np.float32) * 0.5
        )
        for i in range(n_tracks)
    }


def test_prefetch_reader_order_and_values():
    items = list(range(20))
    out = list(PrefetchReader(items, lambda i: i * i, depth=3))
    assert out == [(i, i * i) for i in items]


def test_prefetch_reader_propagates_producer_error():
    def fn(i):
        if i == 3:
            raise ValueError("decode failed")
        return i

    got = []
    with pytest.raises(ValueError, match="decode failed"):
        for item, val in PrefetchReader(range(10), fn, depth=2):
            got.append(item)
    # everything before the failing item was delivered, in order
    assert got == [0, 1, 2]


def test_prefetch_reader_early_close_stops_producer():
    started = []

    def fn(i):
        started.append(i)
        time.sleep(0.01)
        return i

    it = iter(PrefetchReader(range(1000), fn, depth=2))
    next(it)
    it.close()
    time.sleep(0.1)
    n = len(started)
    time.sleep(0.1)
    assert len(started) == n  # producer stopped, not racing ahead
    assert n < 1000


def test_ordered_async_writer_order_and_close():
    done = []
    w = OrderedAsyncWriter()
    for i in range(50):
        w.submit(lambda i=i: done.append(i))
    w.close()
    assert done == list(range(50))


def test_ordered_async_writer_failure_discards_rest():
    done = []
    w = OrderedAsyncWriter()
    w.submit(lambda: done.append(0))
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("disk full")))
    w.submit(lambda: done.append(2))  # must be discarded, not run
    with pytest.raises(RuntimeError, match="disk full"):
        w.close()
    assert done == [0]


def test_ordered_async_writer_failure_is_persistent():
    """Failure stays sticky: every later submit re-raises (a caller
    swallowing one raise must not silently lose subsequent jobs)."""
    done = []
    w = OrderedAsyncWriter()
    w.submit(lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    # wait for the worker to consume the failing job
    deadline = time.time() + 5.0
    while w._exc is None and time.time() < deadline:
        time.sleep(0.005)
    for _ in range(3):
        with pytest.raises(RuntimeError, match="boom"):
            w.submit(lambda: done.append(1))
    with pytest.raises(RuntimeError, match="boom"):
        w.close()
    assert done == []


def test_corpus_prefetch_parity(tmp_path):
    """Stems byte-match between prefetch=2 and prefetch=0."""
    from zen_tpu.drivers.corpus import separate_corpus

    store = _store(5, seed=7)
    mesh = make_mesh({"dp": 2, "sp": 4})

    def run(prefetch, tag):
        out = {}

        def writer(p, fs, a):
            out[os.path.basename(p)] = np.asarray(a).copy()

        res = separate_corpus(
            list(store), str(tmp_path / tag), mesh, hop_h=16, hop_p=8,
            reader=lambda p: store[p], writer=writer, prefetch=prefetch,
        )
        assert res["processed"] == 5
        return out

    a, b = run(0, "sync"), run(2, "pre")
    assert a.keys() == b.keys() and len(a) == 15
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


@pytest.mark.slow
def test_corpus_io_overlap_measured(tmp_path):
    """With injected per-track decode and per-stem encode delays, the
    prefetching run must beat the synchronous run's wall clock — i.e.
    the IO genuinely overlaps compute instead of serializing with it."""
    from zen_tpu.drivers.corpus import separate_corpus

    n = 6
    read_delay, write_delay = 0.06, 0.02
    store = _store(n, seed=3)
    mesh = make_mesh({"dp": 1, "sp": 1})

    def run(prefetch, tag):
        def reader(p):
            time.sleep(read_delay)
            return store[p]

        def writer(p, fs, a):
            time.sleep(write_delay)

        t0 = time.perf_counter()
        res = separate_corpus(
            list(store), str(tmp_path / tag), mesh, hop_h=16, hop_p=8,
            reader=reader, writer=writer, prefetch=prefetch,
        )
        assert res["processed"] == n
        return time.perf_counter() - t0

    # warm the jit caches so compile time doesn't pollute either leg
    run(0, "warm")
    serial = run(0, "serial")
    overlapped = run(2, "pre")
    # serial pays sum(reads) + sum(writes) on the critical path
    # (>= 6*0.06 + 18*0.02 = 0.72 s of pure IO); overlap hides most of
    # one of the two. Demand a solid margin, loose enough for CI noise.
    assert overlapped < serial - 0.15, (serial, overlapped)


def test_corpus_writer_failure_is_crash_consistent(tmp_path):
    """A stem-encode failure mid-run surfaces to the caller; the journal
    holds exactly the durably-written tracks, and a rerun (writer fixed)
    completes only the remainder."""
    from zen_tpu.drivers.corpus import separate_corpus

    store = _store(6, seed=9)
    paths = sorted(store)
    mesh = make_mesh({"dp": 1, "sp": 1})
    out = str(tmp_path / "out")
    written = []
    fail_on = os.path.basename(paths[3])[:-4]

    def writer(p, fs, a):
        if fail_on in os.path.basename(p):
            raise OSError("disk full")
        written.append(os.path.basename(p))

    with pytest.raises(OSError, match="disk full"):
        separate_corpus(
            list(paths), out, mesh, hop_h=16, hop_p=8,
            reader=lambda p: store[p], writer=writer, prefetch=2,
        )
    from zen_tpu.runtime.checkpoint import ProgressJournal

    j = ProgressJournal(os.path.join(out, "progress.jsonl"))
    assert all(j.is_done(p) for p in paths[:3])
    assert not any(j.is_done(p) for p in paths[3:])

    ok = []
    res = separate_corpus(
        list(paths), out, mesh, hop_h=16, hop_p=8,
        reader=lambda p: store[p],
        writer=lambda p, fs, a: ok.append(os.path.basename(p)),
        prefetch=2,
    )
    assert res["done"] == 3 and res["processed"] == 3
    assert len(ok) == 9  # 3 remaining tracks x 3 stems


@pytest.mark.slow
def test_corpus_prefetch_stress_jitter_parity(tmp_path):
    """30 tracks with RANDOM per-call reader/writer delays: whatever
    thread interleaving the jitter produces, the prefetching run's
    stems and journal must equal the synchronous run's (order, names,
    bytes). Guards the loader against timing-dependent reordering."""
    from zen_tpu.drivers.corpus import separate_corpus
    from zen_tpu.runtime.checkpoint import ProgressJournal

    n = 30
    store = _store(n, length=220, seed=21)
    mesh = make_mesh({"dp": 2, "sp": 1})
    delay_rng = np.random.default_rng(77)

    def run(prefetch, tag, jitter):
        out = {}

        def reader(p):
            if jitter:
                time.sleep(float(delay_rng.uniform(0, 0.01)))
            return store[p]

        def writer(p, fs, a):
            if jitter:
                time.sleep(float(delay_rng.uniform(0, 0.004)))
            out[os.path.basename(p)] = np.asarray(a).copy()

        res = separate_corpus(
            sorted(store), str(tmp_path / tag), mesh, hop_h=16, hop_p=8,
            reader=reader, writer=writer, prefetch=prefetch,
        )
        assert res["processed"] == n
        j = ProgressJournal(str(tmp_path / tag / "progress.jsonl"))
        assert all(j.is_done(p) for p in store)
        return out

    base = run(0, "sync", jitter=False)
    jittered = run(3, "jit", jitter=True)
    assert base.keys() == jittered.keys() and len(base) == 3 * n
    for k in base:
        np.testing.assert_array_equal(base[k], jittered[k], err_msg=k)
