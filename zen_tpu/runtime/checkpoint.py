"""Checkpoint / resume.

The reference has none (SURVEY.md §5.4) — its closest mechanism is
reset_buffers + the determinism it is tested for. Here the streaming
hop step is a pure function of an explicit state pytree, so that
state dict *is* the checkpoint: serialize it and a stream can resume
bit-exactly. For pod-scale corpus runs, per-track progress is
journaled so a killed run resumes where it left off.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np


def _pack_state(state, meta: dict | None) -> dict:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    return arrays


def save_stream_state(path: str, state, meta: dict | None = None) -> None:
    """Serialize a StreamState (or any pytree of arrays) + metadata."""
    np.savez(path, **_pack_state(state, meta))


def save_stream_state_durable(path: str, state, meta: dict | None = None) -> None:
    """Crash-consistent save_stream_state: write to a temp file, fsync,
    atomically rename. After this returns, a SIGKILL at ANY point
    leaves either the previous checkpoint or this one — never a
    truncated mix (the mid-track resume path depends on it)."""
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp"
    with open(tmp, "wb") as fh:
        np.savez(fh, **_pack_state(state, meta))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, final)
    # the rename itself must be durable too (a crash could otherwise
    # resurface the old name with the new file lost)
    dfd = os.open(os.path.dirname(final) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def load_stream_state(path: str, like):
    """Restore a pytree saved by save_stream_state; ``like`` provides
    the tree structure (e.g. init_state(cfg)). Returns (state, meta)."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree.flatten(like)
    restored = [
        jax.numpy.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))
    ]
    meta = json.loads(bytes(data["_meta"].tobytes()).decode() or "{}")
    return jax.tree.unflatten(treedef, restored), meta


class ProgressJournal:
    """Append-only journal of completed work items (track ids), for
    resumable corpus runs. Crash-safe: one fsynced JSON line per item."""

    def __init__(self, path: str):
        self.path = path
        self._done = set()
        if os.path.exists(path):
            with open(path) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        self._done.add(json.loads(line)["id"])
                    except (json.JSONDecodeError, KeyError):
                        # a crash mid-append can leave one truncated
                        # trailing line; the item it described was NOT
                        # durably completed, so skipping it is exactly
                        # the resume semantics we want
                        continue

    def is_done(self, item_id: str) -> bool:
        return item_id in self._done

    def mark_done(self, item_id: str, info: dict | None = None) -> None:
        with open(self.path, "a") as fh:
            fh.write(json.dumps({"id": item_id, **(info or {})}) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        self._done.add(item_id)
