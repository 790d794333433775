"""Optimistic concurrency for lifecycle writers.

The corpus commit protocol is marker-rename-last everywhere (encode
groups, delete sidecars, supersede markers, snapshot manifests), which
makes every single writer crash-safe — but two WRITERS interleaving on
one corpus could still race: two deletes deriving the same
content-addressed sidecar id, a vacuum retiring masks while a delete
commits a new one, a restore pinning a group set that a concurrent
rewrite supersedes mid-flight.

This module adds the classic lakehouse answer (optimistic concurrency
over an atomic commit primitive — the same shape as Delta's
commit-log CAS or Iceberg's snapshot CAS, re-expressed over a POSIX
directory):

- ``corpus_generation(out_dir)``: a hash of the COMMITTED-set markers
  (active lineage markers + committed delete sidecars) — the visible
  corpus version.  Any committed write changes it.
- ``commit_lock(out_dir)``: a short-lived mutex (``O_CREAT|O_EXCL``
  lock file under ``_meta/``, stale-broken by age) held only around
  the check-and-rename critical section, never around data work.
- ``WriterSession``: captures the generation when a lifecycle op
  STARTS; every commit the op makes runs inside the lock and first
  verifies the generation still matches (own commits advance the
  expectation).  A concurrent committed writer fails the check and
  raises ``ConcurrentWriteError`` — the op's work products are
  un-committed staging the next run converges over, so the caller can
  simply retry from scratch (``delete_where`` does so automatically).

The work phase (scans, decodes, mask derivation, re-encodes) stays
fully parallel and lock-free — only the commit point serializes, so
the cost at 100 TB is one stat+rename under a mutex per commit.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from contextlib import contextmanager

__all__ = [
    "ConcurrentWriteError",
    "WriterSession",
    "commit_lock",
    "corpus_generation",
]


class ConcurrentWriteError(RuntimeError):
    """Another writer committed to this corpus between this op's start
    and its commit point.  The op committed nothing in the conflicted
    step; re-run it to converge over the new state."""


# process-local registry of lock/claim files THIS process currently
# holds or is actively acquiring: a lock file carrying our pid with a
# ZERO count here was left by a crashed op in this same process (or a
# crash-injection test) and is broken immediately instead of waiting
# out the stale window.  A counter (not a set): the registration is
# taken BEFORE the O_CREAT|O_EXCL attempt — if it were added after,
# a sibling thread peeking between file creation and registration
# would misread the live lock as abandoned and break it — and
# concurrent failed attempts by other threads must not erase the
# actual holder's registration.
import threading as _threading

_HELD: dict = {}
_HELD_LOCK = _threading.Lock()


def _held_inc(path: str) -> None:
    with _HELD_LOCK:
        _HELD[path] = _HELD.get(path, 0) + 1


def _held_dec(path: str) -> None:
    with _HELD_LOCK:
        n = _HELD.get(path, 0) - 1
        if n <= 0:
            _HELD.pop(path, None)
        else:
            _HELD[path] = n


def _acquire_file(path: str) -> bool:
    """One O_CREAT|O_EXCL attempt; True on success."""
    _held_inc(path)
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        _held_dec(path)
        return False
    os.write(fd, json.dumps(
        {"pid": os.getpid(), "ts": time.time()}).encode())
    os.close(fd)
    return True


def _release_file(path: str) -> None:
    _held_dec(path)
    os.remove(path)


def _holder_abandoned(path: str, stale_s: float) -> bool:
    """True when the current holder is provably gone: our own pid with
    no live registration (crashed op in this process), a dead pid, or
    an age beyond the stale window."""
    try:
        st = os.stat(path)
        with open(path) as fh:
            info = json.load(fh)
        pid = int(info.get("pid", -1))
    except (FileNotFoundError, ValueError, json.JSONDecodeError):
        return False  # gone or torn mid-write; let the caller retry
    if pid == os.getpid():
        with _HELD_LOCK:
            return _HELD.get(path, 0) == 0
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return True
    except PermissionError:
        pass  # alive, not ours to signal
    return (time.time() - st.st_mtime) > stale_s


def _meta(out_dir: str) -> str:
    d = os.path.join(out_dir, "_meta")
    os.makedirs(d, exist_ok=True)
    return d


def corpus_generation(out_dir: str) -> str:
    """Version hash of the corpus's committed set: the active lineage
    markers and the committed delete sidecars (file name + mtime_ns +
    size, so a marker REWRITTEN in place also bumps the generation).
    Cheap — two directory listings, no file contents."""
    h = hashlib.blake2b(digest_size=12)
    for sub, suffix in (("_lineage", ".parquet"), ("_deletes", ".json")):
        root = os.path.join(out_dir, sub)
        if not os.path.isdir(root):
            continue
        for f in sorted(os.listdir(root)):
            if not f.endswith(suffix):
                continue
            try:
                st = os.stat(os.path.join(root, f))
            except FileNotFoundError:
                continue  # concurrent GC mid-listing: fold as absent
            h.update(f"{sub}/{f}:{st.st_mtime_ns}:{st.st_size}".encode())
            h.update(b"\x00")
    return h.hexdigest()


@contextmanager
def commit_lock(out_dir: str, name: str = "commit",
                timeout_s: float = 30.0, stale_s: float = 120.0):
    """Inter-process mutex via atomic ``O_CREAT|O_EXCL`` lock-file
    creation under ``_meta/``.  Spin-waits (50 ms) up to ``timeout_s``
    for a holder to release; a lock older than ``stale_s`` is treated
    as left by a crashed writer and broken (commit critical sections
    are stat+rename, never seconds long — anything holding one for
    minutes is gone).  Raises ``ConcurrentWriteError`` on timeout."""
    path = os.path.join(_meta(out_dir), f"{name}.lock")
    deadline = time.monotonic() + timeout_s
    while not _acquire_file(path):
        if _holder_abandoned(path, stale_s):
            # crashed holder: break the lock (racing breakers both
            # fall through to the O_EXCL create; one wins)
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
            continue
        if time.monotonic() > deadline:
            raise ConcurrentWriteError(
                f"timed out after {timeout_s}s waiting for "
                f"{name}.lock on {out_dir}")
        time.sleep(0.05)
    try:
        yield
    finally:
        try:
            _release_file(path)
        except FileNotFoundError:
            pass


def claim(path: str, what: str = "resource",
          stale_s: float = 3600.0) -> None:
    """Non-blocking exclusive claim (``O_CREAT|O_EXCL``): raises
    ``ConcurrentWriteError`` immediately when a LIVE claim exists
    (age <= ``stale_s``); a stale claim (crashed claimant) is broken.
    Pair with ``release``."""
    while not _acquire_file(path):
        if _holder_abandoned(path, stale_s):
            try:
                os.remove(path)
            except FileNotFoundError:
                pass
            continue
        raise ConcurrentWriteError(
            f"{what} is being written by another writer "
            f"(claim {os.path.basename(path)})")


def release(path: str) -> None:
    try:
        _release_file(path)
    except FileNotFoundError:
        pass


class WriterSession:
    """Optimistic-concurrency scope for one lifecycle operation.

    Capture at op start (BEFORE reading any corpus state the op's
    outputs depend on); run every marker publication through
    ``commit(apply_fn)``.  The apply function executes inside the
    commit lock only after the corpus generation is verified unchanged
    since capture (or since this session's own last commit), so a
    concurrent writer's committed change can never be silently
    overwritten or half-honored — the loser gets a clean
    ``ConcurrentWriteError`` instead."""

    def __init__(self, out_dir: str):
        import threading

        self.out_dir = out_dir
        self.expected = corpus_generation(out_dir)
        # ops that commit group-by-group from driver threads
        # (vacuum / update rewrites) share one session: serialize own
        # commits so a sibling thread's advance isn't read as conflict
        self._tlock = threading.Lock()

    def commit(self, apply_fn, what: str = "commit") -> None:
        with self._tlock, commit_lock(self.out_dir):
            cur = corpus_generation(self.out_dir)
            if cur != self.expected:
                raise ConcurrentWriteError(
                    f"{what} on {self.out_dir}: corpus generation "
                    f"changed ({self.expected} -> {cur}) — another "
                    "writer committed; re-run to converge")
            apply_fn()
            self.expected = corpus_generation(self.out_dir)
