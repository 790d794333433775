"""Named snapshots: time-travel reads over encoded corpora.

``create_snapshot(out_dir, tag)`` pins the corpus's CURRENT visible
state — the active group set plus the committed deletion masks — so
that ``decode_snapshot(out_dir, tag)`` reproduces today's answers
after any amount of later lifecycle (deletes, vacuum, updates,
schema evolution, compaction, merges).  The design reuses the two
facts that make the lifecycle crash-safe in the first place:

- group DATA is immutable — a rewrite supersedes a group, it never
  edits it — so pinning a group costs zero bytes: the snapshot just
  stops GC from reclaiming it (``_gc_group`` skips pinned gids; the
  group stays on disk, shadowed, invisible to live readers),
- deletion masks are small (bitmap bytes over touched chunks), so the
  snapshot COPIES them into its own directory at create time and the
  live sidecars stay free to be retired by the next vacuum.

On-disk layout: ``_snapshots/snap-<tag>/manifest.json`` (the commit
point — the whole directory is staged as ``.tmp`` and renamed) plus a
``_deletes/`` mirror of the then-committed sidecars, in the exact
live layout so ``load_delete_masks`` reads it unchanged.

Reference parity: the reference's encoders are immutable values a
caller can hold and replay at any time (colonnade/src/Colonnade.hs:
189-215 — build once, fold many); a snapshot is that property lifted
to corpus state under mutation.

Scale notes (100 TB): a snapshot is O(manifest) — one JSON of group
ids plus mask bytes proportional to then-pending deletes; no data
copies, no read amplification on live paths (the pin check is a
driver-side set lookup at GC time only).  Storage cost is deferred
GC: superseded groups a snapshot references stay on disk until
``drop_snapshot`` + ``sweep_orphans``, the same retention trade
every lakehouse time-travel makes.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Optional, Sequence

SNAP_DIR = "_snapshots"
_TAG_RE = re.compile(r"^[A-Za-z0-9._-]{1,64}$")


def _snap_root(out_dir: str) -> str:
    return os.path.join(out_dir, SNAP_DIR)


def _snap_dir(out_dir: str, tag: str) -> str:
    return os.path.join(_snap_root(out_dir), f"snap-{tag}")


def create_snapshot(out_dir: str, tag: str) -> dict:
    """Pin the current visible corpus state under ``tag``.  Atomic:
    the snapshot directory is staged as ``.tmp`` and renamed; a crash
    mid-create leaves only an ignorable temp dir (re-run converges).
    Raises if ``tag`` already exists (snapshots are immutable —
    drop and re-create to retag)."""
    from .deletes import DELETES_DIR, committed_deletes
    from .encode_pipeline import active_groups

    if not _TAG_RE.match(tag or ""):
        raise ValueError(f"snapshot tag must match {_TAG_RE.pattern}: {tag!r}")
    final = _snap_dir(out_dir, tag)
    if os.path.isdir(final):
        raise ValueError(f"snapshot {tag!r} already exists")
    groups = active_groups(out_dir)
    if not groups:
        raise FileNotFoundError(f"no committed encode groups under {out_dir}")
    dels = committed_deletes(out_dir)
    tmp = final + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)  # torn create from a previous run
    os.makedirs(tmp)
    if dels:
        droot_src = os.path.join(out_dir, DELETES_DIR)
        droot_dst = os.path.join(tmp, DELETES_DIR)
        os.makedirs(droot_dst)
        for did in dels:
            shutil.copytree(os.path.join(droot_src, f"del-{did}"),
                            os.path.join(droot_dst, f"del-{did}"))
            shutil.copy2(os.path.join(droot_src, f"del-{did}.json"),
                         os.path.join(droot_dst, f"del-{did}.json"))
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump({"tag": tag, "groups": sorted(groups),
                   "deletes": sorted(dels)}, fh, indent=1)
    os.rename(tmp, final)  # the commit point
    return {"tag": tag, "groups": len(groups), "deletes": len(dels)}


def _manifest(out_dir: str, tag: str) -> dict:
    p = os.path.join(_snap_dir(out_dir, tag), "manifest.json")
    if not os.path.exists(p):
        raise FileNotFoundError(f"no snapshot {tag!r} under {out_dir}")
    with open(p) as fh:
        return json.load(fh)


def list_snapshots(out_dir: str) -> list:
    """Committed snapshot manifests, sorted by tag."""
    root = _snap_root(out_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        if d.startswith("snap-") and not d.endswith(".tmp"):
            p = os.path.join(root, d, "manifest.json")
            if os.path.exists(p):
                with open(p) as fh:
                    out.append(json.load(fh))
    return out


def drop_snapshot(out_dir: str, tag: str) -> None:
    """Unpin ``tag``.  Groups only it referenced become reclaimable
    by the next ``sweep_orphans`` (they stay on disk, shadowed, until
    then — dropping a snapshot never touches live state)."""
    d = _snap_dir(out_dir, tag)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"no snapshot {tag!r} under {out_dir}")
    shutil.rmtree(d)


def pinned_groups(out_dir: str) -> set:
    """Group ids any committed snapshot references — the set GC must
    never reclaim.  Driver-side, manifest-sized."""
    return {g for m in list_snapshots(out_dir) for g in m["groups"]}


def decode_snapshot(out_dir: str, tag: str, verify_checksum: bool = True,
                    concurrency=None,
                    columns: Optional[Sequence[str]] = None,
                    predicate: Optional[tuple] = None):
    """``decode_corpus`` as of snapshot ``tag``: reads exactly the
    pinned groups and applies exactly the masks committed at create
    time (later deletes are invisible; masks retired by a later
    vacuum still apply from the snapshot's copy)."""
    from .encode_pipeline import _read_encoded, decode_dataset

    m = _manifest(out_dir, tag)
    enc, cpt = _read_encoded(out_dir, columns, concurrency,
                             predicate=predicate, groups=m["groups"])
    sdir = _snap_dir(out_dir, tag) if m["deletes"] else None
    return decode_dataset(enc, verify_checksum=verify_checksum,
                          concurrency=concurrency, columns=columns,
                          predicate=predicate, chunks_per_task=cpt,
                          dict_dirs=[out_dir], deletes_dir=sdir)
