"""Merge-on-read row deletion for encoded corpora (deletion vectors).

``delete_where(out_dir, predicate)`` marks matching rows deleted
WITHOUT rewriting a single payload byte: per-chunk packed bitmasks
land as content-addressed sidecar directories under ``_deletes/``,
committed by a JSON marker written last (the same marker-is-the-
commit-point discipline as encode groups).  Every read path —
``decode_corpus``, ``decode_digest_corpus``, ``count_where``,
``aggregate_where``, ``group_counts`` — masks deleted rows out;
``vacuum_deletes`` re-encodes ONLY the groups that carry deletions
and retires the sidecars.

Reference parity: the reference's closest analog is predicate-driven
row rewriting (``modifyWhen``/``replaceWhen``,
colonnade/src/Colonnade.hs:217-248) — this module is that combinator
lifted to corpus lifecycle: the "rewrite" is a logical drop recorded
beside immutable data.

Scale notes (100 TB):

- ``delete_where`` is zone-map-pruned like any pushdown: groups and
  chunks whose stats PROVE no row matches are never read, never
  decoded, and cost zero sidecar bytes.  All-match chunks (band inside
  the predicate, proven-zero nulls) store a 0-byte ``all`` marker —
  no decode, no bitmap.  Only boundary chunks decode, and only the
  predicate columns.
- Sidecar volume is proportional to TOUCHED boundary chunks
  (n_rows/8 bytes each), not to corpus size; the common 100-TB delete
  (a contaminated source / date band on a clustered layout) touches a
  vanishing fraction of chunks and resolves mostly to ``all`` markers.
- Readers load masks once per WORKER PROCESS through a content-keyed
  cache (the driver ships only the corpus path); a mask set too large
  for one process heap means the predicate deleted scattered rows
  across most of a 100-TB corpus — at that point ``vacuum_deletes``
  (a group-parallel re-encode) is the right tool, and the docstring
  contract is that masks are a BRIDGE to the next vacuum, not a
  permanent 1:1 shadow of the corpus.
- Deletes compose with ``compact_corpus``: compaction moves chunk rows
  verbatim (chunk_id is content-derived and travels with the row), so
  masks keyed by (fragment, chunk_id) stay valid across it.
- ``vacuum_deletes`` rewrites per chunk INSIDE one task (decode ->
  filter -> re-encode, fused, no exchange), reuses the corpus's pinned
  shared dictionaries so rewritten chunks stay byte-compatible with
  untouched groups, and commits group-by-group with supersedes
  markers — a crash mid-vacuum leaves every group readable (old or
  new, never both) and a re-run converges.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DELETES_DIR = "_deletes"

# (realpath(out_dir), tuple(committed ids)) -> {(fragment, chunk_id):
#  np.bool_ deleted-mask | "all"} — per-process, content-keyed: a new
# committed delete changes the key, so stale entries are never served.
_MASK_CACHE: dict = {}


def _deletes_root(out_dir: str) -> str:
    return os.path.join(out_dir, DELETES_DIR)


def committed_deletes(out_dir: str) -> list:
    """Delete-operation ids whose data dir AND commit marker exist."""
    root = _deletes_root(out_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for f in sorted(os.listdir(root)):
        if f.startswith("del-") and f.endswith(".json"):
            did = f[len("del-"):-len(".json")]
            if os.path.isdir(os.path.join(root, f"del-{did}")):
                out.append(did)
    return out


def load_delete_masks(out_dir: str) -> dict:
    """(fragment, chunk_id) -> boolean np array (True = deleted) or
    the string ``"all"``.  Stacked delete operations OR together.
    Process-cached by the committed-id set."""
    ids = committed_deletes(out_dir)
    if not ids:
        return {}
    key = (os.path.realpath(out_dir), tuple(ids))
    hit = _MASK_CACHE.get(key)
    if hit is not None:
        return hit
    masks: dict = {}
    root = _deletes_root(out_dir)
    for did in ids:
        t = pq.read_table(os.path.join(root, f"del-{did}"))
        for frag, cid, n_rows, kind, bm in zip(
            t["fragment"].to_pylist(), t["chunk_id"].to_pylist(),
            t["n_rows"].to_pylist(), t["kind"].to_pylist(),
            t["bitmap"].to_pylist(),
        ):
            k = (frag, cid)
            prev = masks.get(k)
            if kind == "all" or isinstance(prev, str):
                masks[k] = "all"
                continue
            new = np.unpackbits(
                np.frombuffer(bm, dtype=np.uint8), count=n_rows
            ).astype(bool)
            masks[k] = new if prev is None else (prev | new)
    for k, v in masks.items():
        if not isinstance(v, str) and v.all():
            masks[k] = "all"
    # one live entry per corpus: stale commit-set generations (prior
    # delete/vacuum states) would otherwise accumulate for the life of
    # a long-running worker process
    for old in [k for k in _MASK_CACHE if k[0] == key[0]]:
        del _MASK_CACHE[old]
    _MASK_CACHE[key] = masks
    return masks


def deleted_row_count(out_dir: str) -> int:
    masks = load_delete_masks(out_dir)
    if not masks:
        return 0
    # "all" entries need the chunk's n_rows — a manifest-sized scan
    need_all = {k for k, v in masks.items() if isinstance(v, str)}
    total = sum(int(v.sum()) for v in masks.values()
                if not isinstance(v, str))
    if need_all:
        from ..state.lineage import load_lineage

        lin = load_lineage(out_dir)
        for frag, cid, n in zip(lin["fragment"].to_pylist(),
                                lin["chunk_id"].to_pylist(),
                                lin["n_rows"].to_pylist()):
            if (frag, cid) in need_all:
                total += int(n)
    return total


def delete_where(out_dir: str, predicate, concurrency=None,
                 exclude_covering: Optional[set] = None,
                 max_retries: int = 2) -> dict:
    """Mark every row matching ``predicate`` (TRUE rows only — SQL
    DELETE three-valued semantics, nulls survive) as deleted.

    Concurrent-writer safe: the sidecar id and mask base derive from
    the committed set observed at START, and the marker commit is a
    generation-checked CAS (``pipelines/concurrency.py``) — if another
    writer (delete / vacuum / merge) commits in between, this op
    RETRIES from scratch against the new state (masks OR together, so
    the recomputation converges) up to ``max_retries`` times before
    surfacing ``ConcurrentWriteError``.

    Distributed: one zone-pruned pass over the encoded chunks; only
    boundary chunks decode their predicate columns.  The sidecar is
    committed atomically (data dir, then marker).

    ``exclude_covering``: a set of input-file paths — active groups
    whose coverage sidecar intersects it are left untouched.  This is
    ``merge_rows``'s scoping hook: the upsert's key-delete must never
    mask the rows it just appended, and the exclusion is derived from
    the merge batch's input files (stable across crash-retries and
    vacuum rewrites, which carry files.json forward) rather than from
    a group id captured in driver memory."""
    from .concurrency import ConcurrentWriteError

    last: Exception | None = None
    for _ in range(max_retries + 1):
        try:
            return _delete_where_once(out_dir, predicate, concurrency,
                                      exclude_covering)
        except ConcurrentWriteError as e:
            last = e
    raise last


def _delete_where_once(out_dir: str, predicate, concurrency=None,
                       exclude_covering: Optional[set] = None) -> dict:
    from ..stages.decode import (
        chunk_all_match,
        chunk_may_match,
        decode_chunk_row,
        normalize_predicates,
        predicate_columns,
        predicate_json,
        predicate_mask,
    )
    from ..util import default_concurrency
    from .encode_pipeline import (
        _meta_root,
        _read_encoded,
        _register_dict_dir,
        active_groups,
    )

    from .concurrency import WriterSession

    # capture the committed-set generation BEFORE reading any state
    # the sidecar derives from (committed_deletes, active groups)
    session = WriterSession(out_dir)
    preds = normalize_predicates(predicate)
    if not preds:
        raise ValueError("delete_where needs at least one predicate")
    cols = sorted(predicate_columns(preds))
    groups = None
    if exclude_covering:
        excl = {os.path.realpath(p) for p in exclude_covering}
        groups = []
        for gid in active_groups(out_dir):
            sc = os.path.join(_meta_root(out_dir), f"group-{gid}.files.json")
            covered: set = set()
            if os.path.exists(sc):
                with open(sc) as fh:
                    covered = {os.path.realpath(p) for p in json.load(fh)}
            if not (covered & excl):
                groups.append(gid)
    did = hashlib.blake2b(
        (json.dumps(predicate_json(preds), sort_keys=True, default=str)
         + "|" + ",".join(committed_deletes(out_dir))
         + ("|scope:" + ",".join(groups) if groups is not None else "")
         ).encode(),
        digest_size=10,
    ).hexdigest()
    root = _deletes_root(out_dir)
    ddir = os.path.join(root, f"del-{did}")
    marker = os.path.join(root, f"del-{did}.json")
    if os.path.exists(ddir):
        shutil.rmtree(ddir)  # torn write from a previous run
    if os.path.exists(marker):
        os.remove(marker)

    enc, cpt = _read_encoded(out_dir, cols, concurrency, predicate=predicate,
                             groups=groups)

    def part(batch: pa.Table) -> pa.Table:
        _register_dict_dir(out_dir)
        frags, cids, nrows, kinds, ndel, bitmaps = [], [], [], [], [], []
        names = batch.column_names
        for r in range(len(batch)):
            sj = batch["stats_json"][r].as_py()
            if not all(chunk_may_match(sj, p) for p in preds):
                continue
            n = int(batch["n_rows"][r].as_py())
            if all(chunk_all_match(sj, p) for p in preds):
                kind, nd, bm = "all", n, b""
            else:
                row = {c: batch[c][r].as_py() for c in names}
                t = decode_chunk_row(row, verify_checksum=False,
                                     columns=cols)
                m = np.ones(t.num_rows, dtype=bool)
                for p in preds:
                    pm = predicate_mask(t, p)
                    if pm is None:
                        m &= np.zeros(t.num_rows, dtype=bool)
                    else:
                        if isinstance(pm, pa.ChunkedArray):
                            pm = pm.combine_chunks()
                        m &= pm.to_numpy(zero_copy_only=False).astype(bool)
                nd = int(m.sum())
                if nd == 0:
                    continue
                if nd == t.num_rows:
                    kind, bm = "all", b""
                else:
                    kind, bm = "bitmap", np.packbits(m).tobytes()
            frags.append(batch["fragment"][r].as_py())
            cids.append(batch["chunk_id"][r].as_py())
            nrows.append(n)
            kinds.append(kind)
            ndel.append(nd)
            bitmaps.append(bm)
        return pa.table({
            "fragment": pa.array(frags, pa.string()),
            "chunk_id": pa.array(cids, pa.string()),
            "n_rows": pa.array(nrows, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "n_deleted": pa.array(ndel, pa.int64()),
            "bitmap": pa.array(bitmaps, pa.binary()),
        })

    if enc.count() == 0:
        rows = pa.table({
            "fragment": pa.array([], pa.string()),
            "chunk_id": pa.array([], pa.string()),
            "n_rows": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "n_deleted": pa.array([], pa.int64()),
            "bitmap": pa.array([], pa.binary()),
        })
        chunks, rows_deleted = 0, 0
        os.makedirs(ddir, exist_ok=True)
        pq.write_table(rows, os.path.join(ddir, "part-0.parquet"),
                       compression="zstd")
    else:
        dels = enc.map_batches(
            part, batch_format="pyarrow", batch_size=max(1, cpt),
            zero_copy_batch=True,
            concurrency=concurrency or default_concurrency(),
        )
        os.makedirs(root, exist_ok=True)
        dels.write_parquet(ddir, compression="zstd")
        t = pq.read_table(ddir, columns=["n_deleted"])
        chunks = t.num_rows
        rows_deleted = int(
            sum(t["n_deleted"].to_pylist())) if chunks else 0
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({
            "predicate": predicate_json(preds),
            "chunks_touched": chunks,
            "rows_deleted": rows_deleted,
        }, f, indent=1, default=str)
    # the commit point: generation-checked CAS — a writer that
    # committed since our capture fails here (cleanly, marker never
    # lands) and the caller retries against the new state
    session.commit(lambda: os.replace(tmp, marker), what="delete_where")
    return {"delete_id": did, "chunks_touched": chunks,
            "rows_deleted": rows_deleted}


class _RewriteChunks:
    """Vacuum worker: encoded chunk rows -> re-encoded chunk rows with
    deleted rows dropped.  Chunks with no mask move VERBATIM (no
    decode, no re-encode — only the masked chunks of an affected
    group pay); whole-chunk masks drop the row outright.

    ``masks_dir`` overrides where the masks load from (default: the
    corpus's live ``_deletes``): ``restore_snapshot`` rewrites pinned
    chunks under the SNAPSHOT's mask copy."""

    def __init__(self, out_dir: str, plan_names=None,
                 masks_dir: Optional[str] = None):
        self.out_dir = out_dir
        self.plan_names = plan_names
        self.masks_dir = masks_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.shared_dict import register_dir
        from ..plan import CodecPlan, bind_plan
        from ..stages.decode import decode_chunk_row
        from ..stages.encode import encode_chunk
        from .encode_pipeline import load_pinned_dicts

        register_dir(self.out_dir)
        shared = load_pinned_dicts(self.out_dir)
        from .encode_pipeline import sketch_cols

        sk = sketch_cols(self.out_dir)
        masks = load_delete_masks(self.masks_dir or self.out_dir)
        names = batch.column_names
        out_tables = []
        for r in range(len(batch)):
            frag = batch["fragment"][r].as_py()
            cid = batch["chunk_id"][r].as_py()
            dmask = masks.get((frag, cid))
            if isinstance(dmask, str):
                continue  # whole chunk deleted
            if dmask is None:
                out_tables.append(batch.slice(r, 1))  # untouched chunk
                continue
            row = {c: batch[c][r].as_py() for c in names}
            t = decode_chunk_row(row, verify_checksum=True)
            t = t.filter(pa.array(~dmask))
            if t.num_rows == 0:
                continue
            plan_names = json.loads(row["plan_json"])
            plan = CodecPlan.by_name(*plan_names)
            bound = bind_plan(plan, t.schema)
            # re-derive sketches for the surviving rows (the corpus's
            # recorded sketch config) so pruning survives the vacuum
            enc = encode_chunk(t, bound, None, frag, shared_dicts=shared,
                               bloom_cols=sk.get("bloom_cols"),
                               hll_cols=sk.get("hll_cols"),
                               quantile_cols=sk.get("quantile_cols"),
                               quantile_k=int(sk.get("quantile_k", 256)))
            # force the INPUT's column order so blocks concat cleanly
            out_tables.append(pa.table(enc).select(names))
        if not out_tables:
            return batch.slice(0, 0)
        return pa.concat_tables(out_tables)


def vacuum_deletes(out_dir: str, gc: bool = True,
                   concurrency=None,
                   max_concurrent_groups: int = 4) -> dict:
    """Materialize pending deletions: re-encode ONLY the groups whose
    chunks carry masks (group-parallel, decode->filter->re-encode
    fused per task, zero exchange), commit each replacement with a
    supersedes marker, then retire every consumed sidecar.

    Crash-safe: per group, data dir -> files.json -> supersedes.json
    -> lineage marker (the commit point); sidecars are removed only
    after every affected group committed.  Orphaned masks (a crash
    between a group commit and sidecar removal) reference chunk_ids
    that no longer exist in any active group — harmless, and the next
    vacuum call sweeps them."""
    import ray.data as rd

    from .encode_pipeline import (
        LINEAGE_COLS,
        _commit_lineage,
        _gc_group,
        _meta_root,
        _run_groups,
        _transitive_supersedes,
        active_groups,
    )

    from .concurrency import WriterSession

    # generation captured BEFORE loading the masks this rewrite bakes
    # in: a delete committing mid-vacuum fails our next group commit
    # (clean abort; committed groups + surviving sidecars stay a
    # consistent merge-on-read state, and a re-run converges)
    session = WriterSession(out_dir)
    ids = committed_deletes(out_dir)
    if not ids:
        return {"vacuumed_groups": 0, "rows_dropped": 0,
                "retired_deletes": 0}
    masks = load_delete_masks(out_dir)
    rows_dropped = deleted_row_count(out_dir)
    data_root = os.path.join(out_dir, "data")
    lin_root = os.path.join(out_dir, "_lineage")
    affected: dict = {}
    for gid in active_groups(out_dir):
        lin = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                            columns=["fragment", "chunk_id"])
        keys = set(zip(lin["fragment"].to_pylist(),
                       lin["chunk_id"].to_pylist()))
        if keys & masks.keys():
            affected[gid] = sorted(
                os.path.join(data_root, f"group-{gid}", f)
                for f in os.listdir(os.path.join(data_root, f"group-{gid}"))
                if f.endswith(".parquet")
            )
    def _one(item) -> None:
        gid, files = item
        h = hashlib.blake2b(digest_size=8)
        h.update(gid.encode())
        for did in ids:
            h.update(b"\x00" + did.encode())
        ngid = "v" + h.hexdigest()[:15]
        gdir = os.path.join(data_root, f"group-{ngid}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)  # torn vacuum from a previous run
        os.makedirs(gdir, exist_ok=True)
        enc = rd.read_parquet(files,
                              override_num_blocks=max(1, len(files)))
        out = enc.map_batches(
            _RewriteChunks(out_dir), batch_format="pyarrow",
            batch_size=4, zero_copy_batch=True,
            concurrency=concurrency,
        )
        if out.count() > 0:
            out.write_parquet(gdir, compression="none", row_group_size=1)
            lineage = pq.read_table(gdir, columns=LINEAGE_COLS)
        else:
            # every chunk in the group was fully deleted: commit an
            # empty replacement so the shadow still lands
            src_schema = pq.read_schema(files[0])
            lineage = pa.table(
                {c: pa.array([], src_schema.field(c).type)
                 for c in LINEAGE_COLS})
        old_sc = os.path.join(_meta_root(out_dir), f"group-{gid}.files.json")
        covered = []
        if os.path.exists(old_sc):
            with open(old_sc) as fh:
                covered = json.load(fh)
        with open(os.path.join(_meta_root(out_dir),
                               f"group-{ngid}.files.json"), "w") as fh:
            json.dump(sorted(covered), fh)
        shadow = _transitive_supersedes(out_dir, [gid])
        with open(os.path.join(_meta_root(out_dir),
                               f"group-{ngid}.supersedes.json"), "w") as fh:
            json.dump(shadow, fh)
        def _publish():
            _commit_lineage(lineage,
                            os.path.join(lin_root, f"group-{ngid}.parquet"))
            if gc:
                for g in shadow:
                    _gc_group(out_dir, g)

        # generation-checked: the marker + gc land atomically w.r.t.
        # other writers' commits (gc removals change the generation,
        # so they ride the same critical section)
        session.commit(_publish, what=f"vacuum group {gid}")

    _run_groups(_one, affected.items(), max_concurrent_groups)

    # every affected active group is committed -> retire the sidecars
    def _retire():
        root = _deletes_root(out_dir)
        for did in ids:
            mp = os.path.join(root, f"del-{did}.json")
            if os.path.exists(mp):
                os.remove(mp)
            shutil.rmtree(os.path.join(root, f"del-{did}"),
                          ignore_errors=True)

    session.commit(_retire, what="vacuum retire sidecars")
    return {"vacuumed_groups": len(affected), "rows_dropped": rows_dropped,
            "retired_deletes": len(ids)}
