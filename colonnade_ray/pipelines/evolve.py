"""Schema evolution for encoded corpora: attach derived columns
without re-encoding a single existing payload byte.

``add_columns(out_dir, fn, input_columns)`` runs one group-parallel
pass: per chunk, the INPUT columns decode (projected, per-column
checksum verified), ``fn`` computes the new arrays, and only those
arrays pass through the codec cascade — every existing column's
payload is copied VERBATIM from the old chunk row into the new one.
The rewritten groups commit under the same supersedes-shadowing
protocol as compaction/vacuum, so a crash mid-run leaves every group
readable and a re-run converges.

The canonical 100-TB use: score an already-encoded training corpus
(quality, language id, token bucket) and attach the score so later
reads can PRUNE on it — new columns get their own zone maps and
``__nulls__``/``__sums__`` entries, so ``count_where`` /
``aggregate_where`` / ``decode_corpus(predicate=...)`` push down on
them exactly like first-class columns (they ARE first-class columns
after the pass).

Reference parity: the reference builds sibling columns by composing
encoders against derived accessors (``lmap``/``Semigroup <>``,
colonnade/src/Colonnade.hs:96-160) — this is that composition applied
retroactively to data already at rest.

Scale notes: the pass moves each affected group's bytes once
(read + write, no codec work on old columns — measured 1.0 s vs a
5.9 s warm full re-encode on the sf0.1 flagship corpus, ~6x) and
computes/encodes only the new column; groups
that already carry the requested names are SKIPPED, which makes the
operator idempotent, crash-resumable, and re-runnable after
``append=True`` runs added new groups.  Deterministic ``fn`` keeps
resumed runs byte-compatible (the same contract as the encode path).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
from typing import Callable, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _normalize_new(name: str, arr, n_rows: int) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not isinstance(arr, pa.Array):
        arr = pa.array(np.asarray(arr)) if isinstance(arr, np.ndarray) \
            else pa.array(arr)
    if len(arr) != n_rows:
        raise ValueError(
            f"add_columns fn returned {len(arr)} rows for column "
            f"{name!r}, chunk has {n_rows}")
    return arr


class _AugmentChunks:
    """Encoded chunk rows -> the same rows with new columns appended:
    old payloads copied verbatim, new arrays encoded, plan/stats/
    checksum/chunk_id extended (chunk_id stays content-derived)."""

    def __init__(self, out_dir: str, fn: Callable, input_columns,
                 new_names):
        self.out_dir = out_dir
        self.fn = fn
        self.input_columns = list(input_columns)
        self.new_names = list(new_names)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.columns import encode_column
        from ..codecs.shared_dict import register_dir
        from ..stages.decode import decode_chunk_row
        from ..stages.encode import _checksum, _codec_of, _zone_stat

        register_dir(self.out_dir)
        import pyarrow.compute as pc

        names_in = batch.column_names
        out_rows = []
        for r in range(len(batch)):
            row = {c: batch[c][r].as_py() for c in names_in}
            plan = json.loads(row["plan_json"])
            if all(n in plan for n in self.new_names):
                out_rows.append(row)  # already augmented (resume)
                continue
            t = decode_chunk_row(row, verify_checksum=True,
                                 columns=self.input_columns)
            new = self.fn(t)
            if sorted(new) != sorted(self.new_names):
                raise ValueError(
                    f"fn returned columns {sorted(new)}, probe saw "
                    f"{sorted(self.new_names)} — fn must be "
                    "schema-deterministic")
            stats = json.loads(row["stats_json"]) if row.get("stats_json") \
                else {"__nulls__": {}, "__sums__": {}}
            stats.setdefault("__nulls__", {})
            stats.setdefault("__sums__", {})
            codecs = json.loads(row["codecs_json"])
            k = len(plan)
            new_bytes = 0
            for name in self.new_names:
                arr = _normalize_new(name, new[name], t.num_rows)
                payload, meta = encode_column(arr)
                meta["name"] = name
                meta["ck"] = hashlib.blake2b(
                    payload, digest_size=8).hexdigest()
                zs = _zone_stat(arr)
                if zs is not None:
                    stats[name] = zs
                    if arr.null_count:
                        stats["__nulls__"][name] = int(arr.null_count)
                    if pa.types.is_integer(arr.type):
                        stats["__sums__"][name] = int(
                            pc.sum(arr).as_py() or 0)
                mjson = json.dumps(meta, separators=(",", ":"))
                row[f"col{k}_payload"] = payload
                row[f"col{k}_meta"] = mjson
                plan.append(name)
                codecs.append(_codec_of(meta))
                new_bytes += len(payload) + len(mjson)
                k += 1
            payloads = [row[f"col{i}_payload"] for i in range(k)]
            checksum = _checksum(payloads)
            row["plan_json"] = json.dumps(plan)
            row["codecs_json"] = json.dumps(codecs)
            row["stats_json"] = json.dumps(stats, separators=(",", ":"),
                                           default=str)
            row["bytes_out"] = int(row["bytes_out"]) + new_bytes
            row["checksum"] = checksum
            # same meta-inclusive identity as stages/encode.py: two
            # chunks differing only in a constant-encoded value (whose
            # payload is empty) must not share a chunk_id
            idh = hashlib.blake2b(digest_size=8)
            idh.update(checksum.encode())
            for i in range(k):
                idh.update(row[f"col{i}_meta"].encode())
                idh.update(b"\x00")
            row["chunk_id"] = idh.hexdigest()
            out_rows.append(row)
        cols = list(names_in)
        # column order: original order, then the appended colN pairs
        extra = [c for c in out_rows[0] if c not in names_in] \
            if out_rows else []
        cols += sorted(extra)
        data = {c: [row.get(c) for row in out_rows] for c in cols}
        return pa.table(data)


def add_columns(out_dir: str, fn: Callable, input_columns: Sequence[str],
                names: Optional[Sequence[str]] = None,
                gc: bool = True, concurrency=None,
                max_concurrent_groups: int = 4) -> dict:
    """Attach ``fn``-derived columns to every chunk of the corpus.

    ``fn``: pa.Table (the chunk projected to ``input_columns``) ->
    dict of {new_name: array-like of chunk length}.  Must be pure and
    deterministic (resume contract).  ``names``: the new column names;
    omitted, they're discovered by probing ``fn`` on a small decoded
    slice.  Groups already carrying all ``names`` are skipped, so the
    call is idempotent and re-runnable after appends.

    Refuses while deletion masks are pending (masks key on chunk_id,
    which this pass changes) — run ``vacuum_deletes`` first."""
    import ray.data as rd

    from .deletes import committed_deletes
    from .encode_pipeline import (
        LINEAGE_COLS,
        _commit_lineage,
        _gc_group,
        _meta_root,
        _register_dict_dir,
        _run_groups,
        _transitive_supersedes,
        active_groups,
    )

    if committed_deletes(out_dir):
        raise ValueError(
            "add_columns with pending deletion masks would orphan them "
            "(masks key on chunk ids, which augmenting changes): run "
            "vacuum_deletes(out_dir) first")
    data_root = os.path.join(out_dir, "data")
    lin_root = os.path.join(out_dir, "_lineage")
    groups = active_groups(out_dir)
    if not groups:
        raise FileNotFoundError(f"no committed encode groups under {out_dir}")

    if names is None:
        # probe one chunk for the output schema — from the first group
        # that HAS chunks (a group vacuumed to zero rows keeps only an
        # empty lineage marker for its supersedes shadow)
        from ..stages.decode import decode_chunk_row

        _register_dict_dir(out_dir)
        probe_gid = next(
            (g for g in groups
             if os.path.isdir(os.path.join(data_root, f"group-{g}"))
             and any(f.endswith(".parquet") for f in os.listdir(
                 os.path.join(data_root, f"group-{g}")))),
            None)
        if probe_gid is None:
            raise FileNotFoundError(
                f"no group with data under {out_dir} to probe names from")
        gdir = os.path.join(data_root, f"group-{probe_gid}")
        f0 = sorted(f for f in os.listdir(gdir) if f.endswith(".parquet"))[0]
        t0 = pq.read_table(os.path.join(gdir, f0)).slice(0, 1)
        row0 = {c: t0[c][0].as_py() for c in t0.column_names}
        probe = decode_chunk_row(row0, verify_checksum=False,
                                 columns=list(input_columns))
        names = sorted(fn(probe.slice(0, min(64, probe.num_rows))))
    names = list(names)
    # provenance: only names THIS operator added may be skipped-if-
    # present; a clash with an original column is always an error
    rec_path = os.path.join(_meta_root(out_dir), "augmented_columns.json")
    aug_record: set = set()
    if os.path.exists(rec_path):
        with open(rec_path) as fh:
            aug_record = set(json.load(fh))
    todo = []
    for gid in groups:
        lt = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                           columns=["plan_json"])
        if not lt.num_rows:
            continue  # vacuumed-to-zero group: no chunks to augment
        plan = json.loads(lt["plan_json"][0].as_py())
        present = set(names) & set(plan)
        foreign = present - aug_record
        if foreign:
            raise ValueError(f"new columns {sorted(foreign)} already exist "
                             f"in group {gid}")
        if set(names) <= set(plan):
            continue  # this group was augmented by a prior (re-)run
        if present:
            raise ValueError(
                f"group {gid} carries only part of {sorted(names)} "
                f"({sorted(present)}) — re-run with the original name set")
        todo.append(gid)
    def _one(gid: str) -> None:
        gdir_old = os.path.join(data_root, f"group-{gid}")
        files = sorted(
            os.path.join(gdir_old, f) for f in os.listdir(gdir_old)
            if f.endswith(".parquet")
        )
        h = hashlib.blake2b(digest_size=8)
        h.update(gid.encode())
        for n in names:
            h.update(b"\x00" + n.encode())
        ngid = "a" + h.hexdigest()[:15]
        gdir = os.path.join(data_root, f"group-{ngid}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)  # torn run
        aug = rd.read_parquet(files, override_num_blocks=max(1, len(files))) \
            .map_batches(_AugmentChunks(out_dir, fn, input_columns, names),
                         batch_format="pyarrow", batch_size=4,
                         zero_copy_batch=True, concurrency=concurrency)
        aug.write_parquet(gdir, compression="none", row_group_size=1)
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
        lineage = pq.read_table(gdir, columns=LINEAGE_COLS)
        _commit_lineage(lineage,
                        os.path.join(lin_root, f"group-{ngid}.parquet"))
        if gc:
            for g in shadow:
                _gc_group(out_dir, g)

    # commit the provenance record BEFORE any group rewrite (intent
    # log): a crash after some groups carry the new columns but before
    # the record landed would otherwise make the re-run see its own
    # half-added columns as a foreign clash and refuse to converge
    merged = sorted(aug_record | set(names))
    if merged != sorted(aug_record):
        tmp = rec_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(merged, fh)
        os.replace(tmp, rec_path)
    _run_groups(_one, todo, max_concurrent_groups)
    return {"augmented_groups": len(todo),
            "skipped_groups": len(groups) - len(todo),
            "columns": names}


class _RewriteSchema:
    """Chunk-row rewriter for drop/rename: payloads move verbatim
    (dropped ones simply don't move), column indices renumber, and
    plan/stats/codecs/checksum/chunk_id re-derive."""

    def __init__(self, drop=(), rename: Optional[dict] = None):
        self.drop = set(drop)
        self.rename = dict(rename or {})

    def _fix_ref(self, s: str) -> str:
        if isinstance(s, str) and s.startswith("ref:"):
            tgt = s[4:]
            return "ref:" + self.rename.get(tgt, tgt)
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        names_in = batch.column_names
        out_rows = []
        for r in range(len(batch)):
            row = {c: batch[c][r].as_py() for c in names_in}
            plan = json.loads(row["plan_json"])
            codecs = json.loads(row["codecs_json"])
            stats = json.loads(row["stats_json"]) if row.get("stats_json") \
                else {}
            keep = [i for i, nm in enumerate(plan) if nm not in self.drop]
            if not keep:
                raise ValueError("drop_columns would leave zero columns")
            metas = {i: json.loads(row[f"col{i}_meta"]) for i in keep}
            for i in keep:
                m = metas[i]
                if m.get("kind") == "list":
                    lentry = m["streams"]["lengths"]
                    if lentry.get("codec") == "ref" and \
                            lentry["meta"]["col"] in self.drop:
                        raise ValueError(
                            f"column {lentry['meta']['col']!r} stores the "
                            f"lengths of {m['name']!r} (cross-column "
                            "dedup ref) and cannot be dropped while "
                            f"{m['name']!r} survives")
            new_row = {c: row[c] for c in
                       ("fragment", "n_rows", "n_tokens", "bytes_in")}
            payloads, new_plan, new_codecs = [], [], []
            bytes_out = 0
            for j, i in enumerate(keep):
                m = metas[i]
                old = m["name"]
                new = self.rename.get(old, old)
                m["name"] = new
                if m.get("kind") == "list":
                    lentry = m["streams"]["lengths"]
                    if lentry.get("codec") == "ref":
                        tgt = lentry["meta"]["col"]
                        lentry["meta"]["col"] = self.rename.get(tgt, tgt)
                ce = dict(codecs[i])
                if "lengths" in ce:
                    ce["lengths"] = self._fix_ref(ce["lengths"])
                payload = row[f"col{i}_payload"]
                mjson = json.dumps(m, separators=(",", ":"))
                new_row[f"col{j}_payload"] = payload
                new_row[f"col{j}_meta"] = mjson
                payloads.append(payload)
                new_plan.append(new)
                new_codecs.append(ce)
                bytes_out += len(payload) + len(mjson)
            new_stats = {}
            for k, v in stats.items():
                if k in ("__nulls__", "__sums__"):
                    new_stats[k] = {
                        self.rename.get(c, c): x for c, x in v.items()
                        if c not in self.drop}
                elif k not in self.drop:
                    new_stats[self.rename.get(k, k)] = v
            checksum = _rewrap_checksum(payloads)
            new_row["plan_json"] = json.dumps(new_plan)
            new_row["codecs_json"] = json.dumps(new_codecs)
            new_row["stats_json"] = json.dumps(new_stats,
                                               separators=(",", ":"),
                                               default=str)
            new_row["bytes_out"] = bytes_out
            new_row["checksum"] = checksum
            # meta-inclusive identity (see stages/encode.py)
            idh = hashlib.blake2b(digest_size=8)
            idh.update(checksum.encode())
            for jj in range(len(new_plan)):
                idh.update(new_row[f"col{jj}_meta"].encode())
                idh.update(b"\x00")
            new_row["chunk_id"] = idh.hexdigest()
            out_rows.append(new_row)
        cols = (["fragment", "chunk_id", "n_rows", "n_tokens", "bytes_in",
                 "bytes_out", "checksum", "plan_json", "codecs_json",
                 "stats_json"]
                + sorted(c for c in out_rows[0] if c.startswith("col")))
        return pa.table({c: [row[c] for row in out_rows] for c in cols})


def _rewrap_checksum(payloads) -> str:
    from ..stages.encode import _checksum

    return _checksum(payloads)


def _rewrite_schema(out_dir: str, rewriter: _RewriteSchema, tag: str,
                    gc: bool = True, concurrency=None,
                    max_concurrent_groups: int = 4) -> int:
    """Shared drop/rename driver: rewrite every active group under the
    supersedes protocol.  Returns the number of rewritten groups."""
    import ray.data as rd

    from .deletes import committed_deletes
    from .encode_pipeline import (
        LINEAGE_COLS,
        _commit_lineage,
        _gc_group,
        _meta_root,
        _run_groups,
        _transitive_supersedes,
        active_groups,
    )

    if committed_deletes(out_dir):
        raise ValueError(
            f"{tag} with pending deletion masks would orphan them "
            "(masks key on chunk ids): run vacuum_deletes(out_dir) first")
    data_root = os.path.join(out_dir, "data")
    lin_root = os.path.join(out_dir, "_lineage")
    groups = active_groups(out_dir)
    if not groups:
        raise FileNotFoundError(f"no committed encode groups under {out_dir}")
    todo = []
    for gid in groups:
        lt = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                           columns=["plan_json"])
        plan = json.loads(lt["plan_json"][0].as_py()) if lt.num_rows else []
        touched = (set(plan) & rewriter.drop) or \
            (set(plan) & set(rewriter.rename))
        if touched:
            todo.append(gid)

    def _one(gid: str) -> None:
        gdir_old = os.path.join(data_root, f"group-{gid}")
        files = sorted(
            os.path.join(gdir_old, f) for f in os.listdir(gdir_old)
            if f.endswith(".parquet")
        )
        h = hashlib.blake2b(digest_size=8)
        h.update((tag + ":" + gid).encode())
        for n in sorted(rewriter.drop) + sorted(
                f"{a}>{b}" for a, b in rewriter.rename.items()):
            h.update(b"\x00" + n.encode())
        ngid = "s" + h.hexdigest()[:15]
        gdir = os.path.join(data_root, f"group-{ngid}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
        rd.read_parquet(files, override_num_blocks=max(1, len(files))) \
            .map_batches(rewriter, batch_format="pyarrow", batch_size=16,
                         zero_copy_batch=True, concurrency=concurrency) \
            .write_parquet(gdir, compression="none", row_group_size=1)
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
        lineage = pq.read_table(gdir, columns=LINEAGE_COLS)
        _commit_lineage(lineage,
                        os.path.join(lin_root, f"group-{ngid}.parquet"))
        if gc:
            for g in shadow:
                _gc_group(out_dir, g)

    _run_groups(_one, todo, max_concurrent_groups)
    return len(todo)


def drop_columns(out_dir: str, names: Sequence[str],
                 gc: bool = True, concurrency=None) -> dict:
    """Physically remove columns from the corpus: their payload bytes
    stop existing (space reclaimed), everything else moves verbatim.
    Refuses to drop a column that stores the lengths of a SURVIVING
    list column (cross-column dedup ref — drop both or neither); the
    check runs driver-side over the lineage manifest (codecs_json is
    per-chunk there, so per-chunk ref fallbacks are all visible)
    BEFORE any group rewrites.  Lineage ``n_tokens`` is a corpus
    metric, not a schema property, and is left unchanged."""
    from .encode_pipeline import active_groups

    names = list(names)
    drop = set(names)
    lin_root = os.path.join(out_dir, "_lineage")
    for gid in active_groups(out_dir):
        lt = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                           columns=["plan_json", "codecs_json"])
        for pj, cj in zip(lt["plan_json"].to_pylist(),
                          lt["codecs_json"].to_pylist()):
            plan = json.loads(pj)
            for name, entry in zip(plan, json.loads(cj)):
                if name in drop:
                    continue  # the list column is dropped too: fine
                lc = entry.get("lengths", "")
                if isinstance(lc, str) and lc.startswith("ref:") \
                        and lc[4:] in drop:
                    raise ValueError(
                        f"column {lc[4:]!r} stores the lengths of "
                        f"{name!r} (cross-column dedup ref) and cannot "
                        f"be dropped while {name!r} survives "
                        f"(group {gid})")
    done = _rewrite_schema(out_dir, _RewriteSchema(drop=names),
                           f"drop:{','.join(sorted(names))}",
                           gc=gc, concurrency=concurrency)
    # keep the augment provenance record consistent
    rec_path = os.path.join(out_dir, "_meta", "augmented_columns.json")
    if os.path.exists(rec_path):
        with open(rec_path) as fh:
            rec = [n for n in json.load(fh) if n not in set(names)]
        tmp = rec_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, rec_path)
    return {"rewritten_groups": done, "dropped": names}


def rename_columns(out_dir: str, mapping: dict,
                   gc: bool = True, concurrency=None) -> dict:
    """Rename columns corpus-wide: a pure metadata rewrite (payloads
    move verbatim; plan, per-column meta names, zone-map keys and
    cross-column length refs all follow)."""
    from .encode_pipeline import active_groups

    lin_root = os.path.join(out_dir, "_lineage")
    for gid in active_groups(out_dir):
        lt = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                           columns=["plan_json"])
        plan = set(json.loads(lt["plan_json"][0].as_py())) if lt.num_rows \
            else set()
        # a genuine collision needs source AND target coexisting; a
        # group carrying only the target was renamed by a prior
        # (crashed) run and converges as a skip, not an error
        clash = {v for k, v in mapping.items()
                 if v in plan and k in plan} - set(mapping)
        if clash:
            raise ValueError(
                f"rename target(s) {sorted(clash)} already exist in "
                f"group {gid}")
    done = _rewrite_schema(out_dir, _RewriteSchema(rename=mapping),
                           "rename:" + ",".join(
                               f"{a}>{b}" for a, b in sorted(mapping.items())),
                           gc=gc, concurrency=concurrency)
    rec_path = os.path.join(out_dir, "_meta", "augmented_columns.json")
    if os.path.exists(rec_path):
        with open(rec_path) as fh:
            rec = sorted({mapping.get(n, n) for n in json.load(fh)})
        tmp = rec_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(rec, fh)
        os.replace(tmp, rec_path)
    return {"rewritten_groups": done, "renamed": dict(mapping)}


class _UpdateChunks:
    """Chunk-row rewriter for update_where: chunks the zone maps prove
    untouched copy VERBATIM (no decode, no re-encode); touched chunks
    decode, rewrite ONLY the matching rows through ``fn``, and
    re-encode under the same plan and pinned shared dictionaries."""

    def __init__(self, out_dir: str, predicate, fn: Callable):
        from ..stages.decode import normalize_predicates

        self.out_dir = out_dir
        self.predicates = normalize_predicates(predicate)
        self.fn = fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..codecs.shared_dict import register_dir
        from ..plan import CodecPlan, bind_plan
        from ..stages.decode import (
            chunk_may_match,
            decode_chunk_row,
            predicate_mask,
        )
        from ..stages.encode import encode_chunk
        from .encode_pipeline import load_pinned_dicts

        register_dir(self.out_dir)
        shared = load_pinned_dicts(self.out_dir)
        from .encode_pipeline import sketch_cols

        sk = sketch_cols(self.out_dir)
        names_in = batch.column_names
        out_tables = []
        for r in range(len(batch)):
            sj = batch["stats_json"][r].as_py()
            if not all(chunk_may_match(sj, p) for p in self.predicates):
                out_tables.append(batch.slice(r, 1))  # proven untouched
                continue
            row = {c: batch[c][r].as_py() for c in names_in}
            t = decode_chunk_row(row, verify_checksum=True)
            mask = np.ones(t.num_rows, dtype=bool)
            for p in self.predicates:
                pm = predicate_mask(t, p)
                if pm is None:
                    mask &= False
                else:
                    if isinstance(pm, pa.ChunkedArray):
                        pm = pm.combine_chunks()
                    mask &= pm.to_numpy(zero_copy_only=False).astype(bool)
            if not mask.any():
                out_tables.append(batch.slice(r, 1))
                continue
            matched = t.filter(pa.array(mask))
            updated = self.fn(matched)
            if not isinstance(updated, pa.Table):
                updated = pa.table(updated)
            if updated.num_rows != matched.num_rows:
                raise ValueError(
                    f"update fn returned {updated.num_rows} rows for "
                    f"{matched.num_rows} matched")
            if set(updated.column_names) != set(t.column_names):
                raise ValueError(
                    f"update fn changed the schema: {updated.column_names}"
                    f" vs {t.column_names} (use add/drop/rename_columns "
                    "for schema changes)")
            # scatter the updated rows back in place via concat + take
            # (works for every Arrow type, including list columns,
            # unlike replace_with_mask)
            unmatched = t.filter(pa.array(~mask))
            updated = pa.table({
                name: updated[name].combine_chunks().cast(
                    t.schema.field(name).type)
                for name in t.column_names})
            combined = pa.concat_tables([unmatched, updated])
            order = np.empty(t.num_rows, dtype=np.int64)
            order[~mask] = np.arange(unmatched.num_rows)
            order[mask] = unmatched.num_rows + np.arange(
                int(mask.sum()))
            new_t = combined.take(pa.array(order))
            plan = CodecPlan.by_name(*json.loads(row["plan_json"]))
            bound = bind_plan(plan, new_t.schema)
            # re-derive the corpus's recorded sketches over the new
            # values — a stale bloom/HLL must never survive an update
            enc = encode_chunk(new_t, bound, None, row["fragment"],
                               shared_dicts=shared,
                               bloom_cols=sk.get("bloom_cols"),
                               hll_cols=sk.get("hll_cols"),
                               quantile_cols=sk.get("quantile_cols"),
                               quantile_k=int(sk.get("quantile_k", 256)))
            out_tables.append(pa.table(enc).select(names_in))
        return pa.concat_tables(out_tables) if out_tables \
            else batch.slice(0, 0)


def update_where(out_dir: str, predicate, fn: Callable,
                 gc: bool = True, concurrency=None,
                 max_concurrent_groups: int = 4) -> dict:
    """UPDATE ... WHERE over an encoded corpus — the reference's
    ``modifyWhen`` (colonnade/src/Colonnade.hs:217-248) lifted to
    corpus lifecycle.  ``fn``: pa.Table of the MATCHING rows (full
    schema) -> same-schema, same-length table of their replacements;
    non-matching rows and zone-proven-untouched chunks move verbatim
    (the latter without even decoding).  Groups whose lineage zone
    maps prove no chunk can match are skipped entirely.  Commits per
    group under the supersedes protocol; refuses while deletion masks
    are pending (chunk ids change).

    Retry semantics: groups commit independently, so re-running after
    a mid-run failure re-applies ``fn`` to any rows that STILL match
    the predicate — including rows an earlier committed group already
    rewrote.  A retried update must therefore use an fn that is
    idempotent on its own output (constant assignment whose result no
    longer matches the predicate — ``replace_where`` — or a rewrite
    that moves rows out of the matched set)."""
    import ray.data as rd

    from ..stages.decode import (
        chunk_may_match,
        normalize_predicates,
        predicate_json,
    )
    from .deletes import committed_deletes
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

    session = WriterSession(out_dir)  # before the pending-masks check
    preds = normalize_predicates(predicate)
    if not preds:
        raise ValueError("update_where needs at least one predicate")
    if committed_deletes(out_dir):
        raise ValueError(
            "update_where with pending deletion masks would orphan them "
            "(masks key on chunk ids): run vacuum_deletes(out_dir) first")
    data_root = os.path.join(out_dir, "data")
    lin_root = os.path.join(out_dir, "_lineage")
    groups = active_groups(out_dir)
    if not groups:
        raise FileNotFoundError(f"no committed encode groups under {out_dir}")
    pred_key = json.dumps(predicate_json(preds),
                          sort_keys=True, default=str)
    todo = []
    for gid in groups:
        lt = pq.read_table(os.path.join(lin_root, f"group-{gid}.parquet"),
                           columns=["stats_json"])
        sj = lt["stats_json"].to_pylist()
        if any(all(chunk_may_match(s, p) for p in preds) for s in sj):
            todo.append(gid)  # else zone maps prove: nothing to update

    def _one(gid: str) -> None:
        gdir_old = os.path.join(data_root, f"group-{gid}")
        files = sorted(
            os.path.join(gdir_old, f) for f in os.listdir(gdir_old)
            if f.endswith(".parquet")
        )
        h = hashlib.blake2b(digest_size=8)
        h.update(("update:" + gid + ":" + pred_key).encode())
        ngid = "u" + h.hexdigest()[:15]
        gdir = os.path.join(data_root, f"group-{ngid}")
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
        rd.read_parquet(files, override_num_blocks=max(1, len(files))) \
            .map_batches(_UpdateChunks(out_dir, predicate, fn),
                         batch_format="pyarrow", batch_size=4,
                         zero_copy_batch=True, concurrency=concurrency) \
            .write_parquet(gdir, compression="none", row_group_size=1)
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
        lineage = pq.read_table(gdir, columns=LINEAGE_COLS)

        def _publish():
            _commit_lineage(lineage,
                            os.path.join(lin_root, f"group-{ngid}.parquet"))
            if gc:
                for g in shadow:
                    _gc_group(out_dir, g)

        # generation-checked per-group commit: a delete/vacuum/merge
        # landing mid-update aborts this rewrite cleanly (committed
        # groups stay readable, a re-run converges)
        session.commit(_publish, what=f"update group {gid}")

    _run_groups(_one, todo, max_concurrent_groups)
    return {"updated_groups": len(todo),
            "skipped_groups": len(groups) - len(todo)}


def replace_where(out_dir: str, predicate, values: dict,
                  gc: bool = True, concurrency=None) -> dict:
    """``replaceWhen``: constant-assignment UPDATE (SET col = value
    for each entry of ``values``) on rows matching ``predicate``."""
    consts = dict(values)

    def fn(matched: pa.Table) -> pa.Table:
        cols = {}
        for name in matched.column_names:
            if name in consts:
                arr = matched[name].combine_chunks()
                cols[name] = pa.array([consts[name]] * matched.num_rows,
                                      type=arr.type)
            else:
                cols[name] = matched[name]
        return pa.table(cols)

    return update_where(out_dir, predicate, fn, gc=gc,
                        concurrency=concurrency)
