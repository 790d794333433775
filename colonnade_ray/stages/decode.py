"""Decode stage: encoded chunk rows -> original Arrow rows.

Dual of encode.py — the graft of the reference's ``Siphon`` decode
drivers (``consumeBody``/``uncheckedRun``, siphon/src/Siphon.hs:578-749):
per chunk, apply every column's decoder, validate shape, accumulate
errors with coordinates instead of failing fast.

Stateless: a chunk row is self-describing (meta JSON carries codec
parameters, FSST merges included), so decode tasks are pure and
retry-safe.

Query-shaped decode (round 2):
- ``columns=``: PROJECTED decode — only the requested payload streams
  are decoded (and, via ``decode_corpus(columns=...)``, only they are
  even read from storage); integrity drops to per-column checksums
  (``meta["ck"]``) since the chunk checksum covers all payloads.
- ``predicate=(col, op, value)``: zone-map pushdown — chunks whose
  stored [min, max] provably exclude the predicate are skipped without
  decoding a byte; surviving chunks are exact-filtered after decode,
  so the result is precise, not approximate.
"""

from __future__ import annotations

import hashlib
import json
from typing import Optional, Sequence, Tuple

import pyarrow as pa

from ..codecs import decode_column
from ..errors import CellError, ChecksumError, ChunkDecodeError

_OPS = {"==", "!=", ">", ">=", "<", "<=", "in", "startswith",
        "endswith", "contains"}


def _str_upper(v: str):
    """Smallest string greater than every string with prefix ``v`` —
    the exclusive upper bound of the prefix range [v, upper).  None
    when no bound exists (empty prefix / all-max codepoints)."""
    for i in range(len(v) - 1, -1, -1):
        c = ord(v[i])
        if c < 0x10FFFF:
            return v[:i] + chr(c + 1)
    return None


def _predicate_value(v):
    """Normalize a predicate constant to the zone-map's integer repr
    for temporal values (micros / days), passthrough otherwise."""
    import datetime as dt

    if isinstance(v, dt.datetime):
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    if isinstance(v, bool):
        return int(v)
    return v


def normalize_predicates(predicate) -> list:
    """One (col, op, value) clause or a sequence of them -> validated
    list (AND semantics).  None -> []."""
    if predicate is None:
        return []
    preds = [predicate] if (
        isinstance(predicate, tuple) and len(predicate) == 3
        and isinstance(predicate[1], str)
    ) else list(predicate)
    out = []
    for p in preds:
        if len(p) != 3 or p[1] not in _OPS:
            raise ValueError(f"unsupported predicate {p!r}")
        if p[1] == "in":
            vals = list(p[2])
            if not vals:
                raise ValueError(f"empty value list in predicate {p!r}")
            p = (p[0], "in", vals)
        if p[1] in ("startswith", "endswith", "contains") \
                and not isinstance(p[2], str):
            raise ValueError(f"{p[1]} needs a string value: {p!r}")
        out.append(p)
    return out


def chunk_may_match(stats_json: Optional[str], predicate: Tuple[str, str, object]) -> bool:
    """False only when the chunk's [min, max] PROVES no row matches.
    Equality / set-membership predicates additionally probe the
    chunk's per-column Bloom filter when one was recorded
    (``encode_corpus(bloom_cols=...)``, stages/bloomzone.py) — the
    point-read pruner zone bands can't provide on high-cardinality
    columns.  Absence of a filter is conservative (may-match)."""
    if not stats_json:
        return True
    col, op, val = predicate
    stats = json.loads(stats_json)
    bent = stats.get("__bloom__", {}).get(col)
    if bent is not None and op in ("==", "in"):
        from .bloomzone import probe_bloom

        vals = val if op == "in" else [val]
        if not any(probe_bloom(bent, v) for v in vals):
            return False  # provably absent from this chunk
    if col not in stats:
        return True
    lo, hi = stats[col]
    if op == "startswith":
        # rows with prefix v live in [v, _str_upper(v)); the band
        # proves absence when it sits entirely outside that range.
        # lo may be a truncated (lower-bound) prefix — lo >= upper
        # still proves the true min is >= upper, so both prunes are
        # safe.
        if not (isinstance(lo, str) and isinstance(hi, str)
                and isinstance(val, str)):
            return True
        if hi < val:
            return False
        up = _str_upper(val)
        return up is None or lo < up
    numeric = isinstance(lo, (int, float)) and isinstance(hi, (int, float))
    if isinstance(lo, str) and isinstance(hi, str):
        # lexicographic bounds (string ids); only prune when the
        # predicate compares strings too
        vals = val if op == "in" else [val]
        if not all(isinstance(v, str) for v in vals):
            return True
    elif not numeric:
        return True
    if op == "in":
        # OR across the list: the chunk survives if ANY value could be
        # inside [min, max] (set-membership prune for id extractions)
        return any(lo <= _predicate_value(x) <= hi for x in val)
    v = _predicate_value(val)
    if op == "==":
        return lo <= v <= hi
    if op == "!=":
        return not (lo == v == hi)
    if op == ">":
        return hi > v
    if op == ">=":
        return hi >= v
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    return True


def decode_chunk_row(row: dict, verify_checksum: bool = True,
                     columns: Optional[Sequence[str]] = None) -> pa.Table:
    """One encoded row (python dict) -> Arrow table of n_rows rows.

    ``columns``: decode only these (projection).  Full decodes verify
    the chunk checksum; projections verify per-column checksums.

    Codec-level failures (torn frames: payload truncated mid-varint /
    mid-bitpack, short string data) are ACCUMULATED across columns and
    re-raised as one ChunkDecodeError with (fragment, chunk, column)
    coordinates — the not-fail-fast error semantics of ``uncheckedRun``
    (siphon/src/Siphon.hs:718-749)."""
    names = json.loads(row["plan_json"])
    want = None if columns is None else set(columns)
    full = want is None or all(f"col{i}_payload" in row for i in range(len(names)))
    if verify_checksum and want is None and full:
        h = hashlib.blake2b(digest_size=16)
        for i in range(len(names)):
            h.update(row[f"col{i}_payload"])
        actual = h.hexdigest()
        if actual != row["checksum"]:
            raise ChecksumError(row.get("fragment", ""), row.get("chunk_id", ""),
                                row["checksum"], actual)
    arrays, fields = [], []
    cell_errors = []
    # Lengths-ref resolution (cross-column dedup, stages/encode.py
    # _lengths_ref_hints): a list column may store its lengths stream
    # as a reference to a sibling int column.  Scan the requested
    # metas for refs, decode the targets first (even when projected
    # out of the result), and hand their values down as ``refs``.
    metas: dict = {}
    for i, name in enumerate(names):
        if want is not None and name not in want:
            continue
        metas[i] = json.loads(row[f"col{i}_meta"])
    ref_targets: list = []
    for meta in metas.values():
        if meta.get("kind") == "list":
            lentry = meta["streams"]["lengths"]
            if lentry["codec"] == "ref" and lentry["meta"]["col"] not in ref_targets:
                ref_targets.append(lentry["meta"]["col"])
    refs: dict = {}
    idx_of = {name: i for i, name in enumerate(names)}

    def _decode_one(i: int, name: str, meta: dict):
        payload = row[f"col{i}_payload"]
        if verify_checksum and want is not None and "ck" in meta:
            actual = hashlib.blake2b(payload, digest_size=8).hexdigest()
            if actual != meta["ck"]:
                raise ChecksumError(row.get("fragment", ""), row.get("chunk_id", ""),
                                    meta["ck"], actual)
        try:
            if "z" in meta:  # generic post-compression layer (stored-
                # byte checksums above already verified integrity)
                zname, orig = meta["z"]
                payload = pa.Codec(zname).decompress(
                    payload, decompressed_size=orig, asbytes=True)
            return decode_column(payload, meta, refs=refs)
        except (ValueError, IndexError, KeyError, OSError,
                pa.lib.ArrowInvalid) as e:
            cell_errors.append(
                CellError(column=name, row=-1,
                          content=f"<{len(payload)} payload bytes>",
                          reason=str(e))
            )
            return None

    for tname in ref_targets:
        ti = idx_of.get(tname)
        if ti is None or f"col{ti}_payload" not in row:
            cell_errors.append(CellError(
                column=tname, row=-1, content="",
                reason="lengths-ref target payload not available in this read"))
            continue
        tmeta = metas.get(ti) or json.loads(row[f"col{ti}_meta"])
        tarr = _decode_one(ti, tname, tmeta)
        if tarr is not None:
            refs[tname] = tarr
    for i, name in enumerate(names):
        if i not in metas:
            continue
        meta = metas[i]
        tname = name if name in refs else None
        arr = refs[name] if tname is not None else _decode_one(i, name, meta)
        if arr is None:
            continue
        arrays.append(arr)
        fields.append(pa.field(name, arr.type))
    if cell_errors:
        raise ChunkDecodeError(row.get("fragment", ""), row.get("chunk_id", ""),
                               cell_errors)
    if want is not None:
        missing = want - {f.name for f in fields}
        if missing:
            raise ChunkDecodeError(
                row.get("fragment", ""), row.get("chunk_id", ""),
                [CellError(column=c, row=-1, content="",
                           reason="column not in encoded plan") for c in sorted(missing)],
            )
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def chunk_all_match(stats_json: Optional[str],
                    predicate: Tuple[str, str, object]) -> bool:
    """True only when the chunk's [min, max] PROVES every row matches
    — the COUNT-pushdown fast path (count n_rows without touching the
    payload).  Requires a zone entry, a comparable bound, and a
    proven-zero null count (nulls never satisfy a comparison, and
    [min, max] is computed over non-nulls; chunks encoded before the
    `__nulls__` side table simply never prove all-match)."""
    if not stats_json:
        return False
    col, op, val = predicate
    stats = json.loads(stats_json)
    if col not in stats:
        return False
    if "__nulls__" not in stats:
        return False  # pre-__nulls__ chunk: zero nulls unprovable
    if stats["__nulls__"].get(col):
        return False
    lo, hi = stats[col]
    if op == "startswith":
        # both endpoints carrying the prefix proves every row between
        # them does too: lo >= v and hi < _str_upper(v) bound the whole
        # band inside the prefix range (truncated lo stays safe — the
        # true min is >= lo and <= hi, both inside the range)
        return (isinstance(lo, str) and isinstance(hi, str)
                and isinstance(val, str) and val != ""
                and lo.startswith(val) and hi.startswith(val))
    numeric = isinstance(lo, (int, float)) and isinstance(hi, (int, float))
    if isinstance(lo, str) and isinstance(hi, str):
        vals = val if op == "in" else [val]
        if not all(isinstance(v, str) for v in vals):
            return False
        # a truncated string MIN is a lower bound, not the true min —
        # good enough for ">=" proofs only when strictly above
    elif not numeric:
        return False
    if op == "in":
        return lo == hi and any(_predicate_value(x) == lo for x in val)
    v = _predicate_value(val)
    if op == "==":
        return lo == v == hi
    if op == "!=":
        return hi < v or lo > v
    if op == ">":
        return lo > v
    if op == ">=":
        return lo >= v
    if op == "<":
        return hi < v
    if op == "<=":
        return hi <= v
    return False


def predicate_mask(t: pa.Table, predicate: Tuple[str, str, object]):
    """Boolean array: predicate is TRUE per row (nulls -> False, the
    SQL three-valued outcome of WHERE / DELETE WHERE).  None when the
    column isn't present (caller decides the open-world default)."""
    import pyarrow.compute as pc

    col, op, val = predicate
    if col not in t.column_names:
        return None
    c = t[col]
    if op == "in":
        vals = pa.array(list(val)).cast(c.type)
        m = pc.is_in(c, value_set=vals)
    elif op == "startswith":
        m = pc.starts_with(c, pattern=val)
    elif op == "endswith":
        m = pc.ends_with(c, pattern=val)
    elif op == "contains":
        m = pc.match_substring(c, pattern=val)
    else:
        v = pa.scalar(val).cast(c.type) if not isinstance(val, pa.Scalar) else val
        fn = {"==": pc.equal, "!=": pc.not_equal, ">": pc.greater,
              ">=": pc.greater_equal, "<": pc.less, "<=": pc.less_equal}[op]
        m = fn(c, v)
    return pc.fill_null(m, False)


def _exact_filter(t: pa.Table, predicate: Tuple[str, str, object]) -> pa.Table:
    m = predicate_mask(t, predicate)
    return t if m is None else t.filter(m)


class DecodeBatch:
    """map_batches callable: a batch of encoded chunk rows -> the
    concatenation of their decoded tables (optionally projected /
    predicate-pruned)."""

    def __init__(self, verify_checksum: bool = True,
                 columns: Optional[Sequence[str]] = None,
                 predicate=None,
                 dict_dirs: Optional[Sequence[str]] = None,
                 deletes_dir: Optional[str] = None):
        # one (col, op, value) clause or a list of clauses AND'd
        # together; each clause prunes via the zone maps independently
        self.predicates = normalize_predicates(predicate)
        self.verify_checksum = verify_checksum
        self.columns = list(columns) if columns is not None else None
        # shared-dict search roots, registered lazily IN THE WORKER
        # (__init__ may run on the driver before pickling)
        self.dict_dirs = list(dict_dirs) if dict_dirs else []
        # merge-on-read deletion vectors (pipelines/deletes.py): the
        # corpus root whose committed _deletes/ sidecars mask rows out
        # of every decode.  Masks load lazily in the worker through a
        # process-global cache — the driver only ships the path.
        self.deletes_dir = deletes_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.dict_dirs:
            from ..codecs.shared_dict import register_dir

            for d in self.dict_dirs:
                register_dir(d)
        del_masks = {}
        if self.deletes_dir is not None:
            from ..pipelines.deletes import load_delete_masks

            del_masks = load_delete_masks(self.deletes_dir)
        tables = []
        cols = batch.column_names
        for r in range(len(batch)):
            if self.predicates and "stats_json" in cols:
                sj = batch["stats_json"][r].as_py()
                if not all(chunk_may_match(sj, p) for p in self.predicates):
                    continue  # zone map proves no row matches
            dmask = None
            if del_masks:
                key = (batch["fragment"][r].as_py(),
                       batch["chunk_id"][r].as_py())
                dmask = del_masks.get(key)
                if isinstance(dmask, str):  # "all": whole chunk deleted
                    continue
            row = {c: batch[c][r].as_py() for c in cols}
            t = decode_chunk_row(row, self.verify_checksum, self.columns)
            if dmask is not None:
                t = t.filter(pa.array(~dmask))
            for p in self.predicates:
                t = _exact_filter(t, p)
            if t.num_rows:
                tables.append(t)
        if not tables:
            return self._empty_like(batch)
        return pa.concat_tables(tables)

    def _empty_like(self, batch: pa.Table) -> pa.Table:
        """Schema-correct empty output (derived from chunk meta, no
        payload decode) so blocks stay schema-consistent when the zone
        map prunes everything."""
        if len(batch) == 0:
            return pa.table({})
        from ..codecs.columns import desc_to_type

        names = json.loads(batch["plan_json"][0].as_py())
        want = None if self.columns is None else set(self.columns)
        fields = []
        for i, name in enumerate(names):
            if want is not None and name not in want:
                continue
            mcol = f"col{i}_meta"
            if mcol not in batch.column_names:
                continue
            meta = json.loads(batch[mcol][0].as_py())
            fields.append(pa.field(name, desc_to_type(meta["atype"])))
        return pa.table(
            {f.name: pa.array([], f.type) for f in fields}
        ) if fields else pa.table({})


def decode_batch(batch: pa.Table) -> pa.Table:
    return DecodeBatch()(batch)
