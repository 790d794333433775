"""Shuffle-transport narrowing for integer list columns.

The flagship exchange (skew.partition_by_source) moves every token of
the corpus through the object store / network as ``list<int32>`` even
though the corpus vocabulary fits in 16 (often 8) bits.  On a real
cluster the all-to-all exchange is NIC-bound, on this sandbox it is
memory-bandwidth-bound — either way bytes moved is the cost model, so
the engine narrows the values to the minimal byte width for transport
and widens them back inside the encoder actor.  This is the Ray-Data
analog of shuffle-payload compression in distributed engines, kept
memcpy-cheap (a single vectorized ``astype`` each way, no bit fiddling
on the hot path).

Width selection is decided once per job from Parquet FOOTER statistics
(`tokens.list.element` min/max per row group) — no data read, one
uniform width per column for the whole run, so the packed schema is
constant across blocks and unpack is loop-free.  Columns without
complete footer stats, with nulls, or already at minimal width are
left untouched (identity).

Packed layout per column ``name``:
  ``__cr_tp_<name>``: binary — each row's values as little-endian
  fixed-width integers (row byte length = n_values * width).
The original column is removed; the spec (width + original dtype)
travels in the actor constructor, not per row.

Reference parity note: the reference's Siphon streams cells as
compact bytestrings between pipeline stages (siphon/src/Siphon.hs
chunked builder output); this module is that idea applied to Ray's
inter-stage object transport.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TRANSPORT_PREFIX = "__cr_tp_"

_PHYS_TO_NP = {"INT32": np.int32, "INT64": np.int64}
_WIDTH_TO_NP = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def list_transport_spec(paths: Sequence[str], columns: Optional[Sequence[str]] = None) -> Dict[str, dict]:
    """Decide per-column transport width from Parquet footer stats.

    Returns {column: {"width": w, "src": "uint16", "orig": "int32"}}
    for every ``list<int32|int64>`` column whose global [min, max]
    (union over every row group of every file) proves a narrower
    unsigned width is lossless.  A single file/row-group missing
    min/max stats, any nulls at the leaf, or no savings vs the
    original width disqualify the column.
    """
    import pyarrow.parquet as pq

    acc: Dict[str, dict] = {}
    bad: set = set()
    for p in paths:
        try:
            md = pq.ParquetFile(p).metadata
        except Exception:
            return {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                parts = c.path_in_schema.split(".")
                if len(parts) != 3 or parts[1] != "list":
                    continue
                top = parts[0]
                if top in bad or (columns is not None and top not in columns):
                    continue
                st = c.statistics
                # NB: leaf null_count conflates null lists, EMPTY lists
                # and null ELEMENTS (verified empirically: all three
                # read back as null_count=1), so the only footer-provable
                # safe state is null_count == 0.  Element nulls would
                # corrupt the narrowing astype (NaN -> garbage), so any
                # nonzero/absent null_count disqualifies the column —
                # identity transport is always correct, just unnarrowed.
                if (
                    c.physical_type not in _PHYS_TO_NP
                    or st is None
                    or not st.has_min_max
                    or st.null_count is None
                    or st.null_count > 0
                ):
                    bad.add(top)
                    acc.pop(top, None)
                    continue
                ent = acc.setdefault(
                    top,
                    {"min": st.min, "max": st.max, "orig": c.physical_type},
                )
                ent["min"] = min(ent["min"], st.min)
                ent["max"] = max(ent["max"], st.max)
                if ent["orig"] != c.physical_type:
                    bad.add(top)
                    acc.pop(top, None)
    spec: Dict[str, dict] = {}
    for top, ent in acc.items():
        if ent["min"] < 0:
            continue
        if ent["max"] < (1 << 8):
            width = 1
        elif ent["max"] < (1 << 16):
            width = 2
        elif ent["max"] < (1 << 32):
            width = 4
        else:
            continue
        orig_np = _PHYS_TO_NP[ent["orig"]]
        if width >= np.dtype(orig_np).itemsize:
            continue  # no savings
        spec[top] = {
            "width": width,
            "src": np.dtype(_WIDTH_TO_NP[width]).name,
            "orig": np.dtype(orig_np).name,
        }
    return spec


def _as_single_array(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    return col


def pack_list_columns(batch: pa.Table, spec: Dict[str, dict]) -> pa.Table:
    """Replace each spec'd list column with its packed binary twin.

    Vectorized: one ``astype`` narrowing pass over the flat values and
    a cumsum for byte offsets; no per-row work.  Null lists become null
    binary rows (validity bitmap carried).  Falls back to identity per
    column on >2 GiB payloads (int32 binary offsets).
    """
    for name, sp in spec.items():
        if name not in batch.column_names:
            continue
        arr = _as_single_array(batch[name])
        if not pa.types.is_list(arr.type):
            continue
        flat = arr.flatten()  # values of non-null rows, in row order
        if flat.null_count:
            # Null ELEMENTS (e.g. [1, 2, None]) cannot be narrowed:
            # to_numpy would yield NaN floats and astype garbage.  Leave
            # the column as-is.  Footer-driven specs never reach here
            # (list_transport_spec requires leaf null_count == 0); for
            # hand-built specs this trades narrowing for correctness —
            # callers mixing clean and null-element batches under one
            # spec get per-batch schema divergence and should not spec
            # such columns.
            continue
        v = flat.to_numpy(zero_copy_only=False)
        narrow = v.astype(_WIDTH_TO_NP[sp["width"]], copy=False)
        lengths = (
            pc.fill_null(pc.list_value_length(arr), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        boffs = np.empty(len(arr) + 1, dtype=np.int64)
        boffs[0] = 0
        np.cumsum(lengths * sp["width"], out=boffs[1:])
        if boffs[-1] >= (1 << 31):
            continue
        validity = None
        if arr.null_count:
            valid = pc.is_valid(arr)
            validity = valid.combine_chunks().buffers()[1] if isinstance(
                valid, pa.ChunkedArray
            ) else valid.buffers()[1]
        bin_arr = pa.Array.from_buffers(
            pa.binary(),
            len(arr),
            [validity, pa.py_buffer(boffs.astype(np.int32)), pa.py_buffer(np.ascontiguousarray(narrow))],
            null_count=arr.null_count,
        )
        idx = batch.column_names.index(name)
        batch = batch.set_column(idx, pa.field(TRANSPORT_PREFIX + name, pa.binary()), bin_arr)
    return batch


def unpack_list_columns(batch: pa.Table, spec: Dict[str, dict]) -> pa.Table:
    """Inverse of pack_list_columns: widen back to the original dtype.

    Loop-free: the uniform per-job width means the whole batch's bytes
    reinterpret with one ``view`` + one widening ``astype``.
    """
    for name, sp in spec.items():
        tname = TRANSPORT_PREFIX + name
        if tname not in batch.column_names:
            continue
        arr = _as_single_array(batch[tname])
        n = len(arr)
        w = sp["width"]
        if n == 0:
            la = pa.ListArray.from_arrays(
                pa.array(np.zeros(1, np.int32)), pa.array(np.empty(0, np.dtype(sp["orig"])))
            )
        else:
            offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
                arr.offset : arr.offset + n + 1
            ]
            raw = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]]
            if w > 1 and (raw.__array_interface__["data"][0] % w) != 0:
                raw = raw.copy()
            vals = raw.view(np.dtype(sp["src"])).astype(np.dtype(sp["orig"]))
            mask = pc.is_null(arr) if arr.null_count else None
            la = pa.ListArray.from_arrays(
                pa.array(((offs - offs[0]) // w).astype(np.int32)),
                pa.array(vals),
                mask=mask,
            )
        idx = batch.column_names.index(tname)
        batch = batch.set_column(idx, pa.field(name, la.type), la)
    return batch
