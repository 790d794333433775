"""Structured-payload operators: JSON field extraction and pivot.

Semi-structured side-columns (an event's JSON props bag) are the
normal companion of log/event tables; extracting a typed field is a
pure vectorized row pass, and the long->wide pivot is one
groups-bounded count exchange + a groups-sized reshape block (the
build_vocab "aggregate tables are block-sized" convention).
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa


def extract_json_int(ds, col: str = "props", field: str = "k",
                     out_col: str | None = None):
    """Append an int64 column extracted from a flat-JSON string
    column: one compiled-regex vectorized pass per batch (the
    regexp_extract SQL-twin semantics — rows where the field is
    missing or non-integer yield null).  For nested JSON swap the
    kernel for a real parser behind the same column contract."""
    out = out_col or field
    pat = re.compile(r'"' + re.escape(field) + r'"\s*:\s*(-?\d+)')

    def add(batch: pa.Table) -> pa.Table:
        s = batch[col].to_pandas().astype("string")
        ext = s.str.extract(pat, expand=False).astype("Int64")
        return batch.append_column(
            out, pa.Array.from_pandas(ext, type=pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow")


def pivot_counts(ds, row_col: str, col_col: str):
    """Long -> wide count matrix: one (row, col)-bounded groupby
    exchange, then the reshape runs on ONE groups-sized block.
    Output columns: row_col + the sorted distinct values of col_col
    (absent cells filled 0) — the COUNT(*) FILTER SQL-twin shape."""
    from ray.data.aggregate import Count

    counts = ds.groupby([row_col, col_col]).aggregate(Count(alias_name="n"))

    def reshape(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        wide = df.pivot_table(index=row_col, columns=col_col, values="n",
                              fill_value=0, aggfunc="sum")
        wide = wide.reindex(sorted(wide.columns), axis=1).sort_index()
        out = {row_col: pa.array(wide.index.to_numpy(dtype=object))}
        for c in wide.columns:
            out[str(c)] = pa.array(wide[c].to_numpy().astype(np.int64))
        return pa.table(out)

    return counts.repartition(1).map_batches(reshape, batch_format="pyarrow")
