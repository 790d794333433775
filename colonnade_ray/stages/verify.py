"""Round-trip verification: order-insensitive multiset fingerprints.

Graft of the reference's round-trip property ``propIsoStream``
(siphon/test/Test.hs:262-276): decode(encode(rows)) == rows.  At
cluster scale the invariant is keyed per row (doc_id), not by global
order (SURVEY.md §4 ordering row), so we compare *multisets* of
per-row fingerprints: each side maps to (sum, xor, count) of 64-bit
row hashes — no shuffle, no join, O(1) driver state.

Hashing is fully vectorized: token arrays use a segmented polynomial
hash in the 2^64 ring (np.cumsum + per-row differences), strings use
pandas' SipHash (deterministic fixed key across processes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_FNV = np.uint64(1099511628211)


def _powers(n: int) -> np.ndarray:
    p = np.empty(n, dtype=np.uint64)
    if n:
        p[0] = 1
        with np.errstate(over="ignore"):  # 2^64 wraparound is the point
            for i in range(1, n):  # cheap: n = max row length, computed once per batch
                p[i] = p[i - 1] * _FNV
    return p


_POW_CACHE: dict = {}


def _powers_cached(n: int) -> np.ndarray:
    key = 1 << max(int(n) - 1, 0).bit_length()  # round up, few cache entries
    if key not in _POW_CACHE:
        _POW_CACHE[key] = _powers(key)
    return _POW_CACHE[key][:n] if n else np.zeros(0, np.uint64)


_SEG_VALUES = 2_000_000  # ~16 MB/uint64 temp: bounds working set per call


def hash_token_lists(arr: pa.Array) -> np.ndarray:
    """Per-row polynomial hash of a list<int> column (uint64).

    Large columns are processed in row segments of ~_SEG_VALUES flat
    values: the kernel allocates ~5 word-sized temporaries per value,
    so an unbounded batch (10s of millions of tokens) churns hundreds
    of MB per call — segmenting pins peak memory regardless of how
    many chunks the caller bundled into one task."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.uint64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    if offs[-1] - offs[0] > _SEG_VALUES and n > 1:
        # split on row boundaries so each segment's rows hash whole
        out = np.empty(n, dtype=np.uint64)
        lo = 0
        while lo < n:
            # last row boundary within the value budget; always >= 1 row
            hi = int(np.searchsorted(offs, offs[lo] + _SEG_VALUES, side="right")) - 1
            hi = min(max(hi, lo + 1), n)
            out[lo:hi] = _hash_token_lists_dense(arr.slice(lo, hi - lo))
            lo = hi
        return out
    return _hash_token_lists_dense(arr)


def _hash_token_lists_dense(arr: pa.Array) -> np.ndarray:
    n = len(arr)
    lens = pc.fill_null(pc.list_value_length(arr), -1).to_numpy(zero_copy_only=False).astype(np.int64)
    null_rows = lens < 0
    lens = np.where(null_rows, 0, lens)
    vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    if vals.size:
        # pos-in-row without np.repeat (np.repeat measured 0.4s/4M
        # here): ones-cumsum with a reset scatter at each row start;
        # empty rows stack duplicate starts, so use an accumulating
        # subtract.at over the (small) per-row boundary array.
        delta = np.ones(vals.size, dtype=np.int64)
        delta[0] = 0
        starts = offsets[1:-1]
        in_range = starts < vals.size
        np.subtract.at(delta, starts[in_range], lens[:-1][in_range])
        pos = np.cumsum(delta)
        maxlen = int(lens.max())
        terms = (vals + np.uint64(0x9E3779B97F4A7C15)) * _powers_cached(maxlen)[pos]
        csum = np.concatenate(([np.uint64(0)], np.cumsum(terms, dtype=np.uint64)))
        h = csum[offsets[1:]] - csum[offsets[:-1]]
    else:
        h = np.zeros(n, np.uint64)
    # fold in length; mark nulls distinctly
    h = h * np.uint64(31) + lens.view(np.uint64) + np.uint64(1)
    h[null_rows] = np.uint64(0xDEADBEEF)
    return h


def hash_column(arr) -> np.ndarray:
    """Per-row uint64 hash of any supported column."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_list(t):
        return hash_token_lists(arr)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        s = pd.Series(arr.to_pandas())
        return pd.util.hash_array(s.to_numpy(dtype=object), categorize=False).astype(np.uint64)
    null_mask = np.zeros(len(arr), dtype=bool) if arr.null_count == 0 else ~arr.is_valid().to_numpy(zero_copy_only=False)
    filled = pc.fill_null(arr, pc.cast(pa.scalar(0), t)) if arr.null_count else arr
    np_vals = filled.to_numpy(zero_copy_only=(arr.null_count == 0 and not pa.types.is_boolean(t)))
    if np_vals.dtype.kind == "M":
        np_vals = np_vals.view("i8")
    if np_vals.dtype.kind == "f":
        np_vals = np_vals.view(f"i{np_vals.dtype.itemsize}")
    h = (np_vals.astype(np.int64).view(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) * _FNV
    h[null_mask] = np.uint64(0xDEADBEEF)
    return h


def batch_digest(batch: pa.Table, columns=None) -> dict:
    """One digest row per batch: multiset (sum, xor, count) of row hashes."""
    cols = columns or batch.column_names
    n = len(batch)
    row_h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j, c in enumerate(cols):
            row_h = row_h * np.uint64(1000003) + hash_column(batch[c])
    # emit as signed int64 bit patterns (Arrow-native; avoids pickled
    # object fallback for values >= 2^63)
    return {
        "h_sum": [int(row_h.sum(dtype=np.uint64).astype(np.int64))],
        "h_xor": [int(np.bitwise_xor.reduce(row_h).astype(np.int64)) if n else 0],
        "n": [n],
    }


def dataset_digest(ds, columns=None) -> tuple:
    """(sum mod 2^64, xor, count) over a whole Dataset — order-free."""
    from ..util import default_concurrency

    cols = list(columns) if columns else None
    digests = ds.map_batches(
        lambda b: batch_digest(b, cols), batch_format="pyarrow",
        concurrency=default_concurrency(),
    ).take_all()
    s, x, n = 0, 0, 0
    for d in digests:
        s = (s + (d["h_sum"] & 0xFFFFFFFFFFFFFFFF)) % (1 << 64)
        x ^= d["h_xor"] & 0xFFFFFFFFFFFFFFFF
        n += d["n"]
    return s, x, n
