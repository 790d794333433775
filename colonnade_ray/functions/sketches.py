"""Mergeable cardinality sketches for corpus statistics.

HyperLogLog (Flajolet et al. 2007, public literature) re-expressed
Ray-Data-first: every batch emits PARTIAL registers (a max per
(group, register) — at most groups x m rows per batch, independent of
batch size), one small groupby-max merges them, and the estimate is a
pure driver-side formula over m rows per group.  Register content is
fully deterministic given the hash, and the hash is the repo's md5
SQL-twin convention — so even the *sketch state* is hash-checkable
against a DuckDB twin (the estimate itself is pytest-checked against
exact distinct counts).

Reference analog: the ``annotateFinely`` partial/final aggregate split
(colonnade/src/Colonnade.hs:236-252) — partials combine associatively
across chunks, one final pass renders the answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import _WORD_LOWER_RE

_HLL_B = 6                     # 2^6 = 64 registers
_HLL_M = 1 << _HLL_B
_REM_BITS = 64 - _HLL_B
_REM_MASK = np.uint64((1 << _REM_BITS) - 1)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length (floor(log2(x)) + 1; 0 -> 0) —
    float log2 would round near power-of-two boundaries above 2^53."""
    x = x.copy()
    bl = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        bl[m] += s
        x[m] >>= np.uint64(s)
    bl[x > 0] += 1
    return bl


def _md5_hash_u64(words: np.ndarray) -> np.ndarray:
    """First 8 bytes (big-endian) of md5 — the SQL-twin hash."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in words),
        dtype=np.uint64, count=len(words),
    )


def _registers(hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash: top-6 bits select the register,
    rho = leading-zero count of the remaining 58 bits + 1 (59 when the
    remainder is all-zero) — identical to the DuckDB
    ``58 - length(bin(rem)) + 1`` formulation."""
    reg = (hashes >> np.uint64(_REM_BITS)).astype(np.int64)
    rem = hashes & _REM_MASK
    rho = np.where(rem == 0, _REM_BITS + 1, _REM_BITS - _bit_length_u64(rem) + 1)
    return reg, rho.astype(np.int64)


def hll_word_registers(ds, group_col: str = "source", text_col: str = "text",
                       hash_fn: str = "md5"):
    """Per-group HLL registers over the distinct WORDS of each group
    (approximate vocabulary size per domain): Dataset of
    (group, reg, r) with r = max rho seen.  The exchange is bounded by
    groups x 64 rows per batch regardless of corpus size."""
    from ray.data.aggregate import Max

    empty = pa.table({group_col: pa.array([], pa.string()),
                      "reg": pa.array([], pa.int64()),
                      "r": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.coalesce(batch[text_col], "")).to_pandas()
        words = txt.str.findall(_WORD_LOWER_RE)
        lens = words.str.len().to_numpy().astype(np.int64)
        if not lens.sum():
            return empty
        grp = batch[group_col].to_pandas().to_numpy(dtype=object)
        flat_grp = np.repeat(grp, lens)
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if len(w)])
        # distinct (group, word) within the batch before hashing:
        # md5 cost is O(batch vocab), not O(tokens)
        key = pd.DataFrame({"g": flat_grp, "w": flat}).drop_duplicates()
        if hash_fn == "md5":
            h = _md5_hash_u64(key["w"].to_numpy(dtype=object))
        else:
            h = pd.util.hash_array(key["w"].to_numpy(dtype=object),
                                   categorize=False).astype(np.uint64)
        reg, rho = _registers(h)
        d = pd.DataFrame({group_col: key["g"].to_numpy(),
                          "reg": reg, "r": rho})
        m = d.groupby([group_col, "reg"], sort=False)["r"].max().reset_index()
        return pa.table({group_col: pa.array(m[group_col], pa.string()),
                         "reg": pa.array(m["reg"].to_numpy()),
                         "r": pa.array(m["r"].to_numpy())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby([group_col, "reg"]).aggregate(Max("r", alias_name="r"))


def hll_estimate(registers: pd.DataFrame, group_col: str = "source") -> pd.DataFrame:
    """Standard HLL estimate (alpha_64 bias correction + small-range
    linear counting) from a (group, reg, r) frame — m rows per group,
    driver-scale by construction."""
    alpha = 0.709  # alpha_m for m = 64
    out = []
    for g, sub in registers.groupby(group_col, sort=True):
        r = np.zeros(_HLL_M, np.int64)
        r[sub["reg"].to_numpy()] = sub["r"].to_numpy()
        est = alpha * _HLL_M * _HLL_M / np.sum(np.power(2.0, -r))
        zeros = int((r == 0).sum())
        if est <= 2.5 * _HLL_M and zeros:
            est = _HLL_M * np.log(_HLL_M / zeros)  # linear counting
        out.append({group_col: g, "estimate": float(est)})
    return pd.DataFrame(out)
