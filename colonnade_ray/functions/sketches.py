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


# ---------------------------------------------------------------------------
# t-digest quantile sketch (Dunning & Ertl, public literature)

_TD_DELTA = 100


def _k_scale(q: np.ndarray) -> np.ndarray:
    """t-digest k1 scale function: arcsin compression concentrates
    centroid resolution at the tails, where quantile error matters."""
    return (np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0) / np.pi) + 0.5


def _compress_centroids(means: np.ndarray, weights: np.ndarray,
                        delta: int = _TD_DELTA) -> tuple[np.ndarray, np.ndarray]:
    """Merge (mean, weight) centroids down to <= ~delta buckets —
    fully vectorized (one argsort + one reduceat), deterministic for a
    given multiset of centroids (ties broken by mean order)."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    m, w = means[order].astype(np.float64), weights[order].astype(np.float64)
    total = w.sum()
    qmid = (np.cumsum(w) - w / 2.0) / total
    buckets = np.minimum((_k_scale(qmid) * delta).astype(np.int64), delta - 1)
    # reduceat over bucket runs: weighted means per bucket
    starts = np.flatnonzero(np.diff(buckets, prepend=buckets[0] - 1))
    wsum = np.add.reduceat(w, starts)
    msum = np.add.reduceat(m * w, starts)
    return msum / wsum, wsum


def tdigest_partials(ds, group_col: str, value_col: str,
                     delta: int = _TD_DELTA):
    """Per-group t-digest centroids as mergeable Dataset rows
    (group, c_mean, c_weight): every batch compresses its values to
    <= delta centroids, ONE bucketed exchange merges per group — the
    100-TB quantile path (exact grouped_quantiles is irreducibly
    all-to-all in value rows; this moves <= delta rows per
    (group, batch))."""
    from .bucketing import bucketed_group_apply

    def partial(b: pa.Table) -> pd.DataFrame:
        df = pa.table({group_col: b[group_col],
                       value_col: b[value_col]}).to_pandas()
        out = []
        for g, sub in df.groupby(group_col, sort=False):
            v = sub[value_col].to_numpy(dtype=np.float64)
            m, w = _compress_centroids(v, np.ones_like(v), delta)
            out.append(pd.DataFrame({group_col: g, "c_mean": m, "c_weight": w}))
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {group_col: [], "c_mean": [], "c_weight": []})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for key, sub in g.groupby(group_col, sort=False):
            m, w = _compress_centroids(sub["c_mean"].to_numpy(),
                                       sub["c_weight"].to_numpy(), delta)
            out.append(pd.DataFrame({group_col: key, "c_mean": m, "c_weight": w}))
        return pd.concat(out, ignore_index=True)

    return bucketed_group_apply(parts, group_col, merge_bucket)


def tdigest_quantile(centroids: pd.DataFrame, qs, group_col: str = "source"
                     ) -> pd.DataFrame:
    """Quantile estimates from merged centroids (groups x delta rows —
    driver-small): linear interpolation over centroid midpoints."""
    rows = []
    for g, sub in centroids.groupby(group_col, sort=True):
        sub = sub.sort_values("c_mean", kind="mergesort")
        m = sub["c_mean"].to_numpy()
        w = sub["c_weight"].to_numpy()
        cq = (np.cumsum(w) - w / 2.0) / w.sum()
        for q in qs:
            rows.append({group_col: g, "q": float(q),
                         "value": float(np.interp(q, cq, m))})
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005, public literature)

_CMS_D = 4       # hash rows
_CMS_W = 512     # counters per row


def _md5_positions(words: np.ndarray, k: int, mod: int) -> np.ndarray:
    """(len(words), k) positions: slot d uses bytes [4d, 4d+4) of the
    md5 digest, big-endian, mod ``mod`` — byte-for-byte the DuckDB
    ``('0x' || substr(md5(w), 1+8*d, 8))::UBIGINT % mod`` twin.
    Shared by the Count-Min counters and the Bloom bit positions."""
    import hashlib

    out = np.empty((len(words), k), dtype=np.int64)
    for i, w in enumerate(words):
        dg = hashlib.md5(w.encode()).digest()
        for d in range(k):
            out[i, d] = int.from_bytes(dg[4 * d : 4 * d + 4], "big") % mod
    return out


def _cms_cols(words: np.ndarray) -> np.ndarray:
    return _md5_positions(words, _CMS_D, _CMS_W)


def cms_word_registers(ds, text_col: str = "text"):
    """Count-Min registers over word OCCURRENCES of the corpus: a
    Dataset of (d, j, c) counter cells.  Per-batch partials count the
    batch locally (md5 cost is O(batch vocab), scatter-add is
    vectorized), so the exchange is bounded by D x W = 2048 rows per
    batch regardless of corpus size; the groupby-SUM merge is the
    sketch's native associative combine.  Like the HLL twin, the
    register STATE is a pure function of the md5 hash — the full
    counter table hash-matches a DuckDB twin, while the derived
    point-estimate property (min over rows >= true count) is
    pytest-checked."""
    from ray.data.aggregate import Sum

    empty = pa.table({"d": pa.array([], pa.int64()),
                      "j": pa.array([], pa.int64()),
                      "c": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.coalesce(batch[text_col], "")).to_pandas()
        words = txt.str.findall(_WORD_LOWER_RE)
        flat = [w for ws in words for w in ws]
        if not flat:
            return empty
        uniq, counts = np.unique(np.asarray(flat, dtype=object), return_counts=True)
        cols = _cms_cols(uniq)
        mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for d in range(_CMS_D):
            np.add.at(mat[d], cols[:, d], counts)
        d_idx, j_idx = np.nonzero(mat)
        return pa.table({"d": pa.array(d_idx.astype(np.int64)),
                         "j": pa.array(j_idx.astype(np.int64)),
                         "c": pa.array(mat[d_idx, j_idx])})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby(["d", "j"]).aggregate(Sum("c", alias_name="c"))


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, public literature) — the membership member
# of the sketch family (HLL = cardinality, CMS = frequency, Bloom =
# membership).  State is the SET of set bit positions, which merges by
# union — i.e. a distinct-rows Dataset — and, like HLL/CMS, is a pure
# function of the md5 twin hash, so the full filter STATE hash-matches
# a DuckDB twin; the probabilistic guarantee (no false negatives,
# ~(1-e^(-kn/m))^k false-positive rate) is pytest-checked.

_BLOOM_K = 3       # hash slots per key (md5 bytes [0,4) [4,8) [8,12))
_BLOOM_M = 4096    # bits


def bloom_word_bits(ds, text_col: str = "text"):
    """Build the filter over the corpus's distinct words: a Dataset of
    (bit,) rows, sorted.  Per-batch partials dedupe words before
    hashing (md5 cost is O(batch vocab)) and emit <= min(K x vocab, M)
    bit rows; the ONE groupby exchange is bounded by M = 4096 rows per
    batch regardless of corpus size — union-merge is the Bloom
    combine."""
    from ray.data.aggregate import Count

    empty = pa.table({"bit": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.coalesce(batch[text_col], "")).to_pandas()
        words = txt.str.findall(_WORD_LOWER_RE)
        flat = [w for ws in words for w in ws]
        if not flat:
            return empty
        uniq = np.unique(np.asarray(flat, dtype=object))
        bits = np.unique(_md5_positions(uniq, _BLOOM_K, _BLOOM_M))
        return pa.table({"bit": pa.array(bits)})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    dedup = parts.groupby("bit").aggregate(Count(alias_name="__n"))
    return dedup.map_batches(lambda b: b.select(["bit"]),
                             batch_format="pyarrow").sort("bit")


def bloom_bitmask(bits) -> np.ndarray:
    """Dense boolean mask (length M) from a (bit,) frame/Dataset —
    the broadcastable probe-side representation (512 bytes)."""
    arr = bits["bit"].to_numpy() if hasattr(bits, "columns") else np.asarray(bits)
    mask = np.zeros(_BLOOM_M, dtype=bool)
    mask[arr.astype(np.int64)] = True
    return mask


def bloom_probe(ds, mask: np.ndarray, text_col: str = "text",
                id_col: str = "doc_id"):
    """Per-doc membership counts against a built filter: (id,
    n_distinct, n_maybe_seen) where n_maybe_seen counts the doc's
    distinct words whose K positions are ALL set.  The mask is 512
    bytes — closure-broadcast, probing is a pure vectorized row pass,
    no shuffle (the Bloom use-case: a cheap pre-filter ahead of exact
    contamination/dedup joins).  Docs with no words are dropped (the
    SQL-twin GROUP BY convention)."""
    m = np.asarray(mask, dtype=bool)

    def probe(batch: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.coalesce(batch[text_col], "")).to_pandas()
        words = txt.str.findall(_WORD_LOWER_RE)
        lens = words.str.len().to_numpy().astype(np.int64)
        keep = lens > 0
        if not keep.any():
            return pa.table({id_col: pa.array([], batch[id_col].type),
                             "n_distinct": pa.array([], pa.int64()),
                             "n_maybe_seen": pa.array([], pa.int64())})
        ids = batch[id_col].to_pandas().to_numpy()
        flat = np.concatenate(
            [np.asarray(w, dtype=object) for w in words if len(w)])
        doc_idx = np.repeat(np.flatnonzero(keep), lens[keep])
        dw = pd.DataFrame({"i": doc_idx, "w": flat}).drop_duplicates()
        uniq, inv = np.unique(dw["w"].to_numpy(dtype=object),
                              return_inverse=True)
        hit_u = m[_md5_positions(uniq, _BLOOM_K, _BLOOM_M)].all(axis=1)
        hits = hit_u[inv]
        n_distinct = np.bincount(dw["i"].to_numpy(), minlength=len(batch))
        n_seen = np.bincount(dw["i"].to_numpy(), weights=hits,
                             minlength=len(batch))
        return pa.table({
            id_col: pa.array(ids[keep]),
            "n_distinct": pa.array(n_distinct[keep].astype(np.int64)),
            "n_maybe_seen": pa.array(n_seen[keep].astype(np.int64)),
        })

    return ds.map_batches(probe, batch_format="pyarrow")


def cms_estimate(registers: pd.DataFrame, words) -> pd.DataFrame:
    """Point estimates from a merged (d, j, c) frame: min over the D
    rows — an upper bound on the true count with standard CM error
    (eps ~ e/W of the stream length, delta ~ e^-D)."""
    mat = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    mat[registers["d"].to_numpy(), registers["j"].to_numpy()] = (
        registers["c"].to_numpy())
    words = list(words)
    cols = _cms_cols(np.asarray(words, dtype=object))
    est = mat[np.arange(_CMS_D)[None, :], cols].min(axis=1)
    return pd.DataFrame({"word": words, "estimate": est.astype(np.int64)})
