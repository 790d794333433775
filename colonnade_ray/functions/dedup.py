"""Deduplication operators for training-data pipelines (brief-mandated,
first-class alongside SURVEY.md §2): exact, MinHash+LSH, SimHash,
n-gram Jaccard verification.

Design per the Ray guide: shingle+minhash per batch (vectorized) ->
explode to (band, band_hash, doc_id) rows -> groupby on the band key
(the one shuffle) -> candidate pairs -> exact-Jaccard verify.  The
"distinct" semantics graft the reference's dictionary-building role
(SURVEY.md §2.7 set-ops row: dedup is dictionary building over rows).
All hashes are SipHash/affine-perm based with fixed seeds —
deterministic across processes and retries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import fingerprint_batch

_MERSENNE = np.uint64((1 << 61) - 1)
_GRAM_FOLD = np.uint64(1099511628211)          # FNV prime, gram/band fold
_EMPTY_SIG = np.uint64(0xFFFFFFFFFFFFFFFF)     # signature of an empty doc


def _mod_m61(x: np.ndarray) -> np.ndarray:
    """Reduce uint64 values (< 2^63) mod the Mersenne prime 2^61-1."""
    x = (x & _MERSENNE) + (x >> np.uint64(61))
    x = (x & _MERSENNE) + (x >> np.uint64(61))
    return np.where(x >= _MERSENNE, x - _MERSENNE, x)


def _mulmod_m61(a: np.ndarray, x: np.ndarray) -> np.ndarray:
    """a*x mod 2^61-1 for a, x < 2^61, fully vectorized in uint64.

    32-bit split: a*x = A*2^64 + B*2^32 + C with A = a_hi*x_hi,
    B = a_hi*x_lo + a_lo*x_hi, C = a_lo*x_lo.  With p = 2^61-1:
    2^64 === 8 (mod p), and B*2^32 = B_hi*2^61 + B_lo*2^32 ===
    B_hi + B_lo*2^32 after splitting B at bit 29.  Every partial term
    stays < 2^63, so the sum fits uint64 before the final fold.
    This is the exact universal family (ax+b mod p) — the round-1
    version wrapped mod 2^64 BEFORE reducing, which broke min-wise
    independence (round-2 ADVICE fix; signatures changed vs round 1).
    """
    m32 = np.uint64(0xFFFFFFFF)
    a_hi, a_lo = a >> np.uint64(32), a & m32
    x_hi, x_lo = x >> np.uint64(32), x & m32
    with np.errstate(over="ignore"):
        A = a_hi * x_hi                       # < 2^58
        B = a_hi * x_lo + a_lo * x_hi         # < 2^62
        C = a_lo * x_lo                       # < 2^64
        B_hi, B_lo = B >> np.uint64(29), B & np.uint64((1 << 29) - 1)
        C_red = (C & _MERSENNE) + (C >> np.uint64(61))
        s = A * np.uint64(8) + B_hi + (B_lo << np.uint64(32)) + C_red
    return _mod_m61(s)


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum id per distinct text (hash-partitioned).

    hash -> groupby(fingerprint).aggregate(Min(id)) : the shuffle moves
    one fingerprint row per doc, never the text payloads.
    """
    from .bucketing import bucketed_group_apply

    fp = ds.map_batches(
        lambda b: fingerprint_batch(b, text_col).select([id_col, "fingerprint"]),
        batch_format="pyarrow",
    )
    # bucketed min-per-fingerprint: one vectorized pandas groupby per
    # bucket instead of one Ray aggregate group per distinct text
    out = bucketed_group_apply(
        fp, "fingerprint",
        lambda g: g.groupby("fingerprint", as_index=False, sort=False)[id_col].min(),
    )
    return out.map_batches(lambda df: df[[id_col]], batch_format="pandas")


# ---------------------------------------------------------------------------
# Shingles + MinHash


def _md5_word_hashes(flat: np.ndarray) -> np.ndarray:
    """uint64 word hash = first 8 bytes (big-endian) of md5(word) —
    bit-identical to DuckDB's ('0x' || substr(md5(w),1,16))::UBIGINT,
    which makes hash-based pipelines (SimHash) SQL-cross-checkable.
    One md5 per DISTINCT word (O(vocab) Python), vectorized gather back
    to occurrences."""
    import hashlib

    uniq, inv = np.unique(flat.astype("U"), return_inverse=True)
    uh = np.fromiter(
        (
            int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            for w in uniq
        ),
        dtype=np.uint64,
        count=uniq.size,
    )
    return uh[inv]


def _flat_words(texts: pd.Series, hash_fn: str = "pandas") -> tuple:
    """Whole-batch word explode: (flat word hashes uint64, words-per-doc).

    One pandas explode + one hash_array pass for the entire batch — no
    per-doc Python (the HashTokenizer flat-explode pattern,
    functions/text.py).  ``hash_fn="md5"`` selects the SQL-reproducible
    word hash (see _md5_word_hashes) at the cost of one md5 per
    distinct word; the default stays the fast vectorized hash."""
    words = texts.fillna("").str.split()
    lens = words.str.len().to_numpy().astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, np.uint64), lens
    flat = words.explode().to_numpy(dtype=object)
    if flat.size != total:  # empty docs each contribute one NaN slot
        flat = flat[~pd.isna(flat)]
    if hash_fn == "md5":
        return _md5_word_hashes(flat), lens
    h = pd.util.hash_array(np.ascontiguousarray(flat), categorize=False)
    return h.astype(np.uint64), lens


def _flat_shingles(texts: pd.Series, k: int = 5, hash_fn: str = "pandas") -> tuple:
    """Whole-batch word-k-gram hashes: (flat gram hashes, grams-per-doc).

    Gram hash = polynomial fold (mod 2^64) of the k word hashes — a
    rolling polynomial over the flat word-hash array instead of
    re-joining/hashing gram strings per doc.  Docs with 0 < words < k
    get one gram folding all their words (the round-1 "join everything"
    semantics, re-expressed on hashes).  With ``hash_fn="md5"`` the
    whole gram hash becomes SQL-reproducible: md5 word hashes folded by
    the same FNV prime mod 2^64 (DuckDB HUGEINT arithmetic)."""
    h, lens = _flat_words(texts, hash_fn)
    s = np.concatenate(([0], np.cumsum(lens)))[:-1]
    g = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    goff = np.concatenate(([0], np.cumsum(g)))[:-1]
    out = np.zeros(int(g.sum()), np.uint64)
    big = lens >= k
    if big.any():
        gc = lens[big] - k + 1
        within = np.arange(int(gc.sum())) - np.repeat(
            np.concatenate(([0], np.cumsum(gc)))[:-1], gc
        )
        idx = np.repeat(s[big], gc) + within
        acc = np.zeros(idx.size, np.uint64)
        with np.errstate(over="ignore"):
            for j in range(k):
                acc = acc * _GRAM_FOLD + h[idx + j]
        out[np.repeat(goff[big], gc) + within] = acc
    for d in np.flatnonzero((lens > 0) & (lens < k)):  # rare short docs
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for v in h[s[d] : s[d] + lens[d]]:
                acc = acc * _GRAM_FOLD + v
        out[goff[d]] = acc
    return out, g


def _word_shingle_hashes(texts: pd.Series, k: int = 5) -> list:
    """Per doc: sorted-unique uint64 shingle hashes (set semantics for
    Jaccard verification)."""
    flat, g = _flat_shingles(texts, k)
    goff = np.concatenate(([0], np.cumsum(g)))
    return [np.unique(flat[goff[i] : goff[i + 1]]) for i in range(g.size)]


def _minhash_perms(n_perm: int, seed: int = 7) -> tuple:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x+b) mod Mersenne61 in the exact ring, min per permutation —
    uint64[n_perm].  Single-doc form; batch form is _batch_signatures."""
    if shingle_hashes.size == 0:
        return np.full(a.size, _EMPTY_SIG)
    x = (shingle_hashes % _MERSENNE).astype(np.uint64)
    v = _mod_m61(_mulmod_m61(a[:, None], x[None, :]) + b[:, None])
    return v.min(axis=1)


_GRAM_BLOCK = 1024  # grams per inner block: (n_perm, 1024) u64 scratch
                    # buffers stay L2-resident, so the 18-pass ring
                    # arithmetic is compute- not memory-bound


def _minhash_ring_block(a_hi, a_lo, bb, x, t1, t2, t3):
    """(a*x+b) mod 2^61-1 into t1, minimal temporaries (in-place ring
    arithmetic; see _mulmod_m61 for the 32-bit-split derivation)."""
    u = np.uint64
    x_hi, x_lo = x >> u(32), x & u(0xFFFFFFFF)
    with np.errstate(over="ignore"):
        np.multiply(a_hi, x_hi, out=t1)            # A
        np.multiply(t1, u(8), out=t1)              # A*8 (2^64 === 8)
        np.multiply(a_hi, x_lo, out=t2)
        np.multiply(a_lo, x_hi, out=t3)
        np.add(t2, t3, out=t2)                     # B < 2^62
        np.right_shift(t2, u(29), out=t3)          # B_hi
        np.add(t1, t3, out=t1)
        np.bitwise_and(t2, u((1 << 29) - 1), out=t2)
        np.left_shift(t2, u(32), out=t2)           # B_lo * 2^32
        np.add(t1, t2, out=t1)
        np.multiply(a_lo, x_lo, out=t2)            # C
        np.bitwise_and(t2, _MERSENNE, out=t3)
        np.right_shift(t2, u(61), out=t2)
        np.add(t2, t3, out=t2)                     # C folded
        np.add(t1, t2, out=t1)                     # s < 2^62.6
        np.add(t1, bb, out=t1)                     # + b, still < 2^63
        for _ in range(2):                         # fold mod 2^61-1
            np.right_shift(t1, u(61), out=t2)
            np.bitwise_and(t1, _MERSENNE, out=t1)
            np.add(t1, t2, out=t1)
        t1[t1 >= _MERSENNE] -= _MERSENNE
    return t1


def _batch_signatures(texts: pd.Series, a: np.ndarray, b: np.ndarray,
                      k: int = 5) -> np.ndarray:
    """MinHash signatures for a whole batch: (n_docs, n_perm) uint64.

    Grams are NOT dedup'd per doc (min is idempotent over repeats);
    per-doc mins come from minimum.reduceat over doc-aligned gram
    blocks — no per-doc Python at all."""
    grams, g = _flat_shingles(texts, k)
    n_docs, P = g.size, a.size
    sig = np.full((n_docs, P), _EMPTY_SIG, np.uint64)
    nz = g > 0
    if not nz.any():
        return sig
    x = grams % _MERSENNE
    goff = np.concatenate(([0], np.cumsum(g)))
    nz_idx = np.flatnonzero(nz)
    starts = goff[:-1][nz]
    a_hi, a_lo = (a >> np.uint64(32))[:, None], (a & np.uint64(0xFFFFFFFF))[:, None]
    bb = b[:, None]
    t1 = np.empty((P, _GRAM_BLOCK), np.uint64)
    t2 = np.empty_like(t1)
    t3 = np.empty_like(t1)
    # doc-aligned blocks of ~_GRAM_BLOCK grams
    d0 = 0
    while d0 < nz_idx.size:
        d1 = d0 + 1
        lo = starts[d0]
        while d1 < nz_idx.size and starts[d1] - lo < _GRAM_BLOCK:
            d1 += 1
        hi = goff[nz_idx[d1 - 1] + 1]
        nb = int(hi - lo)
        if nb > t1.shape[1]:  # one giant doc overflows the scratch
            u1, u2, u3 = (np.empty((P, nb), np.uint64) for _ in range(3))
        else:
            u1, u2, u3 = t1[:, :nb], t2[:, :nb], t3[:, :nb]
        v = _minhash_ring_block(a_hi, a_lo, bb, x[lo:hi], u1, u2, u3)
        mins = np.minimum.reduceat(v, starts[d0:d1] - lo, axis=1)
        sig[nz_idx[d0:d1]] = mins.T
        d0 = d1
    return sig


def _batch_signatures_oph(texts: pd.Series, n_perm: int, k: int = 5) -> np.ndarray:
    """One-permutation hashing (Li/Owen/Zhang, NIPS 2012) with rotation
    densification (Shrivastava/Li, ICML 2014): ONE hash per gram; the
    sketch cell for bin j is the min gram hash among grams whose top
    log2(n_perm) bits equal j; empty bins borrow cyclically from the
    next non-empty bin.  O(grams) work instead of O(grams * n_perm) —
    the 100-TB default (the exact-permutation family stays available
    as mode="perm").  n_perm must be a power of two."""
    if n_perm & (n_perm - 1):
        raise ValueError("OPH n_perm must be a power of two")
    grams, g = _flat_shingles(texts, k)
    n = g.size
    sig = np.full((n, n_perm), _EMPTY_SIG, np.uint64)
    if grams.size:
        b_bits = n_perm.bit_length() - 1
        bins = (grams >> np.uint64(64 - b_bits)).astype(np.int64)
        doc = np.repeat(np.arange(n, dtype=np.int64), g)
        keys = doc * n_perm + bins
        order = np.argsort(keys, kind="stable")
        sk, sv = keys[order], grams[order]
        starts = np.concatenate(([0], np.flatnonzero(np.diff(sk)) + 1))
        sig.reshape(-1)[sk[starts]] = np.minimum.reduceat(sv, starts)
    valid = sig != _EMPTY_SIG
    any_valid = valid.any(axis=1)
    if any_valid.any():
        # vectorized cyclic forward-borrow: index of the next valid
        # cell >= j over the doubled row, then wrap
        ext = np.concatenate([valid, valid], axis=1)
        idx = np.where(ext, np.arange(2 * n_perm)[None, :], 2 * n_perm)
        nxt = np.minimum.accumulate(idx[:, ::-1], axis=1)[:, ::-1]
        fill = nxt[:, :n_perm] % n_perm
        fill[~any_valid] = 0
        sig = sig[np.arange(n)[:, None], fill]
        sig[~any_valid] = _EMPTY_SIG
    return sig


class MinHashBands:
    """map_batches callable: text -> exploded (band, band_hash, doc_id)
    rows.  n_perm = bands * rows_per_band; docs sharing any band bucket
    are near-dup candidates (LSH).  mode="oph" (default) sketches with
    one-permutation hashing; mode="perm" uses bands*rows_per_band exact
    Mersenne-ring permutations."""

    def __init__(self, text_col="text", id_col="doc_id", bands=16, rows_per_band=4,
                 shingle_k=5, seed=7, mode="oph"):
        self.text_col, self.id_col = text_col, id_col
        self.bands, self.rpb = bands, rows_per_band
        self.k = shingle_k
        self.mode = mode
        self.a, self.b = _minhash_perms(bands * rows_per_band, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas()
        if self.mode == "oph":
            sig = _batch_signatures_oph(texts, self.bands * self.rpb, self.k)
        else:
            sig = _batch_signatures(texts, self.a, self.b, self.k)  # (n, P)
        n = sig.shape[0]
        sig3 = sig.reshape(n, self.bands, self.rpb)
        # exact polynomial fold of the rows_per_band minhashes —
        # equal band <-> equal key (mod 2^64 collisions only)
        with np.errstate(over="ignore"):
            key = sig3[:, :, 0].copy()
            for j in range(1, self.rpb):
                key = key * _GRAM_FOLD + sig3[:, :, j]
        ids = batch[self.id_col].take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), self.bands))
        )
        return pa.table(
            {
                "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
                "band_hash": pa.array(key.view(np.int64).reshape(-1)),
                self.id_col: ids,
            }
        )


def _pairs_from_group(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = np.unique(g[id_col].to_numpy())
    if ids.size < 2:
        return pd.DataFrame({"id_a": [], "id_b": []}).astype({"id_a": ids.dtype, "id_b": ids.dtype})
    ia, ib = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def _pairs_from_bucket(g: pd.DataFrame, id_col: str,
                       keys=("band", "band_hash"),
                       max_band_group: Optional[int] = None) -> pd.DataFrame:
    """Candidate pairs for a whole BUCKET of band groups: one
    vectorized self-merge on the band key, ordered + locally deduped.

    ``max_band_group``: hot-bucket guard (the band-key analog of
    jaccard_pairs_exact's stop-gram cap) — a band group of s docs
    emits s(s-1)/2 pairs, so one boilerplate cluster of 1M docs would
    emit 5e11 candidate rows.  Groups larger than the cap switch to a
    STAR pattern (every member pairs with the group's min id, s-1
    rows): pair-level recall inside the hot group drops, but group
    CONNECTIVITY is preserved, so dup-group resolution
    (connected components) still recovers the full cluster."""
    keys = list(keys)
    if max_band_group is not None and len(g):
        sizes = g.groupby(keys, sort=False)[id_col].transform("size")
        hot = sizes > max_band_group
        if hot.any():
            h = g[hot]
            rep = h.groupby(keys, sort=False)[id_col].transform("min")
            star = pd.DataFrame({"id_a": rep, "id_b": h[id_col].to_numpy()})
            star = star[star["id_a"] < star["id_b"]].drop_duplicates()
            g = g[~hot]
            cold = _pairs_from_bucket(g, id_col, keys, None)
            return pd.concat([cold, star], ignore_index=True)
    m = g.merge(g, on=keys)
    m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
    out = m.rename(columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b"})
    return out[["id_a", "id_b"]].drop_duplicates()


_PAIR_BUCKETS = 64


def _with_pair_bucket(df: pd.DataFrame, num_buckets: int) -> pd.DataFrame:
    h = pd.util.hash_pandas_object(df[["id_a", "id_b"]], index=False)
    return df.assign(__b=(h.to_numpy() % np.uint64(num_buckets)).astype(np.int64))


def distinct_pairs(pairs_ds, num_buckets: int = _PAIR_BUCKETS):
    """Distinct (id_a, id_b) rows: per-batch drop_duplicates, then one
    shuffle on a HASH BUCKET of the pair key and a vectorized
    drop_duplicates per bucket.  Replaces both the round-1
    groupby(pair).map_groups(head(1)) AND a naive
    groupby(pair).aggregate(Count): Ray's sort aggregate pays
    per-group overhead, which at millions of 1-row pair groups
    dominates wall time (measured ~60 s for 2M rows / 250k groups on
    8 cpus vs ~2 s for 64 bucket groups)."""
    local = pairs_ds.map_batches(
        lambda df: _with_pair_bucket(df.drop_duplicates(["id_a", "id_b"]), num_buckets)
        if len(df) else df.assign(__b=pd.Series([], dtype=np.int64)),
        batch_format="pandas",
    )
    return local.groupby("__b").map_groups(
        lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns="__b"),
        batch_format="pandas",
    )


def pair_counts(pairs_ds, out_col: str = "inter", num_buckets: int = _PAIR_BUCKETS):
    """(id_a, id_b, count) over duplicate pair rows — bucketed like
    distinct_pairs, pandas groupby-size inside each bucket."""
    local = pairs_ds.map_batches(
        lambda df: _with_pair_bucket(df, num_buckets) if len(df)
        else df.assign(__b=pd.Series([], dtype=np.int64)),
        batch_format="pandas",
    )

    def count_group(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["id_a", "id_b"], as_index=False).size()
        return out.rename(columns={"size": out_col})

    return local.groupby("__b").map_groups(count_group, batch_format="pandas")


def minhash_candidates(ds, text_col="text", id_col="doc_id", bands=16, rows_per_band=4,
                       shingle_k=5, concurrency=None, mode="oph",
                       max_band_group: Optional[int] = None,
                       distinct: bool = True):
    """LSH candidate pairs (id_a < id_b), deduplicated.

    ``max_band_group``: star-pattern cap for hot band buckets (see
    _pairs_from_bucket) — bounds a size-s group's emission at s-1 rows
    instead of s(s-1)/2 while keeping the group connected.  ``None``
    (default) keeps exact all-pairs candidates, which the sf oracles
    check.  ``distinct=False`` skips the final cross-band dedup
    exchange for callers that fuse it into their own next keyed
    shuffle."""
    from ..util import default_concurrency

    conc = concurrency or (1, default_concurrency())
    from .bucketing import bucketed_group_apply

    exploded = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, bands=bands, rows_per_band=rows_per_band,
            shingle_k=shingle_k, mode=mode,
        ),
        batch_format="pyarrow",
        concurrency=conc,
    )
    # bucketed band-key shuffle + vectorized per-bucket self-merge:
    # emits each co-bucketed pair once per band, deduped locally
    pairs = bucketed_group_apply(
        exploded, ["band", "band_hash"],
        lambda g: _pairs_from_bucket(g, id_col, max_band_group=max_band_group),
    )
    if not distinct:
        # caller will dedup inside its own next keyed exchange
        # (keyed_attach(dedup_on=...)) — skip the standalone barrier
        return pairs
    # a pair can surface from several bands — dedup
    return distinct_pairs(pairs)


class JaccardVerify:
    """Verify candidate pairs against exact n-gram Jaccard.

    Broadcast pattern (no shuffle): the texts of candidate docs are
    fetched once per actor from a ray.put handle, then each pair is
    verified vectorized."""

    def __init__(self, texts_ref, shingle_k=5, threshold=0.7):
        import ray

        self.texts = ray.get(texts_ref)  # dict id -> text, once per actor
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_ids = batch["id_a"].to_pylist()
        b_ids = batch["id_b"].to_pylist()
        keep_a, keep_b, jac = [], [], []
        cache: dict = {}

        def sh(i):
            if i not in cache:
                cache[i] = set(
                    _word_shingle_hashes(pd.Series([self.texts.get(i, "")]), self.k)[0].tolist()
                )
            return cache[i]

        for x, y in zip(a_ids, b_ids):
            sa, sb = sh(x), sh(y)
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            if j >= self.threshold:
                keep_a.append(x)
                keep_b.append(y)
                jac.append(j)
        return pa.table(
            {
                "id_a": pa.array(keep_a, batch["id_a"].type),
                "id_b": pa.array(keep_b, batch["id_b"].type),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )


class JaccardVerifyTexts:
    """Verify candidate pairs that carry their own text_a/text_b
    columns (the join path): batch-vectorized shingling, per-pair set
    intersection over precomputed sorted-unique hash arrays."""

    def __init__(self, shingle_k=5, threshold=0.7):
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        sa = _word_shingle_hashes(batch["text_a"].to_pandas(), self.k)
        sb = _word_shingle_hashes(batch["text_b"].to_pandas(), self.k)
        jac = np.empty(len(batch), np.float64)
        for i in range(len(batch)):
            inter = np.intersect1d(sa[i], sb[i], assume_unique=True).size
            u = sa[i].size + sb[i].size - inter
            jac[i] = (inter / u) if u else 1.0
        keep = jac >= self.threshold
        out = batch.select(["id_a", "id_b"]).filter(pa.array(keep))
        return out.append_column("jaccard", pa.array(jac[keep]))


def near_dup_pairs(ds, texts_ref=None, text_col="text", id_col="doc_id",
                   threshold=0.7, bands=16, rows_per_band=4, shingle_k=5,
                   mode="oph"):
    """MinHash-LSH candidates -> exact Jaccard verification.

    Default path is scale-safe: candidate ids are hash-joined back to
    the (id, text) table twice (id_a, then id_b) and verified per
    batch — candidate rows, never the corpus, are what shuffles, and
    nothing materializes on the driver (round-1 What's-wrong #3 fix).
    The cross-band candidate dedup is fused into the first hash join
    (keyed_attach ``dedup_on``): every copy of an (id_a, id_b) pair
    lands in id_a's bucket, so the per-bucket drop_duplicates is
    global and one whole exchange barrier disappears.
    ``texts_ref=ray.put({id: text})`` selects the explicit broadcast
    path for small corpora instead."""
    from ..util import default_concurrency

    if texts_ref is not None:
        cands = minhash_candidates(ds, text_col, id_col, bands, rows_per_band,
                                   shingle_k, mode=mode)
        return cands.map_batches(
            JaccardVerify,
            fn_constructor_kwargs=dict(texts_ref=texts_ref, shingle_k=shingle_k,
                                       threshold=threshold),
            batch_format="pyarrow",
            concurrency=(1, default_concurrency()),
        )
    from .relational import keyed_attach

    cands = minhash_candidates(ds, text_col, id_col, bands, rows_per_band,
                               shingle_k, mode=mode, distinct=False)
    docs = ds.select_columns([id_col, text_col])
    id_type = docs.schema().base_schema.field(id_col).type
    ids = [("id_a", id_type), ("id_b", id_type)]
    with_a = keyed_attach(cands, docs, "id_a", "text_a", ids,
                          id_col=id_col, text_col=text_col,
                          dedup_on=["id_a", "id_b"])
    with_ab = keyed_attach(with_a, docs, "id_b", "text_b",
                           ids + [("text_a", pa.string())],
                           id_col=id_col, text_col=text_col)
    return with_ab.map_batches(
        JaccardVerifyTexts,
        fn_constructor_kwargs=dict(shingle_k=shingle_k, threshold=threshold),
        batch_format="pyarrow",
        concurrency=(1, default_concurrency()),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (rolling-hash document fingerprinting)


class WinnowFingerprint:
    """Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    SIGMOD 2003 — the MOSS algorithm): word-k-gram rolling hashes, then
    the RIGHTMOST minimum hash of every window of ``w`` consecutive
    grams is selected; per-doc distinct selected hashes are the
    fingerprint set.

    Guarantee: any shared run of >= w + k - 1 words between two
    documents yields at least one shared fingerprint, at storage
    density ~2/(w+1) of the gram count — the rolling-hash fingerprint
    the brief mandates (whole-doc SipHash in ``fingerprint_batch`` is
    the exact-dup key; this is the partial-overlap key).

    Fully vectorized: one sliding_window_view argmin over the flat
    batch gram array (windows crossing doc boundaries masked via the
    gram->doc map); docs with fewer than w grams contribute their
    single overall min (reduceat).  No per-doc Python.
    """

    def __init__(self, text_col="text", id_col="doc_id", k: int = 5, w: int = 4,
                 hash_fn: str = "pandas"):
        self.text_col, self.id_col = text_col, id_col
        self.k, self.w = k, w
        self.hash_fn = hash_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, g = _flat_shingles(batch[self.text_col].to_pandas(), self.k,
                                  self.hash_fn)
        n, w = g.size, self.w
        doc_of = np.repeat(np.arange(n, dtype=np.int64), g)
        sel_pos = []
        if grams.size >= w:
            swv = np.lib.stride_tricks.sliding_window_view(grams, w)
            # rightmost min (robust winnowing): argmin over reversed cols
            right_am = w - 1 - np.argmin(swv[:, ::-1], axis=1)
            valid = doc_of[: grams.size - w + 1] == doc_of[w - 1 :]
            p = np.flatnonzero(valid)
            sel_pos.append(p + right_am[p])
        # docs with 0 < m < w: single overall min
        short = (g > 0) & (g < w)
        if short.any():
            starts = np.concatenate(([0], np.cumsum(g)))[:-1][short]
            # argmin within each short doc via reduceat on a keyed array
            for s, m in zip(starts, g[short]):  # rare rows only
                sel_pos.append(np.array([s + np.argmin(grams[s : s + m])]))
        if sel_pos:
            pos = np.unique(np.concatenate(sel_pos))
            d, hsh = doc_of[pos], grams[pos]
            # distinct hash per doc
            order = np.lexsort((hsh, d))
            d, hsh = d[order], hsh[order]
            keep = np.ones(d.size, bool)
            if d.size > 1:
                keep[1:] = (d[1:] != d[:-1]) | (hsh[1:] != hsh[:-1])
            d, hsh = d[keep], hsh[keep]
        else:
            d = np.zeros(0, np.int64)
            hsh = np.zeros(0, np.uint64)
        counts = np.bincount(d, minlength=n).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        fps = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(hsh.view(np.int64))
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "fingerprints": fps,
                "n_fp": pa.array(counts),
                "n_grams": pa.array(g.astype(np.int64)),
            }
        )


def winnow_fingerprints(ds, text_col="text", id_col="doc_id", k: int = 5,
                        w: int = 4, concurrency=None, hash_fn: str = "pandas"):
    """(doc_id, fingerprints:list<int64>, n_fp, n_grams) per doc."""
    from ..util import default_concurrency

    return ds.map_batches(
        WinnowFingerprint,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col, k=k, w=w,
                                   hash_fn=hash_fn),
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )


def winnow_overlap_pairs(ds, min_shared: int = 2, text_col="text",
                         id_col="doc_id", k: int = 5, w: int = 4,
                         hash_fn: str = "pandas"):
    """Partial-overlap candidate pairs: docs sharing >= min_shared
    winnowing fingerprints (plagiarism / near-dup detection for
    LONG-substring overlap, complementary to whole-doc Jaccard).

    Shape: fingerprint explode -> bucketed self-merge -> bucketed pair
    counts (the jaccard_pairs_exact exchange; only fingerprint rows
    ever shuffle, ~2/(w+1) of gram volume)."""
    from .bucketing import bucketed_group_apply

    fps = winnow_fingerprints(ds, text_col, id_col, k=k, w=w, hash_fn=hash_fn)

    def explode(b: pa.Table) -> pa.Table:
        arr = b["fingerprints"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b[id_col].take(pa.array(np.repeat(np.arange(len(b)), lens)))
        return pa.table({"fp": arr.flatten(), id_col: ids})

    exploded = fps.map_batches(explode, batch_format="pyarrow")
    bucketed = exploded.map_batches(
        lambda df: df.assign(
            __b=(df["fp"].to_numpy().view(np.uint64) % np.uint64(_PAIR_BUCKETS)
                 ).astype(np.int64)
        ) if len(df) else df.assign(__b=pd.Series([], dtype=np.int64)),
        batch_format="pandas",
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="fp")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return m.rename(columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b"})[
            ["id_a", "id_b"]
        ]

    pair_rows = bucketed.groupby("__b").map_groups(pairs_in_bucket,
                                                   batch_format="pandas")
    shared = pair_counts(pair_rows, out_col="n_shared")
    return shared.map_batches(
        lambda df: df[df["n_shared"] >= min_shared],
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHash:
    """64-bit SimHash per doc over word hashes (near-dup fingerprint;
    hamming-ball lookup is the scale path)."""

    def __init__(self, text_col="text", id_col="doc_id", hash_fn="pandas"):
        self.text_col, self.id_col, self.hash_fn = text_col, id_col, hash_fn

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas()
        h, lens = _flat_words(texts, self.hash_fn)
        out = np.zeros(lens.size, dtype=np.uint64)
        nz = lens > 0
        if h.size:
            # term-frequency weighted (standard SimHash): every word
            # occurrence votes +-1 per bit of its hash; summing bit
            # matrices over occurrences == summing tf * (2*bit - 1)
            # over distinct terms.  One unpackbits + one reduceat for
            # the whole batch — no per-doc Python (round-1 hot loop).
            bits = np.unpackbits(
                h[:, None].view(np.uint8), axis=1, bitorder="little"
            ).astype(np.int64)                                   # (total, 64)
            starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nz]
            sums = np.add.reduceat(bits, starts, axis=0)         # (n_nz, 64)
            votes = 2 * sums - lens[nz][:, None]
            out[nz] = np.packbits(
                (votes > 0).astype(np.uint8), axis=1, bitorder="little"
            ).view(np.uint64).reshape(-1)
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(out.view(np.int64)),
            }
        )


def simhash_signatures(ds, text_col="text", id_col="doc_id", concurrency=None,
                       hash_fn="pandas"):
    from ..util import default_concurrency

    return ds.map_batches(
        SimHash,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   hash_fn=hash_fn),
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )


# ---------------------------------------------------------------------------
# Duplicate-group resolution (connected components over dup pairs)


def dup_groups(pairs_ds, driver_threshold: int = 200_000, max_iters: int = 50):
    """Connected components over near-dup pairs -> (doc_id, group_id)
    with group_id = min doc id of the component.

    The candidate-pair set is orders of magnitude smaller than the
    corpus (only docs that shared an LSH bucket), so up to
    ``driver_threshold`` pairs it is pulled once to the driver and
    resolved with union-find; above that, iterated distributed
    min-label propagation (one groupby-min per round, diameter-bounded)
    computes the same components without any driver materialization.
    """
    import ray.data as rd

    # Pin the pair set once: it is consumed 2-3x below (count, then
    # take_all or every propagation round) and lazily it would re-run
    # the WHOLE upstream LSH+verify pipeline per consumer (measured
    # 44 s -> 26 s on the sf0.1 dedup_keep chain).  Candidate pairs
    # are orders smaller than the corpus, so the object-store pin is
    # bounded by construction.
    pairs_ds = pairs_ds.materialize()

    if pairs_ds.count() > driver_threshold:
        return _dup_groups_distributed(pairs_ds, max_iters)

    edges = pairs_ds.take_all()  # small: candidates only
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges:
        a, b = r["id_a"], r["id_b"]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min id so group_id is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [{"doc_id": k, "group_id": find(k)} for k in sorted(parent)]
    if not rows:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "group_id": pa.array([], pa.int64())})
        )
    return rd.from_items(rows)


def dup_gram_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                   k: int = 5, hash_fn: str = "pandas", num_buckets: int = 64):
    """Per-doc duplicated-k-gram statistics — the counting core of
    span-level dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", public literature): for every doc,
    how many of its k-gram positions carry a gram that occurs MORE
    THAN ONCE in the whole corpus (cross-doc or self-repetition).
    The n_dup_grams / n_grams ratio is the standard drop/trim signal.

    Scale shape: one explode to (doc_id, gram_hash) position rows,
    ONE bucketed exchange keyed by gram hash (all occurrences of a
    gram co-locate, so bucket-local totals are global totals), then a
    tiny per-doc partial-sum groupby.  ``hash_fn="md5"`` selects the
    SQL-twin gram hash (see _flat_shingles)."""
    from ray.data.aggregate import Sum

    from .bucketing import bucketed_group_apply

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        gh, g = _flat_shingles(texts, k, hash_fn)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: pa.array(np.repeat(ids, g)),
            "gh": pa.array(gh.view(np.int64)),
        })

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("gh", sort=False)["gh"].transform("size")
        agg = (
            g.assign(dup=(tot > 1).to_numpy().astype(np.int64))
            .groupby(id_col, sort=False)
            .agg(n_dup_grams=("dup", "sum"), n_grams=("dup", "size"))
            .reset_index()
        )
        return agg

    parts = bucketed_group_apply(rows, "gh", per_bucket,
                                 num_buckets=num_buckets)
    return parts.groupby(id_col).aggregate(
        Sum("n_dup_grams", alias_name="n_dup_grams"),
        Sum("n_grams", alias_name="n_grams"),
    )


def dedup_keep(ds, pairs_ds, id_col: str = "doc_id", carry=None):
    """The deduplicated corpus: every doc that is either in no
    near-dup component or is its component's canonical representative
    (min id) — i.e. what a user actually keeps after
    ``near_dup_pairs`` (reference analog: the keep side of
    ``Colonnade.Encode`` row filtering, colonnade/src/Colonnade.hs
    discard/mask combinators, re-expressed as a corpus operator).

    Scale shape: the drop set is (doc_id) rows only and flows through
    ONE bucketed anti-join exchange with the corpus — no broadcast, no
    driver materialization, valid even when half the corpus is
    duplicates."""
    import pyarrow.compute as pc

    from .relational import keyed_antijoin

    groups = dup_groups(pairs_ds)
    drop = groups.map_batches(
        lambda b: b.filter(pc.not_equal(b["doc_id"], b["group_id"])),
        batch_format="pyarrow",
    )
    drop = drop.select_columns(["doc_id"])
    if id_col != "doc_id":
        drop = drop.rename_columns({"doc_id": id_col})
    return keyed_antijoin(ds, drop, on=id_col, carry=list(carry or []))


def _dup_groups_distributed(pairs_ds, max_iters: int = 50):
    """Iterated min-label propagation: label(v) starts at v, each round
    becomes min(label(v), min over neighbors' labels), one
    groupby-min shuffle per round, until the label multiset digest is
    stable.  Converges in <= component-diameter rounds; near-dup
    components are shallow (clusters of rewrites), so a handful of
    rounds suffices in practice.  Nothing ever lands on the driver."""
    from .bucketing import bucketed_group_apply
    from .relational import field_type, keyed_attach

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["id_a"], df["id_b"]], ignore_index=True),
                "nbr": pd.concat([df["id_b"], df["id_a"]], ignore_index=True),
            }
        )

    def min_label(col_in: str):
        def fn(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", as_index=False, sort=False)[col_in].min()
            return out.rename(columns={col_in: "label"})

        return fn

    edges = pairs_ds.map_batches(both_dirs, batch_format="pandas").materialize()
    labels = (
        bucketed_group_apply(edges, "node", min_label("nbr"))
        .map_batches(
            lambda df: df.assign(label=np.minimum(df["node"], df["label"])),
            batch_format="pandas",
        )
        .materialize()
    )

    def digest_of(lab_ds) -> int:
        def h(df: pd.DataFrame) -> pd.DataFrame:
            v = pd.util.hash_pandas_object(df[["node", "label"]], index=False)
            return pd.DataFrame({"h": [int(v.to_numpy().sum()) & ((1 << 48) - 1)]})

        return int(lab_ds.map_batches(h, batch_format="pandas").sum("h"))

    node_type = field_type(labels, "node")
    prev = digest_of(labels)
    for _ in range(max_iters):
        # deliver each neighbor's label to the node: keyed_attach is a
        # hash join expressed as tag-union + groupby (robust to empty
        # hash partitions, see relational.keyed_attach)
        nbr_labels = keyed_attach(
            edges, labels, key_from="nbr", out_col="label",
            carry=[("node", node_type)], id_col="node", text_col="label",
        )
        labels = bucketed_group_apply(
            labels.union(nbr_labels), "node", min_label("label")
        ).materialize()
        cur = digest_of(labels)
        if cur == prev:
            break
        prev = cur
    return labels.map_batches(
        lambda df: df.rename(columns={"node": "doc_id", "label": "group_id"}),
        batch_format="pandas",
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard pairs (no LSH): the DuckDB-checkable truth set


class DistinctShingleExplode:
    """map_batches callable: documents -> distinct (shingle, doc_id)
    rows plus a per-doc distinct-shingle count (carried on a side
    table via union tag).  Fully vectorized: one lexsort over the flat
    gram array per batch."""

    def __init__(self, text_col="text", id_col="doc_id", shingle_k=5):
        self.text_col, self.id_col, self.k = text_col, id_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, g = _flat_shingles(batch[self.text_col].to_pandas(), self.k)
        n = len(batch)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), g)
        order = np.lexsort((grams, doc_rep))
        gs, dr = grams[order], doc_rep[order]
        new = np.ones(gs.size, dtype=bool)
        if gs.size > 1:
            new[1:] = (gs[1:] != gs[:-1]) | (dr[1:] != dr[:-1])
        ids = batch[self.id_col].take(pa.array(dr[new]))
        return pa.table(
            {
                "shingle": pa.array(gs[new].view(np.int64)),
                self.id_col: ids,
            }
        )


class ShingleSetSizes:
    """map_batches callable: documents -> (doc_id, n_shingles) distinct
    shingle-set size per doc."""

    def __init__(self, text_col="text", id_col="doc_id", shingle_k=5):
        self.text_col, self.id_col, self.k = text_col, id_col, shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, g = _flat_shingles(batch[self.text_col].to_pandas(), self.k)
        n = len(batch)
        doc_rep = np.repeat(np.arange(n, dtype=np.int64), g)
        order = np.lexsort((grams, doc_rep))
        gs, dr = grams[order], doc_rep[order]
        new = np.ones(gs.size, dtype=bool)
        if gs.size > 1:
            new[1:] = (gs[1:] != gs[:-1]) | (dr[1:] != dr[:-1])
        sizes = np.bincount(dr[new], minlength=n).astype(np.int64)
        return pa.table({self.id_col: batch[self.id_col],
                         "n_shingles": pa.array(sizes)})


def jaccard_pairs_exact(ds, threshold=0.8, text_col="text", id_col="doc_id",
                        shingle_k=5, max_doc_freq=None):
    """EXACT word-k-gram Jaccard near-dup pairs — no LSH, no driver
    materialization: distinct (shingle, doc) explode -> groupby(shingle)
    pair emission -> one count-aggregate = |A & B| -> attach |A|, |B|
    via keyed_attach -> threshold filter.  The truth set LSH candidates
    are judged against; quadratic in the worst case (every shared
    shingle emits its pair once), intended for oracle checks and
    bounded-similarity corpora.

    ``max_doc_freq``: stop-gram cap (round-2 What's-wrong #5, now code
    not comment) — shingles appearing in more than this many docs are
    dropped BEFORE pair emission, bounding a hot shingle's s(s-1)/2
    blowup at (cap choose 2).  Exact within each bucket because the
    bucket key is the shingle hash: every row of a shingle lands in one
    bucket, so its doc frequency is fully visible there — no extra
    shuffle.  The cap makes results conservative (pairs whose overlap
    rests on boilerplate grams may drop); ``None`` (default) keeps the
    exact semantics the oracle checks."""
    from ..util import default_concurrency
    from .relational import field_type, keyed_attach

    conc = (1, default_concurrency())
    kw = dict(text_col=text_col, id_col=id_col, shingle_k=shingle_k)
    exploded = ds.map_batches(DistinctShingleExplode, fn_constructor_kwargs=kw,
                              batch_format="pyarrow", concurrency=conc)
    # bucket shingles so the shuffle has O(num_buckets) groups and the
    # per-bucket pair emission is one vectorized self-merge — not one
    # Python call per distinct shingle (Ray's per-group overhead at
    # ~1 group per shingle dominates otherwise).  A shingle shared by
    # s docs emits s(s-1)/2 rows; at corpus scale cap stop-grams
    # upstream (drop shingles above a doc-frequency bound) before this.
    bucketed = exploded.map_batches(
        lambda df: df.assign(
            __b=(df["shingle"].to_numpy().view(np.uint64) % np.uint64(_PAIR_BUCKETS)
                 ).astype(np.int64)
        ) if len(df) else df.assign(__b=pd.Series([], dtype=np.int64)),
        batch_format="pandas",
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if max_doc_freq is not None and len(g):
            df_counts = g["shingle"].map(g["shingle"].value_counts())
            g = g[df_counts <= max_doc_freq]
        m = g.merge(g, on="shingle")
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return m.rename(columns={f"{id_col}_x": "id_a", f"{id_col}_y": "id_b"})[
            ["id_a", "id_b"]
        ]

    pair_rows = bucketed.groupby("__b").map_groups(pairs_in_bucket,
                                                   batch_format="pandas")
    inter = pair_counts(pair_rows, out_col="inter")
    sizes = ds.map_batches(ShingleSetSizes, fn_constructor_kwargs=kw,
                           batch_format="pyarrow", concurrency=conc)
    id_type = field_type(ds, id_col)
    carry = [("id_a", id_type), ("id_b", id_type), ("inter", pa.int64())]
    with_a = keyed_attach(inter, sizes, "id_a", "sz_a", carry,
                          id_col=id_col, text_col="n_shingles")
    with_ab = keyed_attach(with_a, sizes, "id_b", "sz_b",
                           carry + [("sz_a", pa.int64())],
                           id_col=id_col, text_col="n_shingles")

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df[["id_a", "id_b"]] if "id_a" in df.columns else pd.DataFrame(
                {"id_a": [], "id_b": []}
            )
        union = df["sz_a"] + df["sz_b"] - df["inter"]
        keep = df["inter"] >= threshold * union
        return df.loc[keep, ["id_a", "id_b"]]

    return with_ab.map_batches(thresh, batch_format="pandas")


def simhash_candidates(ds, text_col="text", id_col="doc_id", max_hamming: int = 3,
                       concurrency=None, hash_fn="pandas",
                       max_band_group: Optional[int] = None):
    """SimHash near-dup pairs within a hamming ball — the scale path
    for the 64-bit signatures.

    Pigeonhole banding: split the 64-bit hash into ``max_hamming + 1``
    contiguous bands; two hashes within hamming distance d agree
    EXACTLY on at least one band, so one groupby on (band, band_bits)
    recalls every pair — no quadratic scan.  Candidates are then
    verified by exact hamming distance (vectorized popcount) inside
    the same bucketed pass.

    Output: (id_a, id_b, hamming) distinct pairs with
    hamming <= max_hamming.

    ``max_band_group``: hot-bucket star cap (see _pairs_from_bucket) —
    identical-signature clusters share EVERY band, so a size-s clone
    cluster emits s(s-1)/2 pairs per band without it; with it, s-1
    star rows keep the cluster connected for group resolution.
    """
    from .bucketing import bucketed_group_apply

    nbands = max_hamming + 1
    widths = [64 // nbands + (1 if i < 64 % nbands else 0) for i in range(nbands)]
    offsets = np.concatenate(([0], np.cumsum(widths)))[:-1]

    sigs = simhash_signatures(ds, text_col, id_col, concurrency=concurrency,
                              hash_fn=hash_fn)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().view(np.uint64)
        ids = df[id_col].to_numpy()
        outs = []
        for b, (off, w) in enumerate(zip(offsets, widths)):
            key = ((h >> np.uint64(off)) & np.uint64((1 << w) - 1)).view(np.int64)
            outs.append(pd.DataFrame({
                "band": np.full(h.size, b, np.int32), "key": key,
                id_col: ids, "simhash": df["simhash"].to_numpy(),
            }))
        return pd.concat(outs, ignore_index=True)

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # ONE vectorized self-merge on the band key for the whole
        # bucket (the _pairs_from_bucket pattern) instead of a Python
        # loop over (band, key) groups, then a single vectorized
        # popcount over every candidate pair at once.
        star = None
        if max_band_group is not None and len(g):
            sizes = g.groupby(["band", "key"], sort=False)[id_col].transform("size")
            hot = sizes > max_band_group
            if hot.any():
                h = g[hot]
                # representative = the row of the group's min id; align
                # its simhash by merging that row back on the band key
                reps = h.loc[h.groupby(["band", "key"], sort=False)[id_col].idxmin(),
                             ["band", "key", id_col, "simhash"]]
                star = h.merge(reps, on=["band", "key"], suffixes=("_y", "_x"))
                star = star[star[f"{id_col}_x"] < star[f"{id_col}_y"]]
                g = g[~hot]
        m = g.merge(g, on=["band", "key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if star is not None:
            m = pd.concat(
                [m[[f"{id_col}_x", f"{id_col}_y", "simhash_x", "simhash_y"]],
                 star[[f"{id_col}_x", f"{id_col}_y", "simhash_x", "simhash_y"]]],
                ignore_index=True,
            )
        if m.empty:
            # typed empty: id dtypes inherited from the (empty) merge
            # frame so empty buckets match populated blocks' schema
            return pd.DataFrame({
                "id_a": pd.Series([], dtype=m[f"{id_col}_x"].dtype),
                "id_b": pd.Series([], dtype=m[f"{id_col}_y"].dtype),
                "hamming": pd.Series([], dtype="int64")})
        x = m["simhash_x"].to_numpy().view(np.uint64) ^ m["simhash_y"].to_numpy().view(np.uint64)
        d = np.zeros(x.size, np.int64)
        x = x.copy()
        for _ in range(64):  # vectorized popcount via bit strip
            nzm = x != 0
            if not nzm.any():
                break
            d[nzm] += 1
            x = x & (x - np.uint64(1))
        keep = d <= max_hamming
        return pd.DataFrame(
            {
                "id_a": m[f"{id_col}_x"].to_numpy()[keep],
                "id_b": m[f"{id_col}_y"].to_numpy()[keep],
                "hamming": d[keep],
            }
        ).drop_duplicates(["id_a", "id_b"])

    exploded = sigs.map_batches(explode, batch_format="pandas")
    cand = bucketed_group_apply(exploded, ["band", "key"], pairs_in_bucket)
    # same pair can surface from several bands: one bucketed distinct
    def dedup_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["id_a", "id_b"])

    return bucketed_group_apply(
        cand.map_batches(dedup_bucket, batch_format="pandas"),
        ["id_a", "id_b"], dedup_bucket,
    )


def dedup_spans(ds, text_col: str = "text", id_col: str = "doc_id",
                k: int = 5, hash_fn: str = "pandas", num_buckets: int = 64):
    """Span-level dedup REWRITE (the removal step of Lee et al. 2022 —
    dup_gram_stats is the counting core, this produces the cleaned
    corpus): every word position covered by a k-gram whose canonical
    occurrence (lexicographic min (doc_id, gram_pos) corpus-wide) is
    elsewhere gets removed; the canonical occurrence survives.  An
    exact duplicate doc therefore rewrites to empty while the min-id
    copy keeps its text, and within-doc repetition keeps only the
    first span.

    Output: (doc_id, n_words, n_removed, kept_text) for EVERY input
    doc, kept_text being the surviving words space-joined.

    Scale shape: (1) one corpus-sized explode to (doc_id, gh, gpos)
    rows and ONE gh-bucketed exchange — all occurrences of a gram
    co-locate, so the bucket-local sort picks the global canonical
    occurrence; only REDUNDANT positions leave the bucket.  (2) the
    redundant positions fold to one comma-joined string per affected
    doc and attach back to the corpus through the keyed_attach
    hash-join (left join, fill="").  (3) the rewrite itself is per-doc
    word surgery inside map_batches — payload-level work on the doc's
    own words, like the render/multimodal stages.  ``hash_fn="md5"``
    selects the SQL-twin gram hash."""
    from .bucketing import bucketed_group_apply
    from .relational import field_type, keyed_attach

    id_type = field_type(ds, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pandas()
        gh, g = _flat_shingles(texts, k, hash_fn)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        goff = np.concatenate(([0], np.cumsum(g)))[:-1]
        pos = np.arange(int(g.sum()), dtype=np.int64) - np.repeat(goff, g)
        return pa.table({id_col: pa.array(np.repeat(ids, g)),
                         "gh": pa.array(gh.view(np.int64)),
                         "gpos": pa.array(pos)})

    rows = ds.map_batches(explode, batch_format="pyarrow")

    def redundant(gdf: pd.DataFrame) -> pd.DataFrame:
        s = gdf.sort_values(["gh", id_col, "gpos"], kind="mergesort")
        red = s[s.duplicated("gh", keep="first")]
        return red[[id_col, "gpos"]].reset_index(drop=True)

    red = bucketed_group_apply(rows, "gh", redundant, num_buckets=num_buckets)

    def collect(gdf: pd.DataFrame) -> pd.DataFrame:
        s = gdf.sort_values([id_col, "gpos"], kind="mergesort")
        g = s.groupby(id_col, sort=False)["gpos"]
        out = g.agg(lambda x: ",".join(map(str, x)))
        return pd.DataFrame({id_col: out.index.to_numpy(), "rpos": out.to_numpy()})

    agg = bucketed_group_apply(red, id_col, collect)
    attached = keyed_attach(
        ds, agg, key_from=id_col, out_col="rpos",
        carry=[(id_col, id_type), (text_col, pa.string())],
        id_col=id_col, text_col="rpos", fill="",
    )

    def rewrite(b: pa.Table) -> pa.Table:
        texts = b[text_col].to_pandas().fillna("")
        rpos = b["rpos"].to_pandas().fillna("")
        n_words, n_removed, kept = [], [], []
        for t, r in zip(texts, rpos):
            ws = t.split()
            nw = len(ws)
            if not r:
                n_words.append(nw)
                n_removed.append(0)
                kept.append(" ".join(ws))
                continue
            cov = np.zeros(nw, dtype=bool)
            for p in np.array(r.split(","), dtype=np.int64):
                cov[p : p + k] = True
            n_words.append(nw)
            n_removed.append(int(cov.sum()))
            kept.append(" ".join(w for w, c in zip(ws, cov) if not c))
        return pa.table({
            id_col: b[id_col],
            "n_words": pa.array(np.asarray(n_words, dtype=np.int64)),
            "n_removed": pa.array(np.asarray(n_removed, dtype=np.int64)),
            "kept_text": pa.array(kept, pa.string()),
        })

    return attached.map_batches(rewrite, batch_format="pyarrow")
