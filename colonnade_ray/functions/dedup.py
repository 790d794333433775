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


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the minimum id per distinct text (hash-partitioned).

    hash -> groupby(fingerprint).aggregate(Min(id)) : the shuffle moves
    one fingerprint row per doc, never the text payloads.
    """
    from ray.data.aggregate import Min

    fp = ds.map_batches(
        lambda b: fingerprint_batch(b, text_col).select([id_col, "fingerprint"]),
        batch_format="pyarrow",
    )
    out = fp.groupby("fingerprint").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


# ---------------------------------------------------------------------------
# Shingles + MinHash


def _word_shingle_hashes(texts: pd.Series, k: int = 5) -> list:
    """Per doc: uint64 hashes of word k-grams (vectorized per batch)."""
    out = []
    for t in texts.fillna(""):
        words = t.split()
        if len(words) < k:
            grams = [" ".join(words)] if words else []
        else:
            grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
        if grams:
            h = pd.util.hash_array(np.asarray(grams, dtype=object), categorize=False)
            out.append(np.unique(h.astype(np.uint64)))
        else:
            out.append(np.zeros(0, np.uint64))
    return out


def _minhash_perms(n_perm: int, seed: int = 7) -> tuple:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x+b) mod Mersenne61, min per permutation — uint64[n_perm]."""
    if shingle_hashes.size == 0:
        return np.full(a.size, np.uint64(0xFFFFFFFFFFFFFFFF))
    x = (shingle_hashes % _MERSENNE).astype(np.uint64)
    with np.errstate(over="ignore"):
        prods = (x[None, :] * a[:, None] + b[:, None]) % _MERSENNE
    return prods.min(axis=1)


class MinHashBands:
    """map_batches callable: text -> exploded (band, band_hash, doc_id)
    rows.  n_perm = bands * rows_per_band; docs sharing any band bucket
    are near-dup candidates (LSH)."""

    def __init__(self, text_col="text", id_col="doc_id", bands=16, rows_per_band=4,
                 shingle_k=5, seed=7):
        self.text_col, self.id_col = text_col, id_col
        self.bands, self.rpb = bands, rows_per_band
        self.k = shingle_k
        self.a, self.b = _minhash_perms(bands * rows_per_band, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas()
        ids = batch[self.id_col].to_pylist()
        sh = _word_shingle_hashes(texts, self.k)
        band_ids, band_hashes, doc_ids = [], [], []
        for i, s in enumerate(sh):
            sig = minhash_signature(s, self.a, self.b)
            bands = sig.reshape(self.bands, self.rpb)
            # exact polynomial fold of the rows_per_band minhashes —
            # equal band <-> equal key (mod 2^64 collisions only)
            with np.errstate(over="ignore"):
                key = bands[:, 0].copy()
                for j in range(1, self.rpb):
                    key = key * np.uint64(1099511628211) + bands[:, j]
            key = key.view(np.int64)
            for bi in range(self.bands):
                band_ids.append(bi)
                band_hashes.append(int(key[bi]))
                doc_ids.append(ids[i])
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
                self.id_col: pa.array(doc_ids),
            }
        )


def _pairs_from_group(g: pd.DataFrame, id_col: str) -> pd.DataFrame:
    ids = np.unique(g[id_col].to_numpy())
    if ids.size < 2:
        return pd.DataFrame({"id_a": [], "id_b": []}).astype({"id_a": ids.dtype, "id_b": ids.dtype})
    ia, ib = np.triu_indices(ids.size, k=1)
    return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})


def minhash_candidates(ds, text_col="text", id_col="doc_id", bands=16, rows_per_band=4,
                       shingle_k=5, concurrency=None):
    """LSH candidate pairs (id_a < id_b), deduplicated."""
    from ..util import default_concurrency

    conc = concurrency or (1, default_concurrency())
    exploded = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, bands=bands, rows_per_band=rows_per_band,
            shingle_k=shingle_k,
        ),
        batch_format="pyarrow",
        concurrency=conc,
    )
    pairs = exploded.groupby(["band", "band_hash"]).map_groups(
        lambda g: _pairs_from_group(g, id_col), batch_format="pandas"
    )
    # a pair can surface from several bands — dedup
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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


def near_dup_pairs(ds, texts_ref=None, text_col="text", id_col="doc_id",
                   threshold=0.7, bands=16, rows_per_band=4, shingle_k=5):
    """MinHash-LSH candidates -> exact Jaccard verification.

    texts_ref: ray.put({id: text}) broadcast handle; if None it is
    built here with a driver-side pull (fine at test scale; at corpus
    scale pass a pre-built shared handle or verify via a join)."""
    import ray

    if texts_ref is None:
        rows = ds.select_columns([id_col, text_col]).take_all()
        texts_ref = ray.put({r[id_col]: r[text_col] for r in rows})
    cands = minhash_candidates(ds, text_col, id_col, bands, rows_per_band, shingle_k)
    from ..util import default_concurrency

    return cands.map_batches(
        JaccardVerify,
        fn_constructor_kwargs=dict(texts_ref=texts_ref, shingle_k=shingle_k,
                                   threshold=threshold),
        batch_format="pyarrow",
        concurrency=(1, default_concurrency()),
    )


# ---------------------------------------------------------------------------
# SimHash


class SimHash:
    """64-bit SimHash per doc over word hashes (near-dup fingerprint;
    hamming-ball lookup is the scale path)."""

    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pandas().fillna("")
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            words = np.asarray(t.split(), dtype=object)
            if words.size == 0:
                continue
            # term-frequency weighted (standard SimHash: each distinct
            # term votes +-tf on every bit of its hash)
            uniq, counts = np.unique(words, return_counts=True)
            h = pd.util.hash_array(uniq, categorize=False).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (counts[:, None] * (2 * bits - 1)).sum(axis=0)
            out[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(out.view(np.int64)),
            }
        )


def simhash_signatures(ds, text_col="text", id_col="doc_id", concurrency=None):
    from ..util import default_concurrency

    return ds.map_batches(
        SimHash,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )


# ---------------------------------------------------------------------------
# Duplicate-group resolution (connected components over dup pairs)


def dup_groups(pairs_ds):
    """Connected components over near-dup pairs -> (doc_id, group_id)
    with group_id = min doc id of the component.

    The candidate-pair set is orders of magnitude smaller than the
    corpus (only docs that shared an LSH bucket), so per the ray guide
    it is pulled once to the driver and resolved with union-find; for
    pathologically large pair sets switch to iterated min-label
    propagation (groupby per round) instead.
    """
    import ray.data as rd

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
