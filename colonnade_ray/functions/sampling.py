"""Deterministic sampling / splitting for training-data pipelines.

Corpus-scale sampling must be reproducible across retries and
cluster sizes, so these operators derive membership from the row's own
key, never from RNG state: a re-run (or a resumed partial run) keeps
the exact same rows.  Two flavors:

- ``mod_sample``: key % mod == keep — systematic, SQL-reproducible
  (the driver oracle uses it); right when keys are already
  uniformly distributed (sequence ids).
- ``hash_sample``: fixed-key SipHash of the key column then modulo —
  unbiased for structured/clustered keys (paths, URLs); not
  SQL-expressible, so it is pytest-verified (determinism + disjoint
  complement) rather than oracle-checked.

Both are pure row filters: no shuffle, embarrassingly parallel,
column-pruned reads stay pruned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _key_numpy(batch: pa.Table, key_col: str) -> np.ndarray:
    col = batch[key_col]
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False)
    return col.to_pandas().to_numpy(dtype=object)


def mod_sample(ds, key_col: str = "doc_id", mod: int = 20, keep: int = 0):
    """Keep rows where ``key % mod == keep`` (integer keys)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = _key_numpy(batch, key_col)
        return batch.filter(pa.array(ids % mod == keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def hash_sample(ds, key_col: str = "doc_id", mod: int = 20, keep: int = 0):
    """Keep rows where ``siphash(key) % mod == keep`` — deterministic
    (pandas hash_array uses a fixed key) and unbiased for any key
    distribution."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = _key_numpy(batch, key_col)
        h = pd.util.hash_array(np.asarray(ids, dtype=object), categorize=False)
        return batch.filter(pa.array(h % np.uint64(mod) == np.uint64(keep)))

    return ds.map_batches(fn, batch_format="pyarrow")


def split_by_hash(ds, key_col: str = "doc_id", val_fraction_mod: tuple = (20, 0)):
    """(train, val) split: val = hash buckets == keep, train = rest.
    Disjoint and exhaustive by construction."""
    mod, keep = val_fraction_mod

    def part(invert: bool):
        def fn(batch: pa.Table) -> pa.Table:
            ids = _key_numpy(batch, key_col)
            h = pd.util.hash_array(np.asarray(ids, dtype=object), categorize=False)
            mask = h % np.uint64(mod) == np.uint64(keep)
            return batch.filter(pa.array(~mask if invert else mask))

        return fn

    return (
        ds.map_batches(part(True), batch_format="pyarrow"),
        ds.map_batches(part(False), batch_format="pyarrow"),
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle for training export


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants) —
    the production shuffle key: one fused numpy pass, no Python."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _md5_id_keys(ids: np.ndarray, seed: int) -> np.ndarray:
    """uint64 key = first 8 bytes (big-endian) of md5('<seed>:<id>') —
    bit-identical to DuckDB's ('0x'||substr(md5(...),1,16))::UBIGINT,
    the repo's SQL-twin convention (see dedup._md5_word_hashes).
    O(rows) hashlib calls: the oracle-checkable mode, not the default."""
    import hashlib

    pre = f"{seed}:".encode()
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(pre + str(i).encode()).digest()[:8], "big")
            for i in ids
        ),
        dtype=np.uint64,
        count=len(ids),
    )


def shuffle_export(ds, id_col: str = "doc_id", seed: int = 7,
                   num_shards: int = 8, hash_fn: str = "fast",
                   carry: tuple = ()):
    """Deterministic seeded global shuffle into training shards:
    every row gets a shard (key % num_shards) and a 0-based position
    within its shard (rank of (key, id)) — the pre-training export
    layout (shard = one output file, position = read order), stable
    across retries, resumes and cluster sizes because the permutation
    is a pure function of (seed, id), never RNG state.

    Scale shape: one map_batches computes keys (vectorized splitmix64;
    ``hash_fn="md5"`` selects the SQL-twin key), then ONE exchange
    keyed by shard assigns in-shard ranks.  The partitioning
    assumption: a shard is a training-file-sized unit (pick num_shards
    = corpus_bytes / ~1 GiB) so each rank group fits a worker."""

    def add_key(batch: pa.Table) -> pa.Table:
        ids = _key_numpy(batch, id_col)
        if hash_fn == "md5":
            k = _md5_id_keys(ids, seed)
        else:
            base = pd.util.hash_array(np.asarray(ids, dtype=object),
                                      categorize=False) if ids.dtype == object \
                else ids.astype(np.uint64)
            k = _splitmix64(base + np.uint64(seed))
        cols = {id_col: batch[id_col],
                "__key": pa.array(k),
                "shard": pa.array((k % np.uint64(num_shards)).astype(np.int64))}
        for c in carry:
            cols[c] = batch[c]
        return pa.table(cols)

    keyed = ds.map_batches(add_key, batch_format="pyarrow")

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        # one BUCKET may hold several shards (bucketing.py contract):
        # rank within each shard vectorized, no per-shard Python
        g = g.sort_values(["shard", "__key", id_col], kind="mergesort")
        g["pos"] = g.groupby("shard", sort=False).cumcount().astype(np.int64)
        return g.drop(columns=["__key"])

    from .bucketing import bucketed_group_apply

    out = bucketed_group_apply(keyed, "shard", rank_shard)
    return out.map_batches(
        lambda b: b.select([id_col, "shard", "pos"] + list(carry)),
        batch_format="pyarrow",
    )


def export_shards(ds, out_dir: str, id_col: str = "doc_id", seed: int = 7,
                  num_shards: int = 8, carry: tuple = ("text",)):
    """Materialize shuffle_export's deterministic permutation as REAL
    training shard files: `shard=K/part.parquet` per shard, rows in
    ascending `pos` order (the read order a trainer consumes).

    Scale shape: the (shard, pos) assignment is shuffle_export's one
    exchange; the write adds NO second shuffle — each shard bucket is
    already co-located after the rank pass, so the per-group sort is
    bucket-local and `write_parquet(partition_cols=["shard"])` streams
    one directory per shard (the resumable-output convention: a failed
    run re-writes only missing shard directories).  Returns the shard
    manifest (shard, n_rows, min_pos, max_pos) for verification."""
    import os

    import pyarrow.parquet as pq

    assigned = shuffle_export(ds, id_col=id_col, seed=seed,
                              num_shards=num_shards, carry=carry)

    def order(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("pos", kind="mergesort")

    from .bucketing import bucketed_group_apply

    ordered = bucketed_group_apply(assigned, "shard", order)
    ordered.write_parquet(out_dir, partition_cols=["shard"])

    rows = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard="):
            continue
        t = pq.read_table(os.path.join(out_dir, name), columns=["pos"])
        p = t["pos"].to_numpy()
        rows.append({"shard": int(name.split("=")[1]),
                     "n_rows": len(p),
                     "min_pos": int(p.min()) if len(p) else -1,
                     "max_pos": int(p.max()) if len(p) else -1})
    return pd.DataFrame(rows).sort_values("shard").reset_index(drop=True)


def cap_source_share(ds, group_col: str = "source", id_col: str = "doc_id",
                     cap_fraction: float = 0.3, seed: int = 9):
    """Domain balancing: downsample every group whose share of the
    corpus exceeds ``cap_fraction`` to (approximately) that share,
    deterministically — keep iff md5_key(seed:id) falls below the
    group's keep-rate threshold, so retries/resumes keep the same rows
    and under-represented groups pass through untouched.

    The per-group keep threshold is floor(rate * 2^64) with rate =
    (cap_fraction * total) / n_group: the 2^64 scaling is a power of
    two (exact in IEEE), so an SQL twin computes the identical
    threshold bit-for-bit.  Group counts are a groups-sized broadcast;
    the filter is a pure row pass — no shuffle."""
    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count(alias_name="ng")).to_pandas()
    total = float(counts["ng"].sum())
    thresholds = {}
    for g, ng in zip(counts[group_col], counts["ng"]):
        rate = (cap_fraction * total) / float(ng)
        thresholds[g] = None if rate >= 1.0 else np.uint64(
            np.floor(rate * 18446744073709551616.0))

    def keep(batch: pa.Table) -> pa.Table:
        grp = batch[group_col].to_pandas().to_numpy(dtype=object)
        ids = _key_numpy(batch, id_col)
        h = _md5_id_keys(ids, seed)
        mask = np.ones(len(batch), dtype=bool)
        for g, thr in thresholds.items():
            if thr is not None:
                sel = grp == g
                mask[sel] = h[sel] < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def temperature_mix(ds, group_col: str = "source", id_col: str = "doc_id",
                    alpha: float = 0.5, seed: int = 11):
    """Temperature-based source mixing (the multilingual-LM sampling
    rule, Conneau et al. 2020 §3 / Devlin et al. 2019 exp. weighting,
    public): target share of group i is q_i = p_i^alpha / sum_j
    p_j^alpha with p_i its corpus share.  A filter can only
    downsample, so keep rates are normalized to the most-upweighted
    group: keep_i = (p_min / p_i)^(1-alpha) — the rarest group passes
    untouched, dominant groups shrink toward the flattened mixture,
    and the realized shares equal q_i exactly in expectation.

    Determinism contract is ``cap_source_share``'s: keep iff
    md5_key(seed:id) < floor(keep_i * 2^64), so retries, resumes and
    cluster sizes select the same rows, and the threshold is an SQL
    twin away from DuckDB.  For the oracle-checkable default
    alpha=0.5 the rate is sqrt(n_min/n_i): one IEEE division plus a
    correctly-rounded sqrt, bit-identical in numpy and SQL (general
    alpha uses pow(), which is NOT guaranteed correctly rounded —
    keep it for production, oracle at 0.5).

    Scale shape: group counts are one groups-sized aggregate; the
    filter is a pure vectorized row pass — no shuffle, no driver
    loop over rows."""
    from ray.data.aggregate import Count

    counts = ds.groupby(group_col).aggregate(Count(alias_name="ng")).to_pandas()
    # normalize keep rates to the most-UPWEIGHTED group (keep = 1):
    # alpha < 1 flattens (rarest passes whole, dominants shrink);
    # alpha > 1 sharpens (largest passes whole, rare groups shrink)
    n_ref = float(counts["ng"].min() if alpha <= 1.0 else counts["ng"].max())
    thresholds = {}
    for g, ng in zip(counts[group_col], counts["ng"]):
        if alpha == 0.5:
            rate = float(np.sqrt(n_ref / float(ng)))
        elif alpha <= 1.0:
            rate = float((n_ref / float(ng)) ** (1.0 - alpha))
        else:
            rate = float((float(ng) / n_ref) ** (alpha - 1.0))
        thr_f = np.floor(rate * 18446744073709551616.0)
        thresholds[g] = None if thr_f >= 18446744073709551616.0 \
            else np.uint64(thr_f)

    def keep(batch: pa.Table) -> pa.Table:
        grp = batch[group_col].to_pandas().to_numpy(dtype=object)
        ids = _key_numpy(batch, id_col)
        h = _md5_id_keys(ids, seed)
        mask = np.ones(len(batch), dtype=bool)
        for g, thr in thresholds.items():
            if thr is not None:
                sel = grp == g
                mask[sel] = h[sel] < thr
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")
