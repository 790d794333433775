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
