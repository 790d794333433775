"""Hash-bucket group processing: the scalable alternative to
``groupby(keys).map_groups`` / per-key aggregates when key cardinality
is high.

Ray Data's sort-based groupby invokes Python once PER GROUP; at
millions of small groups (candidate pairs, fingerprints, band
buckets, label-propagation nodes) that overhead dominates wall time
(measured ~60 s for 2M rows / 250k groups on 8 cpus vs ~2 s for the
same rows in 64 bucket groups).  The fix is one level of indirection:
shuffle on ``hash(key) % num_buckets`` — which still co-locates every
key — then run ONE vectorized pandas operation per bucket (merge /
groupby-agg / drop_duplicates).

This is also how the engine stays honest at 100 TB: the shuffle volume
is identical to a keyed groupby, but the number of Python invocations
is O(num_buckets), not O(distinct keys).
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np
import pandas as pd

DEFAULT_BUCKETS = 64


def add_bucket_column(df: pd.DataFrame, key_cols: Union[str, Sequence[str]],
                      num_buckets: int = DEFAULT_BUCKETS,
                      col: str = "__b") -> pd.DataFrame:
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if len(df) == 0:
        return df.assign(**{col: pd.Series([], dtype=np.int64)})
    h = pd.util.hash_pandas_object(df[keys], index=False)
    return df.assign(**{col: (h.to_numpy() % np.uint64(num_buckets)).astype(np.int64)})


def bucketed_group_apply(ds, key_cols: Union[str, Sequence[str]],
                         fn: Callable[[pd.DataFrame], pd.DataFrame],
                         num_buckets: int = DEFAULT_BUCKETS):
    """groupby-equivalent with O(num_buckets) Python invocations.

    ``fn`` receives one BUCKET (all rows of every key hashing to it,
    ``__b`` column already dropped) and must itself handle the
    per-key logic vectorized (pandas merge / groupby / sort)."""
    bucketed = ds.map_batches(
        lambda df: add_bucket_column(df, key_cols, num_buckets),
        batch_format="pandas",
    )
    return bucketed.groupby("__b").map_groups(
        lambda g: fn(g.drop(columns="__b")), batch_format="pandas"
    )
