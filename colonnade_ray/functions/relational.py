"""Relational lookups for training-data pipelines.

The reference has no data joins (SURVEY.md §2.7: ``headedToIndexed``
is a plan-time name lookup, kept plan-time in `plan.py`); these are
the engine additions a corpus pipeline needs, built on the two
patterns from the Ray guide:

- broadcast join: the small side travels once via ``ray.put`` and is
  probed per batch with a vectorized pandas merge — no shuffle;
- hash join: ``Dataset.join`` (hash-partitioned on the key) when both
  sides are large.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd
import pyarrow as pa


class BroadcastJoin:
    """map_batches callable: probe a broadcast dimension table.

    The dimension is fetched once per actor in __init__ (broadcast via
    object store), then each batch does a vectorized merge."""

    def __init__(self, small_ref, on: str, how: str = "inner"):
        import ray

        small = ray.get(small_ref)
        self.small = small if isinstance(small, pd.DataFrame) else small.to_pandas()
        self.on = on
        self.how = how

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        return df.merge(self.small, on=self.on, how=self.how)


def broadcast_join(ds, small_table, on: str, how: str = "inner", concurrency=None):
    """Join ``ds`` against a small in-memory side (pa.Table/DataFrame).

    ray.put once; every actor reads the same object — never re-shipped
    per batch (the guide's small-side rule)."""
    import ray

    from ..util import default_concurrency

    ref = ray.put(small_table)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how},
        batch_format="pyarrow",
        concurrency=concurrency or (1, default_concurrency()),
    )


def hash_join(left, right, on: Sequence[str], join_type: str = "inner",
              num_partitions: Optional[int] = None):
    """Large-large join: Ray's hash-partitioned Dataset.join."""
    from ..util import default_concurrency

    if num_partitions is None:
        num_partitions = max(2, default_concurrency())
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=tuple(on))


def sessionize(events_ds, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30):
    """Session windows: per key, a new session starts when the gap to
    the previous event exceeds ``gap_minutes`` (ray guide streaming
    pattern: groupby(key).map_groups over ts-sorted groups).

    Returns (key, session_id, n_events, session_start) with
    session_id = running count per key starting at 1.
    """
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col, kind="mergesort")
        new_session = g[ts_col].diff() > gap
        sid = new_session.cumsum() + 1
        out = g.assign(session_id=sid).groupby("session_id", as_index=False).agg(
            n_events=(ts_col, "size"), session_start=(ts_col, "min")
        )
        out[key_col] = g[key_col].iloc[0]
        return out[[key_col, "session_id", "n_events", "session_start"]]

    return events_ds.groupby(key_col).map_groups(per_key, batch_format="pandas")
