"""Driver simulator: run queries() vs oracle_sql() on a testdata dir
and compare row-count + schema + order-insensitive value hash —
mirrors the round driver's CORRECTNESS check so we catch mismatches
before it does.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows, {dt:.1f}s")
            continue
        theirs = canon(con.execute(oracles[name]).fetchdf())
        status = "OK"
        if len(mine) != len(theirs):
            status = f"ROWCOUNT {len(mine)} vs {len(theirs)}"
        elif list(mine.columns) != list(theirs.columns):
            status = f"SCHEMA {list(mine.columns)} vs {list(theirs.columns)}"
        elif [d.kind for d in mine.dtypes] != [d.kind for d in theirs.dtypes]:
            # the driver hashes VALUES under their dtype: int64 vs the
            # float64/object a DuckDB HUGEINT becomes => hash mismatch
            # even when values are equal.  Catch it locally.
            status = (
                f"DTYPE {dict(zip(mine.columns, (str(d) for d in mine.dtypes)))} "
                f"vs {dict(zip(theirs.columns, (str(d) for d in theirs.dtypes)))}"
            )
        else:
            try:
                pd.testing.assert_frame_equal(
                    mine, theirs, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status = "VALUES " + str(e).split("\n")[0]
        if status != "OK":
            failures += 1
            print(f"FAIL {name}: {status}")
            if "VALUES" in status or "SCHEMA" in status:
                print("  mine:", mine.head(3).to_dict("records"))
                print("  them:", theirs.head(3).to_dict("records"))
        else:
            print(f"OK   {name}: {len(mine)} rows, {dt:.1f}s")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
