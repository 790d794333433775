"""Print the per-operator Ray Data stats breakdown for the flagship
encode pipeline — the `ds.stats()` feedback loop the tuning work used
(see BASELINE.md perf-engineering notes).

Usage: PYTHONPATH=/root/repo python tools/profile_pipeline.py [corpus_dir]
"""

from __future__ import annotations

import os
import re
import sys
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("COLONNADE_EFFECTIVE_CPUS", "16")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PYTHONPATH"] = (
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    + os.pathsep + os.environ.get("PYTHONPATH", "")
)


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/colonnade_bench/corpus-sf0.1-m1"
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from colonnade_ray.pipelines import encode_dataset
    from colonnade_ray.stages.skew import (
        PKEY,
        partition_by_source,
        salt_counts,
        source_token_totals,
    )

    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    totals = source_token_totals(files)
    ds = rd.read_parquet(files, include_paths=True, override_num_blocks=len(files))
    ds = partition_by_source(ds, salt_counts(totals)).drop_columns([PKEY])
    enc = encode_dataset(ds, batch_size=8192).materialize()
    t0 = time.time()
    n = enc.count()
    wall = time.time() - t0
    print(f"chunks: {n}\n")
    stats = enc.stats()
    keep = re.compile(
        r"(Operator \d|Suboperator|Remote wall time|UDF time|tasks executed|"
        r"Output num rows per block|Ray Data throughput)"
    )
    for line in stats.splitlines():
        if keep.search(line):
            print(line.rstrip())
    ray.shutdown()


if __name__ == "__main__":
    main()
