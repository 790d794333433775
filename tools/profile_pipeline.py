"""Per-operator Ray Data stats for the REAL flagship encode pipeline
(same path as pipelines.encode_corpus: fused read+transport-pack+frag
prep -> optional skew shuffle -> encoder actor pool -> parquet sink) —
the `ds.stats()` feedback loop behind BASELINE.md's tuning notes.

Usage:
  PYTHONPATH=/root/repo [RAY_GRAFT_CPUS=8] [PROFILE_NO_SHUFFLE=1] \
      python tools/profile_pipeline.py [corpus_dir]
"""

from __future__ import annotations

import os
import re
import shutil
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
    from colonnade_ray.pipelines.encode_pipeline import _prep_batch
    from colonnade_ray.stages.skew import (
        PKEY,
        partition_by_source,
        salt_counts,
        source_token_totals,
    )
    from colonnade_ray.stages.transport import list_transport_spec

    files = sorted(
        os.path.join(corpus, f) for f in os.listdir(corpus) if f.endswith(".parquet")
    )
    t0 = time.time()
    totals = source_token_totals(files)
    t_totals = time.time() - t0
    total_bytes = sum(os.path.getsize(f) for f in files)
    nblocks = max(len(files), total_bytes // (64 << 20) + 1)
    spec = list_transport_spec(files)
    frag_names = [os.path.basename(f) for f in files]
    frag_idx = {f: i for i, f in enumerate(files)}

    ds = rd.read_parquet(files, include_paths=True, override_num_blocks=nblocks)
    ds = ds.map_batches(
        lambda b: _prep_batch(b, spec, frag_idx),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if os.environ.get("PROFILE_NO_SHUFFLE") != "1":
        ds = partition_by_source(ds, salt_counts(totals)).drop_columns([PKEY])
    enc = encode_dataset(ds, batch_size=8192, transport=spec or None,
                         fragments=frag_names)
    out = "/tmp/colonnade_profile_out"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    enc.write_parquet(out, compression="none")
    wall = time.time() - t0
    print(f"stats pass: {t_totals:.2f}s   pipeline wall: {wall:.2f}s\n")
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
