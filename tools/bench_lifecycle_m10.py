"""Lifecycle ops at m10 scale (~2M rows / ~842M tokens): the evidence
that delete/vacuum cost scales with the TOUCHED fraction of the
corpus, not its size.

Two regimes over the same encoded corpus (20 commit groups):

1. narrow band — ``doc_id <= doc-0000099999`` (first 5% of rows;
   doc_ids are fragment-contiguous, so zone maps prune mask creation
   AND vacuum to ~1/20 groups)
2. scattered — ``source == src7`` (~2% of rows, present in every
   chunk: mask creation decodes only the source column everywhere,
   and vacuum must rewrite every group — the documented worst case
   where vacuum approaches a re-encode)

Usage: python tools/bench_lifecycle_m10.py  (run from repo root)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from colonnade_ray.corpus import synth_corpus
    from colonnade_ray.pipelines import (
        count_where,
        decode_corpus,
        delete_where,
        encode_corpus,
        vacuum_deletes,
    )
    from colonnade_ray.pipelines.encode_pipeline import active_groups

    corpus = "/tmp/colonnade_bench/corpus-sf0.1-m10"
    synth_corpus(corpus, 2_000_000, seed=42, rows_per_file=25_000)
    out = "/tmp/lifecycle_m10/out"
    shutil.rmtree("/tmp/lifecycle_m10", ignore_errors=True)

    t0 = time.time()
    s = encode_corpus(corpus, out, resume=False, group_size=4,
                      max_concurrent_groups=4)
    t_encode = time.time() - t0
    n_groups = len(active_groups(out))
    rows = s["rows"]
    res = {"rows": rows, "tokens": s["tokens"], "groups": n_groups,
           "encode_sec": round(t_encode, 2)}

    # regime 0: sparse — masks on ~1/4 of ONE group's chunks; vacuum
    # moves the group's unmasked chunks verbatim (no decode/re-encode)
    t0 = time.time()
    d0 = delete_where(out, ("doc_id", "<=", "doc-0000009999"))
    res["sparse_delete_sec"] = round(time.time() - t0, 2)
    res["sparse_chunks_touched"] = d0["chunks_touched"]
    t0 = time.time()
    v0 = vacuum_deletes(out, max_concurrent_groups=4)
    res["sparse_vacuum_sec"] = round(time.time() - t0, 2)
    res["sparse_vacuumed_groups"] = v0["vacuumed_groups"]
    assert count_where(out, ("doc_id", "<=", "doc-0000009999")) == 0

    # regime 1: narrow band, fragment-contiguous ids
    t0 = time.time()
    d1 = delete_where(out, ("doc_id", "<=", "doc-0000099999"))
    res["narrow_delete_sec"] = round(time.time() - t0, 2)
    res["narrow_rows_deleted"] = d1["rows_deleted"]
    res["narrow_chunks_touched"] = d1["chunks_touched"]
    t0 = time.time()
    v1 = vacuum_deletes(out, max_concurrent_groups=4)
    res["narrow_vacuum_sec"] = round(time.time() - t0, 2)
    res["narrow_vacuumed_groups"] = v1["vacuumed_groups"]
    assert count_where(out, ("doc_id", "<=", "doc-0000099999")) == 0
    live = rows - d0["rows_deleted"] - d1["rows_deleted"]
    assert decode_corpus(out, columns=["n_tok"]).count() == live

    # regime 2: scattered predicate, every chunk a boundary chunk
    t0 = time.time()
    d2 = delete_where(out, ("source", "==", "src7"))
    res["scattered_delete_sec"] = round(time.time() - t0, 2)
    res["scattered_rows_deleted"] = d2["rows_deleted"]
    res["scattered_chunks_touched"] = d2["chunks_touched"]
    t0 = time.time()
    v2 = vacuum_deletes(out, max_concurrent_groups=4)
    res["scattered_vacuum_sec"] = round(time.time() - t0, 2)
    res["scattered_vacuumed_groups"] = v2["vacuumed_groups"]
    live -= d2["rows_deleted"]
    assert count_where(out, ("source", "==", "src7")) == 0
    assert decode_corpus(out, columns=["n_tok"]).count() == live

    # regime 3: keyed merge — 20k scattered updates + 2k inserts
    # (~1% of rows).  The cost to watch is the keyed delete: one
    # doc_id-projected scan with an `in` mask, bounded by the touched
    # fraction like any delete
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colonnade_ray.pipelines import merge_rows

    upd_ids = [f"doc-{i:010d}" for i in range(200_000, 2_000_000, 90)]
    new_ids = [f"doc-3{i:09d}" for i in range(2_000)]
    keys = upd_ids + new_ids
    batch = pa.table({
        "doc_id": pa.array(keys, pa.string()),
        "tokens": pa.array([[1, 2, 3]] * len(keys), pa.list_(pa.int32())),
        "n_tok": pa.array([3] * len(keys), pa.int32()),
        "source": pa.array(["merged"] * len(keys), pa.string()),
    })
    bdir = "/tmp/lifecycle_m10/batch"
    os.makedirs(bdir, exist_ok=True)
    bp = os.path.join(bdir, "batch-0.parquet")
    pq.write_table(batch, bp)
    t0 = time.time()
    mres = merge_rows(out, bp, key="doc_id")
    res["merge_sec"] = round(time.time() - t0, 2)
    res["merge_keys"] = mres["matched_keys"]
    res["merge_masked_rows"] = mres["masked_rows"]
    live += len(keys) - mres["masked_rows"]
    assert count_where(out, ("source", "==", "merged")) == len(keys)

    # regime 4: snapshots are O(manifest) — create, read as-of, and
    # survive a vacuum that materializes the merge's masks
    from colonnade_ray.pipelines import (
        count_where as _cw,
        create_snapshot,
        decode_snapshot,
    )

    t0 = time.time()
    create_snapshot(out, "bench")
    res["snapshot_create_sec"] = round(time.time() - t0, 3)
    t0 = time.time()
    n_snap = decode_snapshot(out, "bench", columns=["n_tok"]).count()
    res["snapshot_decode_sec"] = round(time.time() - t0, 2)
    assert n_snap == live
    t0 = time.time()
    vacuum_deletes(out, max_concurrent_groups=4)
    res["merge_vacuum_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    assert _cw(out, ("source", "==", "merged"), snapshot="bench") == \
        len(keys)
    res["snapshot_count_sec"] = round(time.time() - t0, 2)
    assert decode_snapshot(out, "bench", columns=["n_tok"]).count() == live

    print(json.dumps(res))
    shutil.rmtree("/tmp/lifecycle_m10", ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
