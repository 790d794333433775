"""Merge-on-read deletion vectors (pipelines/deletes.py): delete_where
sidecars mask rows out of every read path; vacuum_deletes materializes
them.  Semantics twin: SQL DELETE WHERE p removes only p = TRUE rows."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from colonnade_ray.corpus import synth_corpus
from colonnade_ray.pipelines import (
    aggregate_where,
    compact_corpus,
    corpus_summary,
    count_where,
    decode_corpus,
    delete_where,
    deleted_row_count,
    encode_corpus,
    group_counts,
    vacuum_deletes,
)


def _setup(tmp_path, n_rows=600, **enc_kwargs):
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    synth_corpus(inp, n_rows, seed=11, rows_per_file=200)
    encode_corpus(inp, out, batch_size=64, resume=False, **enc_kwargs)
    orig = pq.read_table(inp)
    return inp, out, orig


def _doc_ids(ds):
    return sorted(r["doc_id"] for r in ds.select_columns(["doc_id"]).take_all())


def test_delete_where_then_decode(ray_session, tmp_path):
    inp, out, orig = _setup(tmp_path, cluster_by="n_tok")
    med = int(np.median(orig["n_tok"].to_numpy()))
    res = delete_where(out, ("n_tok", ">=", med))
    assert res["rows_deleted"] > 0 and res["chunks_touched"] > 0
    keep = orig.filter(pa.compute.less(orig["n_tok"], med))
    got = _doc_ids(decode_corpus(out))
    assert got == sorted(keep["doc_id"].to_pylist())
    # projected decode masks too
    got2 = _doc_ids(decode_corpus(out, columns=["doc_id"]))
    assert got2 == got
    # decode + extra predicate composes with the mask
    lo = int(np.percentile(orig["n_tok"].to_numpy(), 20))
    both = decode_corpus(out, predicate=("n_tok", ">=", lo))
    want = keep.filter(pa.compute.greater_equal(keep["n_tok"], lo))
    assert sorted(r["doc_id"] for r in both.take_all()) == \
        sorted(want["doc_id"].to_pylist())


def test_pushdowns_exact_under_deletes(ray_session, tmp_path):
    inp, out, orig = _setup(tmp_path, cluster_by="n_tok")
    ntok = orig["n_tok"].to_numpy()
    med = int(np.median(ntok))
    delete_where(out, ("n_tok", ">=", med))
    live = ntok[ntok < med]
    q = int(np.percentile(ntok, 20))
    assert count_where(out, ("n_tok", ">=", q)) == int((live >= q).sum())
    assert aggregate_where(out, "sum", "n_tok") == int(live.sum())
    assert aggregate_where(out, "max", "n_tok") == int(live.max())
    assert aggregate_where(out, "min", "n_tok",
                           predicate=("n_tok", ">=", q)) == \
        int(live[live >= q].min())
    # per-source counts drop deleted rows
    src = np.asarray(orig["source"].to_pylist())
    live_src = src[ntok < med]
    gc = group_counts(out, "source")
    want = {s: int((live_src == s).sum()) for s in set(src)}
    got = dict(zip(gc["source"], gc["n_rows"]))
    assert got == {k: v for k, v in want.items() if v}
    summ = corpus_summary(out)
    assert summ["deleted_rows"] == int((ntok >= med).sum())
    assert summ["live_rows"] == len(live)


def test_stacked_deletes_union(ray_session, tmp_path):
    inp, out, orig = _setup(tmp_path)
    ntok = orig["n_tok"].to_numpy()
    a, b = int(np.percentile(ntok, 70)), int(np.percentile(ntok, 55))
    delete_where(out, ("n_tok", ">=", a))
    delete_where(out, ("n_tok", ">=", b))  # overlaps the first
    assert deleted_row_count(out) == int((ntok >= b).sum())
    assert decode_corpus(out).count() == int((ntok < b).sum())


def test_delete_null_semantics(ray_session, tmp_path):
    """DELETE WHERE p removes only p = TRUE rows: nulls survive."""
    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    t = pa.table({
        "id": pa.array(list(range(8)), pa.int64()),
        "v": pa.array([1, None, 3, None, 5, 6, None, 8], pa.int64()),
    })
    pq.write_table(t, os.path.join(inp, "part-0.parquet"))
    encode_corpus(inp, out, batch_size=4, resume=False)
    delete_where(out, ("v", ">=", 5))
    got = sorted(r["id"] for r in decode_corpus(out).take_all())
    assert got == [0, 1, 2, 3, 6]  # nulls (ids 1, 3, 6) survive


def test_vacuum_materializes_and_retires(ray_session, tmp_path):
    inp, out, orig = _setup(tmp_path, cluster_by="n_tok")
    ntok = orig["n_tok"].to_numpy()
    med = int(np.median(ntok))
    before = corpus_summary(out)["bytes_out"]
    delete_where(out, ("n_tok", ">=", med))
    want_ids = sorted(
        orig.filter(pa.compute.less(orig["n_tok"], med))["doc_id"].to_pylist())
    res = vacuum_deletes(out)
    assert res["vacuumed_groups"] >= 1 and res["retired_deletes"] == 1
    assert res["rows_dropped"] == int((ntok >= med).sum())
    # sidecars gone, masks empty, answers unchanged
    assert not os.path.isdir(os.path.join(out, "_deletes")) or \
        not os.listdir(os.path.join(out, "_deletes"))
    from colonnade_ray.pipelines import committed_deletes

    assert committed_deletes(out) == []
    assert _doc_ids(decode_corpus(out)) == want_ids
    summ = corpus_summary(out)
    assert summ["rows"] == len(want_ids)
    assert "deleted_rows" not in summ
    assert summ["bytes_out"] < before
    # pushdown still exact on the rewritten chunks
    q = int(np.percentile(ntok, 20))
    live = ntok[ntok < med]
    assert count_where(out, ("n_tok", ">=", q)) == int((live >= q).sum())
    # second vacuum is a no-op
    assert vacuum_deletes(out)["vacuumed_groups"] == 0


def test_vacuum_preserves_input_coverage_for_resume(ray_session, tmp_path):
    """Vacuumed groups keep covering their input files: a resumed
    encode_corpus over the same inputs must not re-encode them (which
    would resurrect the deleted rows)."""
    inp, out, orig = _setup(tmp_path)
    med = int(np.median(orig["n_tok"].to_numpy()))
    delete_where(out, ("n_tok", ">=", med))
    vacuum_deletes(out)
    n_before = decode_corpus(out).count()
    summary = encode_corpus(inp, out, batch_size=64, resume=True)
    assert summary["resumed_groups"] == summary["groups"]
    assert decode_corpus(out).count() == n_before


def test_uncommitted_delete_ignored(ray_session, tmp_path):
    inp, out, orig = _setup(tmp_path, n_rows=200)
    med = int(np.median(orig["n_tok"].to_numpy()))
    delete_where(out, ("n_tok", ">=", med))
    # torn write: data dir present, marker missing -> ignored
    root = os.path.join(out, "_deletes")
    (did,) = [f[4:-5] for f in os.listdir(root) if f.endswith(".json")]
    os.remove(os.path.join(root, f"del-{did}.json"))
    assert decode_corpus(out).count() == len(orig)
    assert deleted_row_count(out) == 0


def test_deletes_survive_compaction(ray_session, tmp_path):
    """Masks are keyed by content-derived (fragment, chunk_id), which
    compaction moves verbatim — deletes stay in force across it."""
    inp, out, orig = _setup(tmp_path, group_size=1)
    med = int(np.median(orig["n_tok"].to_numpy()))
    delete_where(out, ("n_tok", ">=", med))
    n_live = decode_corpus(out).count()
    res = compact_corpus(out)
    assert res["compacted_groups"] >= 2
    assert decode_corpus(out).count() == n_live
    # and vacuum works on the compacted layout
    vacuum_deletes(out)
    assert decode_corpus(out).count() == n_live


def test_torn_vacuum_converges(ray_session, tmp_path):
    """Crash-safety: un-commit one vacuumed group (as a crash between
    its data write and its lineage marker would leave it) — reads
    still serve the OLD group with masks in force, and a re-run
    converges to the same final state."""
    inp, out, orig = _setup(tmp_path, group_size=1)
    ntok = orig["n_tok"].to_numpy()
    med = int(np.median(ntok))
    delete_where(out, ("n_tok", ">=", med))
    want = decode_corpus(out).count()
    vacuum_deletes(out, gc=False)
    lin_root = os.path.join(out, "_lineage")
    meta_root = os.path.join(out, "_meta")
    vg = [f for f in os.listdir(lin_root) if f.startswith("group-v")]
    assert vg, "vacuum produced no replacement groups"
    # simulate the crash: drop one replacement's commit marker AND its
    # supersedes file, and restore the delete sidecar set (the crash
    # happens BEFORE sidecar retirement)
    victim = vg[0][len("group-"):-len(".parquet")]
    os.remove(os.path.join(lin_root, f"group-{victim}.parquet"))
    os.remove(os.path.join(meta_root, f"group-{victim}.supersedes.json"))
    delete_where(out, ("n_tok", ">=", med))  # masks in force again
    assert decode_corpus(out).count() == want  # old group + mask serves
    res = vacuum_deletes(out)  # re-run converges
    assert res["retired_deletes"] >= 1
    assert decode_corpus(out).count() == want
    assert deleted_row_count(out) == 0


def test_vacuum_emptied_group_reads_fine(ray_session, tmp_path):
    """A group whose every row is deleted vacuums to an EMPTY
    replacement (its lineage marker exists only to carry the
    supersedes shadow); every read path — full decode, projected
    decode, pushdowns — must skip it, not crash on its empty
    manifest.  Regression: the m10 lifecycle bench hit IndexError in
    the projection probe."""
    from colonnade_ray.corpus import synth_rows

    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    os.makedirs(inp)
    tabs = []
    for i in range(3):
        t = synth_rows(100, seed=5000 + i, start_id=i * 100)
        pq.write_table(t, os.path.join(inp, f"part-{i}.parquet"))
        tabs.append(t)
    orig = pa.concat_tables(tabs)
    encode_corpus(inp, out, batch_size=64, resume=False, group_size=1)
    # doc_ids are fragment-contiguous: this wipes group 0 entirely
    delete_where(out, ("doc_id", "<=", "doc-0000000099"))
    vacuum_deletes(out)
    live = orig.slice(100)
    # projected decode (the crashing path), full decode, pushdowns
    proj = decode_corpus(out, columns=["n_tok"])
    assert sorted(r["n_tok"] for r in proj.take_all()) == \
        sorted(live["n_tok"].to_pylist())
    assert decode_corpus(out, verify_checksum=True).count() == 200
    assert count_where(out, ("n_tok", ">=", 0)) == 200
    assert aggregate_where(out, "sum", "n_tok") == \
        int(np.sum(live["n_tok"].to_numpy()))
    # wipe EVERYTHING: decode of a fully-empty corpus is empty, not
    # an error
    delete_where(out, ("n_tok", ">=", 0))
    vacuum_deletes(out)
    assert decode_corpus(out, columns=["n_tok"]).count() == 0
    assert decode_corpus(out).count() == 0
    assert count_where(out, ("n_tok", ">=", 0)) == 0
    # every aggregate entry point answers on the wiped corpus too
    assert aggregate_where(out, "sum", "n_tok") is None  # SQL: NULL
    gc_df = group_counts(out, "source")
    assert len(gc_df) == 0 and list(gc_df.columns) == ["source", "n_rows"]
