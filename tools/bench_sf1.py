"""sf1-equivalent (10x bench) scale proof for the flagship pipeline.

Runs encode -> decode+digest -> roundtrip verify on a ~2M-row /
~840M-token synthetic F1 corpus (10x the sf0.1 bench input, the
"sf1" scale the round-3 verdict asked for) under a DELIBERATELY
small object store (default 3 GiB < the ~3.4 GB Arrow input), so
mere completion is evidence the pipeline streams: at no point can
the input, the exchange, or the output reside in the store at once.

A background sampler records, once a second:
  - node memory used (MemTotal - MemAvailable from /proc/meminfo)
  - driver RSS
  - raylet pinned-object bytes + spill counters (debug_state.txt,
    ~10 s refresh)

Prints ONE JSON line with wall times, throughput, compression,
roundtrip match, peak memory, and the spill counters — the numbers
quoted in BASELINE.md's BENCH_sf1 section.

Usage: python tools/bench_sf1.py [--mult 10] [--cpus 32] [--store-gb 3]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import shutil
import sys
import threading
import time

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("COLONNADE_EFFECTIVE_CPUS", "16")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _meminfo() -> dict:
    out = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            out[k] = int(v.strip().split()[0]) * 1024
    return out


def _driver_rss() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) * 1024
    return 0


def _raylet_state() -> dict:
    """Pinned/spill counters from the newest session's debug_state.txt."""
    paths = sorted(glob.glob("/tmp/ray/*/session_*/logs/debug_state.txt"),
                   key=os.path.getmtime, reverse=True)
    if not paths:
        return {}
    try:
        txt = open(paths[0]).read()
    except OSError:
        return {}
    out = {}
    for key, pat in [
        ("pinned_bytes", r"pinned objects size: (\d+)"),
        ("spilled_bytes", r"num bytes currently spilled: (\d+)"),
        ("spill_requests", r"cumulative spill requests: (\d+)"),
        ("restore_requests", r"cumulative restore requests: (\d+)"),
    ]:
        m = re.search(pat, txt)
        if m:
            out[key] = int(m.group(1))
    return out


class Sampler(threading.Thread):
    def __init__(self):
        super().__init__(daemon=True)
        self.stop = threading.Event()
        base = _meminfo()
        self.baseline_used = base["MemTotal"] - base["MemAvailable"]
        self.peak_used = self.baseline_used
        self.peak_driver_rss = 0
        self.peak_pinned = 0
        self.max_spilled = 0
        self.max_spill_requests = 0
        self.max_restores = 0

    def run(self):
        while not self.stop.is_set():
            m = _meminfo()
            self.peak_used = max(self.peak_used,
                                 m["MemTotal"] - m["MemAvailable"])
            self.peak_driver_rss = max(self.peak_driver_rss, _driver_rss())
            st = _raylet_state()
            self.peak_pinned = max(self.peak_pinned, st.get("pinned_bytes", 0))
            self.max_spilled = max(self.max_spilled, st.get("spilled_bytes", 0))
            self.max_spill_requests = max(self.max_spill_requests,
                                          st.get("spill_requests", 0))
            self.max_restores = max(self.max_restores,
                                    st.get("restore_requests", 0))
            self.stop.wait(1.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--store-gb", type=float, default=3.0)
    ap.add_argument("--keep-output", action="store_true")
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        object_store_memory=int(args.store_gb * (1 << 30)),
    )
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from colonnade_ray.corpus import synth_corpus
    from colonnade_ray.pipelines import (
        count_where,
        decode_corpus,
        decode_digest_corpus,
        encode_corpus,
    )
    from colonnade_ray.stages.verify import dataset_digest

    corpus_dir = f"/tmp/colonnade_bench/corpus-sf0.1-m{args.mult}"
    n_rows = 200_000 * args.mult
    t0 = time.time()
    synth_corpus(corpus_dir, n_rows, seed=42, rows_per_file=25_000)
    synth_s = round(time.time() - t0, 1)
    input_bytes = sum(
        os.path.getsize(os.path.join(corpus_dir, f))
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )

    out_dir = f"/tmp/colonnade_bench/sf1-enc-m{args.mult}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # untimed warm-up on a slice: spins up the worker pool and faults
    # its heap so the timed runs measure steady state (the sf0.1 bench
    # measures rep1 ~3x slower than rep3 for exactly this reason)
    shards = sorted(
        os.path.join(corpus_dir, f)
        for f in os.listdir(corpus_dir) if f.endswith(".parquet")
    )
    warm_dir = f"/tmp/colonnade_bench/sf1-warm-m{args.mult}"
    shutil.rmtree(warm_dir, ignore_errors=True)
    encode_corpus(shards[: max(2, len(shards) // 16)], warm_dir,
                  batch_size=8192, resume=False)
    cols = ["doc_id", "tokens", "n_tok", "source"]
    decode_digest_corpus(warm_dir, cols)
    shutil.rmtree(warm_dir, ignore_errors=True)

    sampler = Sampler()
    sampler.start()

    enc_reps = []
    for _ in range(args.repeats):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        summary = encode_corpus(corpus_dir, out_dir, batch_size=8192,
                                resume=False)
        enc_reps.append(round(time.time() - t0, 2))
    encode_s = min(enc_reps)

    dec_reps = []
    for _ in range(args.repeats):
        t0 = time.time()
        dec_digest = decode_digest_corpus(out_dir, cols)
        dec_reps.append(round(time.time() - t0, 2))
    decode_s = min(dec_reps)

    t0 = time.time()
    orig_digest = dataset_digest(rd.read_parquet(corpus_dir), cols)
    orig_s = round(time.time() - t0, 2)

    t0 = time.time()
    sel_rows = decode_corpus(out_dir, columns=["doc_id", "n_tok"],
                             predicate=[("n_tok", ">=", 400)]).count()
    sel_s = round(time.time() - t0, 2)
    t0 = time.time()
    cw = count_where(out_dir, ("n_tok", ">=", 400))
    cw_s = round(time.time() - t0, 2)

    from colonnade_ray.pipelines import approx_distinct, topk_where

    t0 = time.time()
    tk, tk_stats = topk_where(out_dir, "n_tok", k=10, tie_cols=["doc_id"],
                              return_stats=True)
    tk_s = round(time.time() - t0, 2)
    t0 = time.time()
    ad, ad_stats = approx_distinct(out_dir, "source", return_stats=True)
    ad_s = round(time.time() - t0, 2)

    sampler.stop.set()
    sampler.join()

    tokens = summary["tokens"]
    result = {
        "metric": "sf1-equivalent flagship (10x bench scale)",
        "mult": args.mult,
        "num_cpus": args.cpus,
        "object_store_gb": args.store_gb,
        "rows": summary["rows"],
        "tokens": tokens,
        "input_parquet_bytes": input_bytes,
        "bytes_in_arrow": summary["bytes_in"],
        "bytes_out": summary["bytes_out"],
        "bytes_per_token": round(summary["bytes_out"] / max(tokens, 1), 4),
        "synth_sec": synth_s,
        "encode_sec": encode_s,
        "encode_repeats_sec": enc_reps,
        "encode_tokens_per_sec": round(tokens / encode_s),
        "decode_digest_sec": decode_s,
        "decode_repeats_sec": dec_reps,
        "decode_tokens_per_sec": round(tokens / decode_s),
        "orig_digest_sec": orig_s,
        "roundtrip_match": bool(dec_digest == orig_digest),
        "selective_decode_sec": sel_s,
        "selective_rows": int(sel_rows),
        "count_where_sec": cw_s,
        "count_where_rows": int(cw),
        "count_where_match": bool(cw == sel_rows),
        "topk_sec": tk_s,
        "topk_chunks_candidate": tk_stats["chunks_candidate"],
        "topk_chunks_total": tk_stats["chunks_total"],
        "approx_distinct_sec": ad_s,
        "approx_distinct_est": round(float(ad), 1),
        "approx_distinct_scanned": ad_stats["chunks_scanned"],
        "mem": {
            "baseline_node_used_gb": round(sampler.baseline_used / 2**30, 2),
            "peak_node_used_gb": round(sampler.peak_used / 2**30, 2),
            "peak_delta_gb": round(
                (sampler.peak_used - sampler.baseline_used) / 2**30, 2),
            "peak_driver_rss_gb": round(sampler.peak_driver_rss / 2**30, 2),
            "peak_plasma_pinned_gb": round(sampler.peak_pinned / 2**30, 2),
            "max_spilled_bytes": sampler.max_spilled,
            "spill_requests": sampler.max_spill_requests,
            "restore_requests": sampler.max_restores,
        },
    }
    if not args.keep_output:
        shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
