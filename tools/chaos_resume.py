"""Chaos proof of exact resume at 10x bench scale.

The north rule requires the job be "resumable from checkpoint with
per-partition lineage + metrics".  Unit tests prove the marker
machinery on toy corpora; this tool proves it the way an operator
would trust it: SIGKILL the whole encode job (driver + raylet, the
entire process group) while commit groups are mid-flight, re-run the
identical command with resume=True, and verify the final corpus is
bit-identical to the unkilled answer.

Protocol
  1. child A (own process group, own Ray session): encode the m10
     corpus as `--groups` commit groups, 2 concurrent.
  2. parent polls out_dir/_lineage; when >= --kill-after groups have
     committed, SIGKILL child A's process group (no cleanup runs —
     torn group dirs and half-written parquet stay on disk).
  3. child B: the same command, resume=True.  Its summary must show
     every group either resumed (committed survivors) or re-encoded.
  4. verify: decode digest over the resumed corpus == digest of the
     raw input corpus (bit-identical per row), and lineage holds each
     input fragment exactly once.

Prints ONE JSON line (quoted in BASELINE.md).

Usage: python tools/chaos_resume.py [--mult 10] [--cpus 32]
           [--groups 10] [--kill-after 3]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("COLONNADE_EFFECTIVE_CPUS", "16")
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from colonnade_ray.pipelines import encode_corpus
s = encode_corpus({corpus!r}, {out!r}, batch_size=8192,
                  group_size={group_size}, max_concurrent_groups=2,
                  resume=True)
print("CHILD_SUMMARY " + json.dumps(
    {{k: s[k] for k in ("groups", "resumed_groups", "rows", "tokens")}}))
ray.shutdown()
"""


def committed_groups(out_dir: str) -> int:
    lin = os.path.join(out_dir, "_lineage")
    if not os.path.isdir(lin):
        return 0
    return sum(1 for f in os.listdir(lin)
               if f.startswith("group-") and f.endswith(".parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--groups", type=int, default=10)
    ap.add_argument("--kill-after", type=int, default=3)
    args = ap.parse_args()

    corpus = f"/tmp/colonnade_bench/corpus-sf0.1-m{args.mult}"
    out = f"/tmp/colonnade_bench/chaos-m{args.mult}"
    import shutil

    shutil.rmtree(out, ignore_errors=True)

    n_files = sum(1 for f in os.listdir(corpus) if f.endswith(".parquet"))
    group_size = max(1, (n_files + args.groups - 1) // args.groups)
    code = CHILD.format(repo=REPO, cpus=args.cpus, corpus=corpus, out=out,
                        group_size=group_size)

    # --- run A: kill the whole process group mid-flight -------------
    t0 = time.time()
    a = subprocess.Popen([sys.executable, "-c", code], start_new_session=True,
                         stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    target = args.kill_after
    while a.poll() is None and committed_groups(out) < target:
        time.sleep(0.25)
    survivors = committed_groups(out)
    killed_running = a.poll() is None
    if killed_running:
        os.killpg(os.getpgid(a.pid), signal.SIGKILL)  # driver AND raylet, no cleanup
        a.wait()
    kill_s = round(time.time() - t0, 1)
    # torn state on disk right after the kill
    data_dirs = len(os.listdir(os.path.join(out, "data"))) \
        if os.path.isdir(os.path.join(out, "data")) else 0

    # --- run B: identical command, resume=True ----------------------
    t0 = time.time()
    b = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    resume_s = round(time.time() - t0, 1)
    summary = {}
    for line in b.stdout.splitlines():
        if line.startswith("CHILD_SUMMARY "):
            summary = json.loads(line[len("CHILD_SUMMARY "):])
    failures = []
    if b.returncode != 0:
        failures.append("resume run failed: " + b.stderr[-2000:])
    if summary.get("resumed_groups", 0) != survivors:
        failures.append(
            f"resumed_groups {summary.get('resumed_groups')} != "
            f"{survivors} committed survivors")

    # --- verify: bit-identical to the raw input + lineage complete --
    os.environ.setdefault("COLONNADE_EFFECTIVE_CPUS", "16")
    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from colonnade_ray.pipelines import decode_digest_corpus
    from colonnade_ray.stages.verify import dataset_digest

    cols = ["doc_id", "tokens", "n_tok", "source"]
    t0 = time.time()
    dec_digest = decode_digest_corpus(out, cols)
    orig_digest = dataset_digest(rd.read_parquet(corpus), cols)
    verify_s = round(time.time() - t0, 1)
    if dec_digest != orig_digest:
        failures.append("decode digest != original corpus digest")

    lin = pq.read_table(os.path.join(out, "_lineage"))
    n_parts = lin.num_rows
    n_frags = len(pc.unique(lin["fragment"]))
    lin_rows = int(pc.sum(lin["n_rows"]).as_py())
    in_rows = sum(pq.ParquetFile(os.path.join(corpus, f)).metadata.num_rows
                  for f in os.listdir(corpus) if f.endswith(".parquet"))
    if n_frags != n_files:
        failures.append(f"lineage covers {n_frags} fragments != {n_files}")
    if lin_rows != in_rows:
        failures.append(f"lineage rows {lin_rows} != input rows {in_rows} "
                        "(duplicate or lost partitions)")
    ray.shutdown()

    print(json.dumps({
        "metric": "chaos resume at 10x scale (SIGKILL mid-encode)",
        "mult": args.mult,
        "input_files": n_files,
        "groups": args.groups,
        "committed_before_kill": survivors,
        "killed_while_running": killed_running,
        "data_dirs_on_disk_after_kill": data_dirs,
        "kill_run_sec": kill_s,
        "resume_run_sec": resume_s,
        "resume_summary": summary,
        "verify_sec": verify_s,
        "roundtrip_match": dec_digest == orig_digest,
        "lineage_partitions": n_parts,
        "lineage_fragments": n_frags,
        "lineage_rows_match_input": lin_rows == in_rows,
        "all_verified": not failures,
        "failures": failures,
    }))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
