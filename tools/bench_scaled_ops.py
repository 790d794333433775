"""10x-scale runs of the five most expensive operators, each VERIFIED.

Companion to synth_scaled_tables.py (which constructs /tmp/sf1_tables
so every scaled answer is known in closed form).  One warm Ray
session; prints ONE JSON line with per-op wall seconds + the exact
verification each op passed:

- dedup_keep / near_dup_pairs: pair count must be exactly MULT x the
  sf0.1 count (disjoint per-copy vocabularies), the kept-id count
  MULT x, and every copy's kept set (mod 5000) must equal the sf0.1
  kept set.
- embedding_near_dups_lsh: exact recall AND precision 1.0 against a
  driver-side float64 brute force over the full scaled corpus (the
  rotation construction adds genuine cross-copy pairs, so a count
  check would be wrong — truth is recomputed, not assumed).
- lm_commonness: every scaled doc's score must EQUAL (float64
  bit-equality) an independent pandas reference computed driver-side
  — per-copy gram counts are preserved exactly, so the engine's
  distributed two-pass must reproduce the single-process answer.
- collocations: every returned row's (n_ab, lift) must match an
  independent driver-side full bigram table, and every returned lift
  must be >= the reference's k-th highest (tie-robust top-k check).
- local_supplier_volume: value-exact match against DuckDB running the
  registered oracle SQL over the same scaled tables (the driver's
  correctness gate, applied at 10x).

Usage: python tools/bench_scaled_ops.py [--dir /tmp/sf1_tables]
           [--sf01 /root/testdata/sf0.1] [--mult 10] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(1 << 30))
os.environ.setdefault("COLONNADE_EFFECTIVE_CPUS", "16")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_WORD = re.compile(r"[a-z0-9]+")


def _ref_doc_words(doc_dir: str) -> pd.Series:
    t = pq.read_table(os.path.join(doc_dir, "documents.parquet"),
                      columns=["doc_id", "text"])
    s = pd.Series(t["text"].to_pylist(),
                  index=t["doc_id"].to_numpy()).str.lower()
    return s.str.findall(_WORD)


def ref_lm_commonness(words: pd.Series, n: int = 2) -> pd.Series:
    """Single-process reference of functions.text.lm_commonness."""
    grams: dict = {}
    doc_grams: list = []
    for did, ws in words.items():
        gs = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
        doc_grams.append((did, gs))
        for g in gs:
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for did, gs in doc_grams:
        if not gs:
            continue
        w = sum(grams[g] for g in gs)
        out[did] = np.float64(np.int64(w)) / np.int64(len(gs))
    return pd.Series(out)


def ref_collocations(words: pd.Series) -> pd.DataFrame:
    """Full bigram table with exact lift (no top-k)."""
    uni: dict = {}
    big: dict = {}
    for ws in words:
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    T = np.int64(sum(big.values()))
    rows = [(a, b, c, float(np.float64(T * np.int64(c))
                            / np.int64(uni[a] * uni[b])))
            for (a, b), c in big.items()]
    return pd.DataFrame(rows, columns=["w1", "w2", "n_ab", "lift"])


def ref_cosine_pairs(emb_path: str, threshold: float) -> set:
    t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    pairs = set()
    step = 2048
    for lo in range(0, len(ids), step):
        sims = m[lo:lo + step] @ m.T
        bi, j = np.nonzero(sims >= threshold)
        for x, y in zip(ids[lo + bi], ids[j]):
            if x < y:
                pairs.add((int(x), int(y)))
    return pairs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/sf1_tables")
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, REPO)
    import __ray_entry__ as entry

    qs = entry.queries()
    results: dict = {}
    failures: list = []

    def check(name: str, cond: bool, detail: str) -> None:
        if not cond:
            failures.append(f"{name}: {detail}")

    # ---- dedup_keep (+ the MULT x pair/keep-count invariants) ----
    t0 = time.time()
    kept_big = qs["dedup_keep"](args.dir).to_pandas()
    results["dedup_keep"] = {"sec": round(time.time() - t0, 1),
                             "rows": len(kept_big)}
    t0 = time.time()
    kept_small = qs["dedup_keep"](args.sf01).to_pandas()
    sf01_keep_sec = round(time.time() - t0, 1)
    n_small = 5000
    check("dedup_keep", len(kept_big) == args.mult * len(kept_small),
          f"{len(kept_big)} != {args.mult} x {len(kept_small)}")
    small_set = set(kept_small["doc_id"])
    ids = kept_big["doc_id"].to_numpy()
    for k in range(args.mult):
        copy = set(ids[(ids // n_small) == k] % n_small)
        check("dedup_keep", copy == small_set,
              f"copy {k} kept set differs from sf0.1 "
              f"({len(copy ^ small_set)} ids)")
    results["dedup_keep"]["verified"] = (
        f"== {args.mult} x sf0.1 ({len(kept_small)} rows, {sf01_keep_sec}s); "
        "every copy's kept set == sf0.1 kept set")

    t0 = time.time()
    pairs_big = qs["near_dup_pairs"](args.dir).to_pandas()
    results["near_dup_pairs"] = {"sec": round(time.time() - t0, 1),
                                 "rows": len(pairs_big)}
    pairs_small = qs["near_dup_pairs"](args.sf01).to_pandas()
    check("near_dup_pairs", len(pairs_big) == args.mult * len(pairs_small),
          f"{len(pairs_big)} != {args.mult} x {len(pairs_small)}")
    cross = ((pairs_big["id_a"] // n_small)
             != (pairs_big["id_b"] // n_small)).sum()
    check("near_dup_pairs", cross == 0, f"{cross} cross-copy pairs")
    results["near_dup_pairs"]["verified"] = (
        f"== {args.mult} x sf0.1 ({len(pairs_small)}), 0 cross-copy")

    # ---- embedding_near_dups_lsh vs driver-side brute force ----
    t0 = time.time()
    lsh = qs["embedding_near_dups_lsh"](args.dir).to_pandas()
    results["embedding_near_dups_lsh"] = {
        "sec": round(time.time() - t0, 1), "rows": len(lsh)}
    got = set(zip(lsh["id_a"].astype(int), lsh["id_b"].astype(int)))
    t0 = time.time()
    want = ref_cosine_pairs(os.path.join(args.dir, "embeddings.parquet"),
                            threshold=0.42)
    brute_sec = round(time.time() - t0, 1)
    check("embedding_near_dups_lsh", got == want,
          f"missing {len(want - got)}, extra {len(got - want)}")
    results["embedding_near_dups_lsh"]["verified"] = (
        f"recall+precision 1.0 vs {len(want)}-pair float64 brute force "
        f"({brute_sec}s driver-side)")

    # ---- lm_commonness vs single-process reference ----
    t0 = time.time()
    lm = qs["lm_commonness"](args.dir).to_pandas()
    results["lm_commonness"] = {"sec": round(time.time() - t0, 1),
                                "rows": len(lm)}
    ref01 = ref_lm_commonness(_ref_doc_words(args.sf01))
    got_s = pd.Series(lm["commonness"].to_numpy(),
                      index=lm["doc_id"].to_numpy())
    check("lm_commonness", len(got_s) == args.mult * len(ref01),
          f"{len(got_s)} rows != {args.mult} x {len(ref01)}")
    expected = ref01.reindex(got_s.index % n_small).to_numpy()
    exact = int((got_s.to_numpy() == expected).sum())
    check("lm_commonness", exact == len(got_s),
          f"only {exact}/{len(got_s)} scores bit-equal the reference")
    results["lm_commonness"]["verified"] = (
        f"{exact}/{len(got_s)} scores float64-bit-equal the independent "
        "single-process reference (copy-invariance exact)")

    # ---- collocations vs full driver-side bigram table ----
    t0 = time.time()
    coll = qs["collocations"](args.dir).to_pandas()
    results["collocations"] = {"sec": round(time.time() - t0, 1),
                               "rows": len(coll)}
    ref = ref_collocations(_ref_doc_words(args.dir))
    ref_ix = ref.set_index(["w1", "w2"])
    kth = np.sort(ref[ref["n_ab"] >= 5]["lift"].to_numpy())[-len(coll)]
    ok_rows = 0
    for r in coll.itertuples(index=False):
        try:
            e = ref_ix.loc[(r.w1, r.w2)]
        except KeyError:
            continue
        if int(e["n_ab"]) == int(r.n_ab) and float(e["lift"]) == float(r.lift) \
                and float(r.lift) >= kth:
            ok_rows += 1
    check("collocations", ok_rows == len(coll),
          f"only {ok_rows}/{len(coll)} rows match the reference table")
    results["collocations"]["verified"] = (
        f"{ok_rows}/{len(coll)} rows (n_ab, lift)-exact vs full reference "
        "bigram table; all lifts >= reference k-th lift")

    # ---- local_supplier_volume vs DuckDB oracle at 10x ----
    t0 = time.time()
    q5 = qs["local_supplier_volume"](args.dir).to_pandas()
    results["local_supplier_volume"] = {"sec": round(time.time() - t0, 1),
                                        "rows": len(q5)}
    import duckdb

    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "orders",
                 "lineitem"):
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM "
                    f"read_parquet('{args.dir}/{name}.parquet')")
    sql = entry.oracle_sql()["local_supplier_volume"]
    want_df = con.execute(sql).df()
    cols = sorted(q5.columns)
    a = q5[cols].sort_values(cols).reset_index(drop=True)
    b = want_df[cols].sort_values(cols).reset_index(drop=True)
    check("local_supplier_volume", a.equals(b),
          f"mismatch vs duckdb oracle\n{a}\n{b}")
    results["local_supplier_volume"]["verified"] = (
        "value-exact vs DuckDB oracle SQL over the scaled tables")

    out = {
        "metric": "10x-scale heavyweight ops, each verified",
        "dir": args.dir,
        "mult": args.mult,
        "num_cpus": args.cpus,
        "all_verified": not failures,
        "failures": failures,
        "ops": results,
    }
    ray.shutdown()
    print(json.dumps(out))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
