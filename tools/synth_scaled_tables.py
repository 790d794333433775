"""Deterministic Kx upscale of the driver testdata tables (scale proof).

Produces `{out}/{table}.parquet` shaped exactly like
`/root/testdata/sf0.1`, K times the rows, with KNOWN result structure
so the heavyweight operators can be verified at scale, not just timed:

- documents: K copies under per-copy DISJOINT VOCABULARIES (copy k
  renames every word w -> f"{w}{k}"; the source vocab is 31 plain
  alpha words, so renamed words collide with nothing).  Word k-gram
  shingle sets are therefore fully disjoint across copies while every
  within-copy count is preserved exactly, which pins the scaled
  answers in closed form: near-dup pair / component / keep counts
  come out exactly K times the sf0.1 counts, per-doc LM-commonness
  scores EQUAL the sf0.1 scores (gram corpus counts are unchanged),
  and every collocation reappears K times with its original count and
  K-scaled lift.
- embeddings: K copies under per-copy random ORTHOGONAL ROTATIONS
  (QR of a seeded Gaussian).  Rotation preserves every within-copy
  cosine exactly (441 pairs per copy at the 0.42 threshold);
  cross-copy cosines fall to the random-direction background, whose
  tail DOES add genuine extra pairs — so the scale check for
  embeddings is exact recall/precision against a driver-side
  brute-force over the full scaled corpus, not a Kx count.
- customer / supplier / orders / lineitem: K copies with key offsets
  (each copy a disjoint key range, identical value distributions), so
  join fan-out per copy is unchanged and Q5-shaped revenue per nation
  is exactly K times the sf0.1 answer.
- nation / region / part / events: copied as-is (dimension tables).

Seeded, no external data.  Usage:
    python tools/synth_scaled_tables.py --out /tmp/sf1_tables --mult 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DEFAULT_SRC = "/root/testdata/sf0.1"


def scale_documents(out: str, mult: int, seed: int, src: str = DEFAULT_SRC) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    texts = t["text"].to_pylist()
    vocab = sorted({w for s in texts for w in s.split()})
    if any(any(c.isdigit() for c in w) for w in vocab):
        raise ValueError("source vocab has digits: suffix renames could "
                         "collide across copies")
    n = t.num_rows
    parts = []
    for k in range(mult):
        perm = {w: (w if k == 0 else f"{w}{k}") for w in vocab}
        new_texts = [" ".join(perm[w] for w in s.split()) for s in texts]
        parts.append(pa.table({
            "doc_id": pc.add(t["doc_id"], pa.scalar(k * n, pa.int64())),
            "text": pa.array(new_texts, pa.string()),
            "lang": t["lang"],
            "source": t["source"],
            "n_chars": pa.array([len(s) for s in new_texts], pa.int64()),
        }))
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out, "documents.parquet"),
                   row_group_size=10_000)


def scale_embeddings(out: str, mult: int, seed: int, src: str = DEFAULT_SRC) -> None:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    n = t.num_rows
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    rng = np.random.default_rng(seed + 1)
    parts = []
    for k in range(mult):
        if k == 0:
            rot = vecs
        else:
            q, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
            rot = (vecs @ q.astype(np.float32))
        parts.append(pa.table({
            "vec_id": pc.add(t["vec_id"], pa.scalar(k * n, pa.int64())),
            "embedding": pa.array(list(rot), pa.list_(pa.float32())),
            "label": t["label"],
        }))
    pq.write_table(pa.concat_tables(parts),
                   os.path.join(out, "embeddings.parquet"),
                   row_group_size=4_000)


def _offset(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(off, pa.int64())).cast(col.type)


def scale_tpch(out: str, mult: int, src: str = DEFAULT_SRC) -> None:
    cust = pq.read_table(os.path.join(src, "customer.parquet"))
    supp = pq.read_table(os.path.join(src, "supplier.parquet"))
    orders = pq.read_table(os.path.join(src, "orders.parquet"))
    li = pq.read_table(os.path.join(src, "lineitem.parquet"))
    span_c = int(pc.max(cust["c_custkey"]).as_py()) + 1
    span_s = int(pc.max(supp["s_suppkey"]).as_py()) + 1
    span_o = int(pc.max(orders["o_orderkey"]).as_py()) + 1

    def tiled(t: pa.Table, offsets: dict) -> pa.Table:
        parts = []
        for k in range(mult):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in offsets and k:
                    col = _offset(col, k * offsets[name])
                cols[name] = col
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    pq.write_table(tiled(cust, {"c_custkey": span_c}),
                   os.path.join(out, "customer.parquet"),
                   row_group_size=50_000)
    pq.write_table(tiled(supp, {"s_suppkey": span_s}),
                   os.path.join(out, "supplier.parquet"),
                   row_group_size=50_000)
    pq.write_table(tiled(orders, {"o_orderkey": span_o, "o_custkey": span_c}),
                   os.path.join(out, "orders.parquet"),
                   row_group_size=100_000)
    pq.write_table(
        tiled(li, {"l_orderkey": span_o, "l_suppkey": span_s}),
        os.path.join(out, "lineitem.parquet"),
        row_group_size=200_000)


def copy_dims(out: str, src: str = DEFAULT_SRC) -> None:
    for name in ("nation", "region", "part", "events"):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(out, f"{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1_tables")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--src", default=DEFAULT_SRC)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    scale_documents(args.out, args.mult, args.seed, args.src)
    scale_embeddings(args.out, args.mult, args.seed, args.src)
    scale_tpch(args.out, args.mult, args.src)
    copy_dims(args.out, args.src)
    for f in sorted(os.listdir(args.out)):
        p = os.path.join(args.out, f)
        print(f, pq.ParquetFile(p).metadata.num_rows,
              f"{os.path.getsize(p) / 2**20:.1f} MiB")


if __name__ == "__main__":
    main()
