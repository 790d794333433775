"""Cluster job entry point for metadata-first corpus analytics.

The aggregate twin of decode_job.py: answer COUNT / MIN / MAX / SUM
(optionally under predicates) or a per-group rollup over a committed
encode output WITHOUT materializing rows — zone-map no-match chunks
are free, proven chunks answer from the `__nulls__`/`__sums__` stats
entries, only boundary chunks decode (predicate/target columns only).

    ray job submit --working-dir /path/to/repo -- \
        python tools/analyze_job.py --input /corpus/encoded \
        --agg count --where 'n_tok>=400'
    python tools/analyze_job.py --input ENC --agg sum --col n_tok
    python tools/analyze_job.py --input ENC --group-by source --col n_tok

Prints one JSON line; exit 0 iff the query completed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from decode_job import _on_cluster, parse_predicate  # noqa: E402


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="colonnade_ray corpus analytics job")
    ap.add_argument("--input", required=True, help="encode output root")
    ap.add_argument("--agg", default=None,
                    choices=["count", "min", "max", "sum"],
                    help="scalar aggregate (omit with --group-by)")
    ap.add_argument("--col", default=None,
                    help="target column (required for min/max/sum and "
                         "optional sum column for --group-by)")
    ap.add_argument("--group-by", default=None,
                    help="per-group rollup column (metadata-first on "
                         "partition-aligned corpora)")
    ap.add_argument("--where", action="append", default=[],
                    help="predicate col<op>value; repeatable, AND'd")
    args = ap.parse_args(argv)
    if args.group_by is None and args.agg is None:
        ap.error("need --agg or --group-by")
    if args.agg in ("min", "max", "sum") and not args.col:
        ap.error(f"--agg {args.agg} needs --col")
    if args.group_by and args.where:
        ap.error("--group-by does not take --where (rollups are whole-corpus)")

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, ignore_reinit_error=True)

    from colonnade_ray.pipelines import aggregate_where, count_where, group_counts

    preds = [parse_predicate(w) for w in args.where] or None
    t0 = time.time()
    out: dict = {"input": args.input,
                 "predicates": [list(p) for p in (preds or [])]}
    if args.group_by:
        df = group_counts(args.input, args.group_by, args.col)
        out["group_by"] = args.group_by
        out["groups"] = df.to_dict(orient="records")
    elif args.agg == "count":
        out["count"] = count_where(args.input, preds) if preds else None
        if out["count"] is None:
            from colonnade_ray.pipelines import corpus_summary

            out["count"] = corpus_summary(args.input)["rows"]
    else:
        out[args.agg] = aggregate_where(args.input, args.agg, args.col,
                                        predicate=preds)
    out["sec"] = round(time.time() - t0, 3)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
