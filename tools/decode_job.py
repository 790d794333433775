"""Cluster job entry point for query-shaped corpus decode.

The read-side twin of encode_job.py: decode a committed encode output
back to parquet, optionally projected to a column subset and pruned by
zone-map predicates — the "extract these columns where X" pipeline a
corpus consumer runs without ever decompressing untouched payload
streams.

    ray job submit --working-dir /path/to/repo -- \
        python tools/decode_job.py --input /corpus/encoded \
        --output /tmp/slice --columns doc_id,n_tok \
        --where 'n_tok>=100' --where 'n_tok<512'

Predicates: `col<op>value` with op in ==, !=, >, >=, <, <= (values
parsed as int, then float, else string); multiple --where clauses are
AND'd, each pruning whole chunks via the lineage zone maps before the
exact filter.  Standalone (no cluster) it starts a local Ray; under a
job server it attaches to the running one.  Output is partitioned
parquet under --output; exit 0 iff the decode completed.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "PYTHONPATH", os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)  # Ray workers don't inherit driver sys.path mutations

_PRED_RE = re.compile(r"^\s*(\w+)\s*(==|!=|>=|<=|>|<)\s*(.+?)\s*$")


_IN_RE = re.compile(r"^\s*(\w+)\s+in\s+(.+?)\s*$", re.IGNORECASE)


def _coerce(raw: str):
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            continue
    return raw


_STR_RE = re.compile(
    r"^\s*(\w+)\s+(startswith|endswith|contains)\s+(.+?)\s*$",
    re.IGNORECASE)


def parse_predicate(expr: str) -> tuple:
    mi = _IN_RE.match(expr)
    if mi:  # 'col in 1,2,3' -> set-membership (zone-map OR prune)
        col, raw = mi.groups()
        return (col, "in", [_coerce(v.strip()) for v in raw.split(",")])
    ms = _STR_RE.match(expr)
    if ms:  # 'col startswith pre' -> prefix range prune; endswith /
        # contains are exact-only (metadata stays conservative)
        col, op, raw = ms.groups()
        return (col, op.lower(), raw)
    m = _PRED_RE.match(expr)
    if not m:
        raise SystemExit(
            f"bad --where {expr!r} (want col<op>value, col in a,b, "
            "or col startswith|endswith|contains text)")
    col, op, raw = m.groups()
    return (col, op, _coerce(raw))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="colonnade_ray corpus decode job")
    ap.add_argument("--input", required=True, help="encode output root")
    ap.add_argument("--output", required=True, help="decoded parquet dir")
    ap.add_argument("--columns", default=None,
                    help="comma-separated projection (default: all)")
    ap.add_argument("--where", action="append", default=[],
                    help="predicate col<op>value; repeatable, AND'd")
    ap.add_argument("--no-checksums", action="store_true",
                    help="skip checksum verification")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _on_cluster() else "local",
                 include_dashboard=False, ignore_reinit_error=True)

    from colonnade_ray.pipelines import decode_corpus

    cols = args.columns.split(",") if args.columns else None
    preds = [parse_predicate(w) for w in args.where] or None
    t0 = time.time()
    ds = decode_corpus(args.input, verify_checksum=not args.no_checksums,
                       columns=cols, predicate=preds)
    ds.write_parquet(args.output)
    n = ray.data.read_parquet(args.output).count()
    print(json.dumps({
        "rows": n,
        "columns": cols or "all",
        "predicates": [list(p) for p in (preds or [])],
        "decode_sec": round(time.time() - t0, 3),
        "output": args.output,
    }))
    return 0


def _on_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS") and os.environ["RAY_ADDRESS"] != "local")


if __name__ == "__main__":
    sys.exit(main())
