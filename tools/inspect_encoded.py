"""Inspect an encoded corpus directory: lineage summary, codec-win
histogram, zone-map ranges — pure footer/manifest reads, no Ray
session and no payload decode.

Usage: PYTHONPATH=/root/repo python tools/inspect_encoded.py <out_dir>
       [--column NAME]   show that column's zone-map range per chunk
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="inspect a colonnade_ray encode output")
    ap.add_argument("out_dir")
    ap.add_argument("--column", help="print this column's per-chunk zone map")
    ap.add_argument("--limit", type=int, default=20)
    args = ap.parse_args(argv)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from colonnade_ray.state.lineage import lineage_report, load_lineage

    print(lineage_report(args.out_dir, limit=args.limit))

    t = load_lineage(args.out_dir)
    if args.column and "stats_json" in t.column_names and t.num_rows:
        print(f"\nzone map for {args.column!r} (chunk -> [min, max]):")
        shown = 0
        for cid, sj in zip(t["chunk_id"].to_pylist(), t["stats_json"].to_pylist()):
            stats = json.loads(sj) if sj else {}
            if args.column in stats:
                extra = ""
                nn = stats.get("__nulls__", {}).get(args.column)
                ss = stats.get("__sums__", {}).get(args.column)
                if nn:
                    extra += f"  nulls={nn}"
                if ss is not None:
                    extra += f"  sum={ss}"
                # sketches riding the stats channel (round-4/5)
                if args.column in stats.get("__bloom__", {}):
                    extra += "  bloom={m}b".format(
                        m=stats["__bloom__"][args.column]["m"])
                if args.column in stats.get("__hll__", {}):
                    extra += "  hll=p{p}".format(
                        p=stats["__hll__"][args.column]["p"])
                qe = stats.get("__quant__", {}).get(args.column)
                if qe is not None:
                    extra += f"  quant={len(qe['s'])}pt/n={qe['n']}"
                print(f"  {cid}: {stats[args.column]}{extra}")
                shown += 1
                if shown >= args.limit:
                    print(f"  ... ({t.num_rows - shown} more chunks)")
                    break
        if shown == 0:
            print("  (no stats recorded for that column)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
