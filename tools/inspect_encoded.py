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
