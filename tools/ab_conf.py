"""Ad-hoc same-box A/B of a session conf over a query subset.

Usage:
  python -m tools.ab_conf --queries a,b,c --conf k=v[,k=v...] [--sf DIR] [--runs 2]

Runs each query min-of-N with the session built with the given conf
overrides and prints one JSON line. Run it twice (two processes, two
configs) back-to-back for an A/B; a third interleaved round makes it
ABAB. Measurement only — never writes bench docs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    # repeatable k=v flags (ADVICE r11: a single comma-split string
    # silently truncated conf values containing commas); a comma-joined
    # list per flag still parses when every piece is k=v shaped.
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    extra = {}
    for flag in args.conf:
        parts = flag.split(",") if all(
            "=" in p for p in flag.split(",")
        ) else [flag]
        for kv in filter(None, parts):
            k, _, v = kv.partition("=")
            extra[k] = v

    from data_engineering_course_project_2023_spark.plans import registry
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="ab_conf", extra_conf=extra)
    # warm-up
    registry.run_query("star_revenue_by_region_year", spark, args.sf).count()

    out = {}
    for name in args.queries.split(","):
        spark.sparkContext.setJobDescription(f"ab:{name}")
        best = None
        for _ in range(args.runs):
            t0 = time.perf_counter()
            registry.run_query(name, spark, args.sf).count()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"conf": extra, "queries": out,
                      "total": round(sum(out.values()), 3)}))


if __name__ == "__main__":
    main()
