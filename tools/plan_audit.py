"""Physical-plan feature census over the whole registry.

Optimization-round triage tool: wall-clock on a contended box lies, but
plan shape does not. For every registry query (or --only subset) at
--sf, count the plan features that predict cost at scale — Exchange,
SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin /
BroadcastNestedLoopJoin, Window, global Sort, Python eval nodes,
parquet scans — plus the number of scans per input table (re-scan
multiplicity = missed reuse) and plan size. Emits JSON to --out.

    python -m tools.plan_audit --sf /root/testdata/sf0.1 \
        --out /tmp/plan_audit.json
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FEATURES = [
    "Exchange",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Window",
    "WindowGroupLimit",
    "Sort",
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInArrow",
    "PythonMapInArrow",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "HashAggregate",
    "SortAggregate",
    "Generate",
    "Scan parquet",
    "Scan ExistingRDD",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from data_engineering_course_project_2023_spark.plans import registry
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    names = (
        [n for n in args.only.split(",") if n in registry.REGISTRY]
        if args.only
        else list(registry.REGISTRY)
    )
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"plan_audit: {name}")
        try:
            df = registry.run_query(name, spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # scale guards etc. — record, keep going
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        feats = {f: plan.count(f) for f in FEATURES}
        # ADVICE r11: substring counting made every "PythonMapInArrow"
        # occurrence also count as "MapInArrow"; subtract so the
        # MapInArrow row reports only genuine standalone nodes. (Other
        # features keep substring semantics on purpose — e.g.
        # "Exchange" deliberately includes ReusedExchange, and prior
        # rounds' audits are counted that way.)
        feats["MapInArrow"] -= feats["PythonMapInArrow"]
        # Sort nodes that are not inside a SortMergeJoin prelude are
        # interesting; raw count still recorded, refined offline.
        feats["plan_chars"] = len(plan)
        # per-table parquet scan multiplicity
        scans: dict[str, int] = {}
        for m in re.finditer(r"Scan parquet[^\n]*\[file:[^\]]*/(\w+)\.parquet", plan):
            scans[m.group(1)] = scans.get(m.group(1), 0) + 1
        if not scans:
            for m in re.finditer(r"Location:.*?/(\w+)\.parquet", plan):
                scans[m.group(1)] = scans.get(m.group(1), 0) + 1
        feats["table_scans"] = scans
        out[name] = feats
        # flush incrementally so a crash keeps partial results
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"audited {len(out)} queries -> {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
