"""One-shot shuffle-volume census: run every registry query at
$SPARK_GRAFT_SF_DIR and record what each one MOVED (Exchange
shuffleBytes/RecordsWritten from the final adaptive plan) next to its
output row count — the scale evidence wall-clock can't give. Writes
SHUFFLE_LOCAL.json; see plans/metrics.py and tests/test_shuffle_budget.py
for the pinned budget subset."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_course_project_2023_spark.plans import metrics, registry  # noqa: E402
from data_engineering_course_project_2023_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="shuffle_report")
    out: dict[str, dict] = {}
    for name in sorted(registry.REGISTRY):
        try:
            # count()-shaped execution: wrap in a global count so huge
            # result sets never hit the driver; adds one 1-row exchange
            df = registry.run_query(name, spark, sf_dir)
            s = metrics.shuffle_summary(df.groupBy().count())
            s["exchanges"] = max(0, s["exchanges"] - 1)  # drop the count agg
            del s["rows"]
            out[name] = s
        except Exception as e:  # pragma: no cover
            out[name] = {"err": str(e)[:120]}
    doc = {
        "sf_dir": sf_dir,
        "queries": out,
        "total_bytes": sum(v.get("bytes", 0) for v in out.values()),
        "total_records": sum(v.get("records", 0) for v in out.values()),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "SHUFFLE_LOCAL.json"), "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({"n": len(out), "total_mb": round(doc["total_bytes"] / 1e6, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
