"""Executed-plan metric extraction: what the query actually MOVED.

Wall-clock benchmarks are noisy; shuffle volume is the thing that
predicts 100 TB behavior and it is (near-)deterministic for a fixed
input — partial-aggregate output per map partition, broadcast-join
build sizes, exchange byte counts. `shuffle_summary` executes a frame
and walks the final adaptive plan (descending into AQE query stages)
summing the Exchange write metrics, so tests can pin a SHUFFLE BYTE
BUDGET the way they pin plan shapes: a regression that silently turns
a map-side partial agg into a full-row shuffle fails the budget even
though results and plan keywords stay identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def shuffle_summary(df: DataFrame) -> dict:
    """Execute ``df`` (collect, results discarded) and return totals
    over every Exchange in the final executed plan:
    {"records": shuffleRecordsWritten, "bytes": shuffleBytesWritten,
    "exchanges": count, "rows": len(result)}."""
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    # AdaptiveSparkPlanExec holds the final plan behind executedPlan()
    if plan.nodeName().startswith("AdaptiveSparkPlan"):
        plan = plan.executedPlan()
    totals = {"records": 0, "bytes": 0, "exchanges": 0, "rows": len(rows)}

    def walk(node) -> None:
        m = node.metrics()
        it = m.iterator()
        is_exchange = node.nodeName().startswith("Exchange")
        if is_exchange:
            totals["exchanges"] += 1
        while it.hasNext():
            kv = it.next()
            if not is_exchange:
                continue
            if kv._1() == "shuffleRecordsWritten":
                totals["records"] += kv._2().value()
            elif kv._1() == "shuffleBytesWritten":
                totals["bytes"] += kv._2().value()
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        # AQE materializes exchanges inside query-stage wrappers
        if "QueryStage" in node.nodeName():
            try:
                walk(node.plan())
            except Exception:
                pass

    walk(plan)
    return totals
