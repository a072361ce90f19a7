"""Sketch-based approximate variants (X5's at-scale path).

The exact forms (count distinct, percentile) are oracle-checked in
eventstream.py / relational.py; these sketch versions are what actually
runs at 100 TB — HLL++ and KLL-ish quantile sketches are mergeable, so
they partial-aggregate map-side and shuffle O(sketch) bytes instead of
O(distinct values). Sketch internals are engine-specific, so the driver
records rows-only checks here (no oracle) — the exact twins pin
correctness, these pin scalability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]


def approx_distinct_users(t: Tables) -> DataFrame:
    """HLL++ distinct users per event type (rsd 1%) next to the exact
    count so the error is visible in the output."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


def approx_value_quantiles(t: Tables) -> DataFrame:
    """percentile_approx (accuracy 10k) — single-pass mergeable sketch."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("q"),
        )
        .select(
            "event_type",
            F.col("q").getItem(0).alias("p25"),
            F.col("q").getItem(1).alias("p50"),
            F.col("q").getItem(2).alias("p75"),
        )
    )
