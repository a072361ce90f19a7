"""Temporal join operators Spark lacks as primitives (north-star custom
ops): as-of join and range join, spelled so they scale.

- As-of join (last value at or before each timestamp): the naive
  formulation is a per-row correlated subquery; the distributed spelling
  is union-tag + one window pass — shuffle once on the partition key,
  sort within partition, `last(ignorenulls)` over the preceding frame.
  O(n log n) per key group, no join explosion at all.

- Range join (pairs within a time distance): Spark plans a raw
  inequality join as BroadcastNestedLoopJoin — quadratic. The scale
  spelling buckets time into `width`-sized bins; candidates share a bin
  or neighbor bin (equi-join on bin key → bounded shuffle), then the
  exact predicate filters. Standard interval-join layout (Flink's
  interval join / bucketized range join in warehouse engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.right_ts <= left.left_ts`` within the same ``on`` key.

    Union-tag spelling: right rows carry their values, left rows carry
    nulls; one window sorted by (ts, side) with `last(ignorenulls)`
    propagates the most recent right value onto every left row. Ties
    (right.ts == left.ts) resolve to the right row (side orders r < l).
    """
    lt = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    rt = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.lit(None).cast(lt.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = lt.unionByName(rt)
    filled = tagged.select(
        on, "_ts", "_side", "_lrow",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    return filled.filter(F.col("_side") == 1).select(
        *out_cols, *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_gap_seconds: int,
    condition: Column | None = None,
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps are
    within ``max_gap_seconds`` of each other (|lt - rt| <= gap).

    Bin width = gap → any qualifying pair sits in the same or adjacent
    bin, so each left row probes exactly 3 bin keys (explode of [-1,0,1])
    and the join is a plain equi-join on (key, bin): shuffle bounded by
    data × 3, never quadratic. The exact |Δt| predicate then filters.
    """
    width = int(max_gap_seconds)
    lbin = (F.unix_timestamp(F.col(left_ts)) / width).cast("long")
    rbin = (F.unix_timestamp(F.col(right_ts)) / width).cast("long")
    probes = left.withColumn(
        "_bin", F.explode(F.array(lbin - 1, lbin, lbin + 1))
    )
    build = right.withColumn("_bin", rbin)
    joined = probes.join(build, [on, "_bin"]).filter(
        F.abs(
            F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))
        )
        <= max_gap_seconds
    )
    if condition is not None:
        joined = joined.filter(condition)
    return joined.drop("_bin")
