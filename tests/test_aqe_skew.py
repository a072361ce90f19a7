"""AQE skew-join witness: the runtime re-plan path that handles hot
keys WITHOUT manual salting (the copair_counts_salted twin covers the
spelling you use when you must control it yourself; this pins that
Spark's own skew splitting actually engages under this engine's
session). At cluster scale the same mechanism splits a 256 MB+ hot
partition across tasks — here the thresholds are scaled down to make
the local fixture trip it, which is exactly how the feature is
config-driven in production too."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F


@contextmanager
def _scoped_conf(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        try:
            old[key] = spark.conf.get(key)
        except Exception:
            old[key] = None
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        # force a sort-merge join — skew splitting is an SMJ/SHJ feature
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    kv = {k.replace(".", "__"): v for k, v in confs.items()}
    with _scoped_conf(spark, **kv):
        # 90% of the left side lands on key 0 → one hot shuffle
        # partition well past factor×median
        left = spark.range(0, 120_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        right = spark.range(0, 97).select(
            F.col("id").alias("k"),
            F.sha2((F.col("id") + 7).cast("string"), 256).alias("dim"),
        )
        # keep the wide payload columns live through the agg so column
        # pruning can't shrink the hot partition below the threshold
        joined = left.join(right, "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.max("payload").alias("mp"),
            F.max("dim").alias("md"),
        )
        [row] = joined.collect()
        assert row["n"] == 120_000  # every left row has a dim match
        # the FINAL adaptive plan (post-execution) must mark the hot
        # partition as skew-split
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew" in final_plan.lower(), final_plan[:2000]
