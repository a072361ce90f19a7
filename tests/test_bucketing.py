"""Bucketed co-located join (SURVEY §2 S12's nearest Spark analog, and
the core 100 TB join strategy): two tables bucketed on the join key join
WITHOUT any shuffle — the scan itself provides the partitioning."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse_spark(tmp_path):
    # isolated metastore/warehouse so saveAsTable works without hive
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="bucketing-test", shuffle_partitions=4)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'")
    yield spark
    spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_bucketed_join_eliminates_shuffle(warehouse_spark, tmp_path):
    spark = warehouse_spark
    orders = spark.range(1000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("o_custkey")
    )
    lines = spark.range(4000).select(
        (F.col("id") % 1000).alias("l_orderkey"),
        (F.col("id") % 17).alias("l_partkey"),
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bkt.orders_b")
    )
    (
        lines.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bkt.lines_b")
    )
    # force a non-broadcast join so the shuffle question is real
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt.lines_b").join(
            spark.table("bkt.orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # bucketed scan feeds the sort-merge join directly: no Exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
