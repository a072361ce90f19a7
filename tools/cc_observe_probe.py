"""Scratch probe: does folding the CC convergence aggregate into the
checkpoint job (df.observe + localCheckpoint) beat the current
two-jobs-per-round spelling (localCheckpoint, then sum agg)?

Run: python -m tools.cc_observe_probe [sf_dir]
"""

import sys
import time

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import analytics
from data_engineering_course_project_2023_spark.session import (
    iterative_shuffle_parts,
)


def observe_cc(t, max_iter=20):
    edges = analytics.coorder_adjacency(t["lineitem"]).localCheckpoint()
    nodes = t["lineitem"].select(F.col("l_partkey").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("lbl")).localCheckpoint()
    prev_sum = labels.agg(F.sum("lbl")).first()[0]
    spark = labels.sparkSession
    with iterative_shuffle_parts(spark, edges.count()):
        for i in range(max_iter):
            msgs = edges.join(labels, edges.src == labels.node).select(
                F.col("dst").alias("node"), "lbl"
            )
            obs = Observation(f"cc_{i}")
            labels = (
                labels.unionByName(msgs)
                .groupBy("node")
                .agg(F.min("lbl").alias("lbl"))
                .observe(obs, F.sum("lbl").alias("s"))
                .localCheckpoint()
            )
            new_sum = obs.get["s"]
            if new_sum == prev_sum:
                break
            prev_sum = new_sum
    return labels.select(
        F.col("node").alias("l_partkey"), F.col("lbl").alias("component")
    )


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("cc_probe")
        .getOrCreate()
    )
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, sf, ["lineitem"])
    # warm-up (codegen, scan caches)
    analytics.copair_components(t).count()
    for name, fn in [
        ("current", analytics.copair_components),
        ("observe", observe_cc),
        ("current", analytics.copair_components),
        ("observe", observe_cc),
    ]:
        t0 = time.monotonic()
        r = fn(t)
        n = r.count()
        print(f"{name}: {time.monotonic() - t0:.2f}s rows={n}")
    a = analytics.copair_components(t).orderBy("l_partkey").collect()
    b = observe_cc(t).orderBy("l_partkey").collect()
    print("equal:", a == b)


if __name__ == "__main__":
    main()
