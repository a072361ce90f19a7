"""Watermark semantics: late data beyond the watermark is dropped in
append mode, across a checkpointed restart — the behavior that bounds
state at scale (and which the reference's Logstash pipeline lacked
entirely)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "ts timestamp, k string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _run_once(spark, src, ckpt, out):
    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .parquet(src)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "k")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "k", "n")
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_drops_late_rows_across_restart(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")

    # batch 1: day-1 data plus a day-2 row that advances the watermark
    # far past day 1 (watermark = max_event_time - 1h)
    _write_batch(
        spark,
        src,
        [
            (datetime(2024, 1, 1, 10, 0), "a"),
            (datetime(2024, 1, 1, 11, 0), "a"),
            (datetime(2024, 1, 2, 12, 0), "b"),
        ],
    )
    out = str(tmp_path / "out")
    _run_once(spark, src, ckpt, out)

    # batch 2 (restart from checkpoint): one LATE day-1 row (beyond the
    # advanced watermark → must be dropped) and one fresh day-2 row
    # plus a day-3 row to close day-2's window
    _write_batch(
        spark,
        src,
        [
            (datetime(2024, 1, 1, 9, 0), "a"),   # late → dropped
            (datetime(2024, 1, 2, 13, 0), "b"),  # on time
            (datetime(2024, 1, 3, 12, 0), "c"),  # advances watermark
        ],
    )
    _run_once(spark, src, ckpt, out)

    got = {
        (r["day"], r["k"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # day-1 'a' finalized at 2, NOT 3: the late row was discarded
    assert got[("2024-01-01", "a")] == 2
    # day-2 'b' counts both on-time rows once its window closes
    assert got[("2024-01-02", "b")] == 2


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


def test_funnel_stream_equals_batch_across_restart(spark, tmp_path):
    """The stateful streaming funnel must converge to the batch funnel
    on the same events, across a checkpointed restart and with the
    anchor view arriving AFTER the click it converts (out-of-order
    across micro-batches) — the recompute-from-state discipline."""
    from data_engineering_course_project_2023_spark.plans.eventstream import (
        conversion_funnel,
    )
    from data_engineering_course_project_2023_spark.streaming import funnel

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    h = 3600
    batch1 = [
        # user 1: clean view → click(+1h) → purchase(+2h): full convert
        (1, "view", datetime(2024, 1, 1, 10, 0)),
        (1, "click", datetime(2024, 1, 1, 11, 0)),
        (1, "purchase", datetime(2024, 1, 1, 12, 0)),
        # user 2: click BEFORE its view → stale, never converts
        (2, "click", datetime(2024, 1, 1, 9, 0)),
        (2, "view", datetime(2024, 1, 1, 10, 0)),
        # user 3: click 25h after view → outside the 24h window
        (3, "view", datetime(2024, 1, 1, 0, 0)),
        (3, "click", datetime(2024, 1, 2, 1, 0)),
        # user 5: the CLICK arrives first ...
        (5, "click", datetime(2024, 1, 1, 12, 0)),
    ]
    batch2 = [
        # ... and its anchoring view (earlier ts) arrives one restart
        # later: the funnel must still convert user 5
        (5, "view", datetime(2024, 1, 1, 11, 0)),
        # user 4: purchase BEFORE the click → stage order violated
        (4, "view", datetime(2024, 1, 1, 10, 0)),
        (4, "purchase", datetime(2024, 1, 1, 10, 30)),
        (4, "click", datetime(2024, 1, 1, 11, 0)),
    ]

    def run_once():
        stream = funnel.funnel_stream(
            spark.readStream.schema(
                "user_id long, event_type string, ts timestamp"
            ).parquet(src)
        )

        def sink(batch_df, epoch_id):
            from pyspark.sql import functions as FB

            batch_df.withColumn("epoch", FB.lit(epoch_id)).write.mode(
                "append"
            ).parquet(out)

        q = (
            stream.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_events(spark, src, batch1)
    run_once()
    _write_events(spark, src, batch2)
    run_once()

    # update mode: each user's LAST emitted row is the final state
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    emitted = spark.read.parquet(out).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id").orderBy(F.desc("epoch"))
        ),
    )
    final = emitted.filter(F.col("rn") == 1).drop("rn", "epoch")
    got = funnel.finalize_funnel(final).collect()[0]

    events = spark.createDataFrame(
        batch1 + batch2, "user_id long, event_type string, ts timestamp"
    )
    want = conversion_funnel({"events": events}).collect()[0]
    assert got.asDict() == want.asDict()
    # and the shape is what the scenario dictates: 5 views, 3 clicks
    # (users 1, 4, 5 — user 4's purchase violates stage order but the
    # click stands), 1 purchase (user 1)
    assert (want["n_view"], want["n_click"], want["n_purchase"]) == (5, 3, 1)
