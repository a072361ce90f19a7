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
