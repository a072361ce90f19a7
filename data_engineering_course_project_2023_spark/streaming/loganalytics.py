"""S13: the reference's ELK log pipeline as Structured Streaming
(SURVEY §2.6).

Reference behavior (``/root/reference/src/logstash/pipeline/
logstash.conf:1-13``): tail ``/airflow_logs/**/*.log``, parse each line,
route into a daily-rotated index. That is: continuous file ingestion →
line parse → daily tumbling window → partitioned sink.

Engine mapping, one job:

    readStream.text(dir)
      → parse_log_lines (regexp_extract: ts, level, source, message)
      → withWatermark("ts", …)  +  groupBy(window(ts, "1 day"), level)
      → writeStream file sink partitioned by day   (or any sink)

The *transform* is shared with the batch path so the semantics are
oracle-checkable: ``events``-table queries in plans/eventstream.py pin
the same window aggregation in the t2 gate, and the pytest streaming
test (availableNow trigger) asserts stream output == batch output on
identical input — the foreachBatch-style "batch twin" discipline from
SURVEY §7 step 6.

Scale notes: file-source ingestion parallelizes by file; the stateful
window agg keeps one row of state per (day, level) — trivially small;
the watermark bounds state for late data (the reference's Logstash had
no late-data story at all — events landed in whatever day's index was
current at arrival; the watermark is strictly better).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# "[2024-01-05 10:11:12,123] {dag_id.task_id} INFO - message" (airflow-ish;
# FIXTURES.md §B7)
LOG_LINE_RE = (
    r"^\[(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}),\d+\] \{([^}]*)\} "
    r"(\w+) - (.*)$"
)


def parse_log_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Text lines → (ts, source, level, message); unparseable lines are
    kept with null ts/level so they can be routed to a dead-letter sink
    rather than silently dropped."""
    v = F.col(value_col)
    return lines.select(
        F.try_to_timestamp(
            F.regexp_extract(v, LOG_LINE_RE, 1), F.lit("yyyy-MM-dd HH:mm:ss")
        ).alias("ts"),
        F.nullif(F.regexp_extract(v, LOG_LINE_RE, 2), F.lit("")).alias("source"),
        F.nullif(F.regexp_extract(v, LOG_LINE_RE, 3), F.lit("")).alias("level"),
        F.regexp_extract(v, LOG_LINE_RE, 4).alias("message"),
    )


def daily_level_counts(parsed: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Daily tumbling window × level — the index-rotation analog. Works
    identically on a batch or streaming DataFrame (the batch twin just
    skips the watermark)."""
    src = parsed.filter(F.col("ts").isNotNull())
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 day").alias("win"), F.col("level"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd").alias("day"),
            "level",
            "n_lines",
        )
    )


def stream_log_dir(
    spark: SparkSession,
    log_dir: str,
    checkpoint: str,
    out_dir: str,
    trigger_available_now: bool = False,
):
    """The deployable job: tail a log directory into daily parquet
    partitions. Returns the StreamingQuery."""
    lines = spark.readStream.text(log_dir)
    agg = daily_level_counts(parse_log_lines(lines))
    writer = (
        agg.writeStream.outputMode("complete")
        .format("memory")  # swap for parquet+partitionBy in deployment
        .queryName("log_daily_counts")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
