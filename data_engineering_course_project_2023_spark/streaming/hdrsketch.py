"""Streaming HDR quantile sketch: the mergeable log-histogram from
plans/approx.py as a continuously-maintained quantile snapshot — the
actual 100 TB ingest shape for percentiles (VERDICT_r5 #7).

Why this sketch is the right streaming state: the batch operator's
mergeable state is a bounded (group, lo, cnt) frame (≤ 63·HDR_M buckets
per group), and merging two sketches is bucket-wise integer addition —
exactly what Spark's incremental streaming aggregation does to its
state store per micro-batch. So the streaming spelling is just

    readStream(events) → bucket assignment (map-side, _hdr_hist)
      → groupBy(group, lo).count()          # state store == the sketch
      → foreachBatch: _hist_quantiles → overwrite snapshot

The state store holds the sketch itself (bounded by bucket count, not
stream length — the same reason the topk token state is vocab-bounded),
micro-batch merge IS sketch merge, and the snapshot overwrite keeps the
sink idempotent under replay (the topk_snapshot_stream discipline).
Cross-micro-batch mergeability is pinned in pytest: a
maxFilesPerTrigger=1 run over multiple files, plus a checkpointed
restart with more data, must equal the batch twin over all input —
which the t2 gate separately proves equal to the DuckDB oracle
(hdr_value_quantiles / hdr_sketch_merge).

Batch twin: :func:`hdr_quantiles_batch` — the identical expression
tree minus sink/trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.approx import _hdr_hist, _hist_quantiles


def sketch_state(events: DataFrame, group: str = "event_type") -> DataFrame:
    """Shared stream/batch transform: the mergeable (group, lo, cnt)
    sketch state from raw events (value → integer cents)."""
    units = events.selectExpr(
        group, "CAST(round(value * 100) AS BIGINT) AS u"
    )
    return _hdr_hist(units, group, "u")


def hdr_quantiles_batch(events: DataFrame, group: str = "event_type") -> DataFrame:
    return _hist_quantiles(sketch_state(events, group), group, "hdr_")


def hdr_snapshot_stream(
    events_stream: DataFrame,
    out_dir: str,
    checkpoint: str,
    group: str = "event_type",
):
    """Start the snapshot-maintaining query: each micro-batch folds its
    rows into the bucket state (incremental agg = sketch merge) and
    rewrites ``out_dir`` with the current p25/p50/p75 per group.
    Returns the StreamingQuery."""
    state = sketch_state(events_stream, group)

    def _snapshot(batch_df: DataFrame, batch_id: int) -> None:
        (
            _hist_quantiles(batch_df, group, "hdr_")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(out_dir)
        )

    return (
        state.writeStream.outputMode("complete")
        .foreachBatch(_snapshot)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def daily_sketch_delta(events: DataFrame) -> DataFrame:
    """Shared stream/batch transform for the DAILY rollup: per
    micro-batch (or per batch input) partial sketch keyed by the
    composite (event_type, day) cell — the same 'type|day' group key
    and units expression as the oracled ``hdr_daily_quantiles`` query
    (plans/approx.py), so the rollup's ground truth is driver-checked."""
    from ..plans.approx import _UNITS_EXPR

    u = events.select(
        F.concat_ws(
            "|", F.col("event_type"), F.date_format("ts", "yyyy-MM-dd")
        ).alias("grp"),
        F.expr(_UNITS_EXPR).alias("u"),
    )
    return _hdr_hist(u, "grp", "u")


def hdr_daily_rollup_stream(
    events_stream: DataFrame,
    table_dir: str,
    checkpoint: str,
):
    """VERDICT_r6 #4: the continuous-percentile path as a foreachBatch
    bucket-merge into a SINK TABLE rather than the complete-mode state
    store — the unbounded-days shape ``hdr_snapshot_stream`` cannot
    hold (complete-mode state grows with distinct days forever; here
    streaming state is offsets only).

    Each micro-batch writes its PARTIAL sketch (the bounded
    (grp, lo, cnt) frame — ≤ 63·HDR_M rows per touched (type, day)
    cell, never the raw events) as one delta partition keyed by
    batch_id. Replay after a checkpointed restart rewrites the same
    partition (dynamic partition overwrite) instead of double-counting
    — idempotence by layout, the stream_to_jdbc/topk discipline. Late
    data lands as another delta for the same day cell; the read-side
    merge (``hdr_daily_from_table``) is bucket-wise integer addition,
    which the mergeable-summaries property (test_hdr_sketch) proves
    equal to a direct rebuild. At 100 TB: deltas are sketch-sized, the
    periodic compaction of old batch partitions is the standard
    downsample-then-keep-forever maintenance job (compact_parquet)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                daily_sketch_delta(batch_df)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(table_dir)
            )
        finally:
            if old is not None:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", old
                )

    return (
        events_stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def hdr_daily_from_table(spark, table_dir: str) -> DataFrame:
    """Read-side merge of the delta table: bucket-wise integer addition
    across batch partitions, then the same quantile read-off and output
    shape as the oracled ``hdr_daily_quantiles`` query."""
    merged = (
        spark.read.parquet(table_dir)
        .groupBy("grp", "lo")
        .agg(F.sum("cnt").alias("cnt"))
    )
    sk = _hist_quantiles(merged, "grp", "hdr_")
    return sk.select(
        F.substring_index("grp", "|", 1).alias("event_type"),
        F.substring_index("grp", "|", -1).alias("day"),
        "n",
        "hdr_p25",
        "hdr_p50",
        "hdr_p75",
    )
