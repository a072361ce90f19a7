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
