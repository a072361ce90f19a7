"""Stream-stream joins and replay-safe dedup (SURVEY §2.6 extension).

The reference's streaming surface stops at windowed log aggregation
(ref: src/elk/logstash.conf — stateless per-event enrichment); the two
operators here cover the stateful shapes a production event bus needs
beyond that:

- ``attribution_join_stream``: click→purchase attribution as a
  stream-stream inner join with event-time range bounds on BOTH sides.
  The watermarks + the time-range predicate let Spark expire join state
  (a click older than watermark + gap can never match a future
  purchase), so state is bounded at any scale — the unbounded-state
  hazard of naive stream joins is exactly why the range condition is
  mandatory here, not an optimization.
- ``dedup_events_stream``: at-least-once sources replay events;
  ``dropDuplicatesWithinWatermark`` keeps one row per event_id while
  watermark expiry bounds the dedup state — the streaming twin of the
  batch X1 exact-dedup path.
- ``novelty_ingest_stream``: continuous document ingest deduplicated
  against a STATIC history corpus (stateless stream-static anti join)
  and against itself (watermarked fingerprint state) — the streaming
  twin of the incremental-novelty batch path (novel_docs).

All have batch twins in this module; tests assert stream == batch
through a checkpointed ``availableNow`` run, matching the discipline of
the other streaming twins (loganalytics/stateful/funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_GAP_SECONDS = 600


def _split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("amount"),
    )
    return clicks, purchases


def _attribution_condition():
    return (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {ATTRIBUTION_GAP_SECONDS} SECONDS")
        )
    )


def _attribution_select(joined: DataFrame) -> DataFrame:
    return joined.select(
        "purchase_id",
        "click_id",
        F.col("p_user").alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("long")
        .alias("gap_seconds"),
    )


def attribution_join_stream(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: purchases attributed to every click by
    the same user within the preceding ATTRIBUTION_GAP_SECONDS. Both
    sides carry a watermark and the join condition bounds p_ts relative
    to c_ts, so click state expires at watermark + gap and purchase
    state at watermark — bounded state regardless of stream length."""
    clicks, purchases = _split_clicks_purchases(events_stream)
    return _attribution_select(
        clicks.withWatermark("c_ts", watermark).join(
            purchases.withWatermark("p_ts", watermark),
            _attribution_condition(),
        )
    )


def attribution_join_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical predicate over the finished table."""
    clicks, purchases = _split_clicks_purchases(events)
    return _attribution_select(clicks.join(purchases, _attribution_condition()))


def _attribution_outer_select(joined: DataFrame) -> DataFrame:
    return joined.select(
        "click_id",
        F.col("c_user").alias("user_id"),
        "purchase_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("long")
        .alias("gap_seconds"),
        F.col("purchase_id").isNotNull().alias("converted"),
    )


def attribution_join_outer_stream(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """LEFT OUTER stream-stream join — the funnel-accounting shape the
    inner join cannot express: every click emits, matched rows as the
    purchase arrives, UNMATCHED rows (null purchase, converted=false)
    only once the watermark proves no qualifying purchase can still
    come. That deferred null emission is state eviction made visible:
    click state is held watermark+gap, then either matched or flushed
    as a non-conversion — exactly-once funnel denominators at ingest
    time. Same bounded-state argument as the inner variant."""
    clicks, purchases = _split_clicks_purchases(events_stream)
    return _attribution_outer_select(
        clicks.withWatermark("c_ts", watermark).join(
            purchases.withWatermark("p_ts", watermark),
            _attribution_condition(),
            "leftOuter",
        )
    )


def attribution_join_outer_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical left join over the finished table."""
    clicks, purchases = _split_clicks_purchases(events)
    return _attribution_outer_select(
        clicks.join(purchases, _attribution_condition(), "leftOuter")
    )


def dedup_events_stream(
    events_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Keep the first arrival per event_id; duplicates arriving within
    the watermark horizon are suppressed, and per-key state is dropped
    once the watermark passes it (bounded memory under replay storms)."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def dedup_events_batch(events: DataFrame) -> DataFrame:
    """Batch twin: one row per event_id (ties broken arbitrarily — the
    stream keeps the first ARRIVAL, which on a replayed identical row
    is value-identical)."""
    return events.dropDuplicates(["event_id"])


def stream_to_jdbc(
    stream_df: DataFrame,
    table: str,
    url: str,
    checkpoint: str,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
):
    """Streaming→warehouse sink via ``foreachBatch``: each micro-batch
    runs the same batch JDBC append as ``sources.writers.write_jdbc``
    (batch-INSERT size + connection-capping coalesce), and the
    checkpoint records the committed batch id, so a restarted query
    re-delivers at-least-once and an idempotent/keyed target table
    upgrades that to exactly-once — the standard Structured Streaming
    warehouse-loading pattern (there is no native streaming JDBC sink).
    """
    from ..sources.writers import write_jdbc

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_jdbc(
            batch_df,
            table,
            url,
            mode="append",
            batchsize=batchsize,
            num_partitions=num_partitions,
            properties=properties,
        )

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def novelty_ingest_stream(
    docs_stream: DataFrame, history: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming twin of the incremental-novelty batch path
    (``plans/llmops.novel_docs``): a continuous document feed is kept
    only where its content fingerprint is (a) absent from the STATIC
    history corpus and (b) not already seen in the stream itself.

    Two stateful shapes compose here, each with the right cost model:
    the history check is a stream-static LEFT ANTI join — stateless per
    micro-batch, history never enters the state store (at scale the
    static side is a bucketed fingerprint table, or the Bloom bitmap
    variant when even that scan is too much); the within-stream replay
    guard is ``dropDuplicatesWithinWatermark`` on the fingerprint, so
    dedup state expires at the ingest-time watermark instead of growing
    with the stream.
    """
    hist_fp = history.select(F.md5("text").alias("fp")).distinct()
    return (
        docs_stream.withColumn("fp", F.md5("text"))
        .withWatermark("ingest_ts", watermark)
        .join(hist_fp, "fp", "left_anti")
        .dropDuplicatesWithinWatermark(["fp"])
    )


def novelty_ingest_batch(docs: DataFrame, history: DataFrame) -> DataFrame:
    """Batch twin: anti-join on the content fingerprint, then one row
    per fingerprint (replayed rows are value-identical, so the stream's
    first-arrival pick and this dropDuplicates agree on values)."""
    hist_fp = history.select(F.md5("text").alias("fp")).distinct()
    return (
        docs.withColumn("fp", F.md5("text"))
        .join(hist_fp, "fp", "left_anti")
        .dropDuplicates(["fp"])
    )
