"""Streaming CDC materialized view: the ``cdc_apply`` semantics
(latest-wins upsert + tombstones — the format-free MERGE twin) as a
continuously-maintained state table.

Shape: a changelog stream (files landing in a directory, a Kafka topic
in production) is folded per micro-batch into a compacted state table:

    readStream(changelog) → foreachBatch:
        state ∪ batch → latest-wins per key (keep tombstones) → overwrite

Why tombstones stay in the state table: a delete must keep winning over
lower-seq strays that arrive in LATER micro-batches (out-of-order
delivery), so compaction cannot drop op='D' rows — only the read view
(``cdc_read_view``) hides them. This is exactly Kafka log-compaction's
tombstone-retention rule and Delta/Hudi's merge-on-read deletion
vector, spelled in plain parquet.

Idempotence: the merge is a per-key max-seq fold — re-merging an
already-applied batch is a no-op — so checkpointed restarts that replay
the last micro-batch converge to the same state (pinned in
tests/test_streaming_cdc.py together with stream==batch equality
against the DuckDB-oracled ``cdc_apply`` output).

Scale: per micro-batch the work is one keyed shuffle of (state ∪
batch) — with a MERGE-capable format this becomes a key-pruned MERGE
INTO touching only changed partitions; streaming state is offsets only
(the hdr_daily_rollup_stream discipline), so unbounded key spaces never
grow executor state. The full-overwrite here is the local-parquet
stand-in for that MERGE, and the localCheckpoint materializes the
merged frame before the overwrite truncates its own input.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..plans.relational import cdc_latest, cdc_read_view

CDC_LOG_SCHEMA = (
    "o_orderkey bigint, status string, price decimal(18,2), "
    "seq int, op string"
)


def cdc_materialize_stream(
    log_stream: DataFrame,
    state_dir: str,
    checkpoint: str,
):
    """Start the state-maintaining query; returns the StreamingQuery."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            merged = spark.read.parquet(state_dir).unionByName(batch_df)
        else:
            merged = batch_df
        compacted = cdc_latest(merged).localCheckpoint()
        compacted.write.mode("overwrite").parquet(state_dir)

    return (
        log_stream.writeStream.outputMode("append")
        .foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def cdc_state_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The queryable latest-state view over the maintained table —
    identical output shape to the batch ``cdc_apply`` query."""
    return cdc_read_view(spark.read.parquet(state_dir))
