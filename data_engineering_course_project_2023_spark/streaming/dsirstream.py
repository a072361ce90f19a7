"""Streaming DSIR model maintenance: the hashed-unigram bucket model
from plans/llmops.py as continuously-maintained streaming state — the
ingest shape for data selection over an arriving corpus.

Why DSIR's model is natural streaming state: the batch scoring pass
(``dsir_importance_weights``) builds its target/raw bucket models as a
single ≤256-row count frame ``(bucket, c_raw, c_tgt)`` whose merge is
column-wise integer addition — exactly the fold Spark's incremental
streaming aggregation applies to its state store per micro-batch
(the ``hdrsketch`` discipline: bounded mergeable state, snapshot
sink). So the streaming spelling is

    readStream(documents) → tokenize/hash buckets (map-side)
      → groupBy(bucket) conditional-sum counts   # state == the model
      → foreachBatch: freeze log-ratios → overwrite model snapshot

State is bounded by DSIR_BUCKETS regardless of corpus size, micro-batch
merge IS model merge, and the snapshot overwrite keeps the sink
idempotent under replay. Documents score against the latest snapshot
with the unchanged batch join (the model is a broadcast-sized table),
so train-on-the-stream / score-on-demand needs no second streaming
query. Cross-micro-batch mergeability is pinned in pytest
(tests/test_dsir.py): a maxFilesPerTrigger=1 run over multiple files
plus a checkpointed restart with more data must equal the batch model
over all input — which the t2 gate separately proves equal to the
DuckDB oracle (dsir_importance_weights).

Batch twin: :func:`dsir_model_batch` — the identical expression tree
minus sink/trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..plans.llmops import _dsir_bucketed, _dsir_counts, _dsir_model


def model_state(docs: DataFrame) -> DataFrame:
    """Shared stream/batch transform: the mergeable (bucket, c_raw,
    c_tgt) model state from raw documents."""
    return _dsir_counts(_dsir_bucketed(docs))


def dsir_model_batch(docs: DataFrame) -> DataFrame:
    """Batch twin of the streamed snapshot: (bucket, micro_nats)."""
    return _dsir_model(model_state(docs))


def dsir_model_snapshot_stream(
    docs_stream: DataFrame, out_dir: str, checkpoint: str
):
    """Start the model-maintaining query: each micro-batch folds its
    token-bucket counts into the state store (incremental agg = model
    merge) and rewrites ``out_dir`` with the current (bucket,
    micro_nats) log-ratio table. Returns the StreamingQuery."""
    state = model_state(docs_stream)

    def _snapshot(batch_df: DataFrame, batch_id: int) -> None:
        (
            _dsir_model(batch_df)
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
