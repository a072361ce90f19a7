"""DSIR importance weighting: the score must rank documents by how
target-like their hashed-token distribution is — independent of which
source the document itself came from (that is the whole point of the
scoring pass: raw-corpus docs that HAPPEN to look like the target get
selected). Oracle parity runs in test_oracle_parity via the registry;
this pins the semantics on a fixture where the right answer is
obvious."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import llmops
from data_engineering_course_project_2023_spark.streaming import dsirstream

from .conftest import SF_SMOKE


def _docs(spark):
    target_text = "alpha beta gamma delta alpha beta"
    offtarget_text = "xray yankee zulu quebec xray yankee"
    rows = [
        # the curated target side (src1 is in DSIR_TARGET_SOURCES)
        (1, "src1", target_text),
        (2, "src1", target_text),
        # raw docs that mimic the target distribution...
        (3, "src9", target_text),
        # ...and raw docs that don't
        (4, "src9", offtarget_text),
        (5, "src9", offtarget_text),
    ]
    return spark.createDataFrame(rows, "doc_id int, source string, text string")


def test_target_like_docs_outscore_offtarget_docs(spark):
    out = llmops.dsir_importance_weights({"documents": _docs(spark)})
    w = {r["doc_id"]: r["avg_logratio_nats"] for r in out.collect()}
    assert len(w) == 5
    # the raw doc written in the target's vocabulary must outscore the
    # raw docs that aren't — from the same source
    assert w[3] > w[4]
    assert w[4] == w[5]  # identical text, identical weight
    # and target-vocab docs outscore off-target ones globally
    assert min(w[1], w[2], w[3]) > max(w[4], w[5])


def test_weight_is_integer_micro_nat_sum(spark):
    out = llmops.dsir_importance_weights({"documents": _docs(spark)})
    row = out.filter("doc_id = 3").collect()[0]
    # 6 tokens, and the double column is exactly the integer quotient
    assert row["n_tokens"] == 6
    assert row["avg_logratio_nats"] == (
        row["weight_micro_nats"] / (row["n_tokens"] * 1e6)
    )


def test_dsir_model_stream_snapshot_equals_batch(spark, tmp_path):
    """Cross-micro-batch mergeability of the DSIR bucket model on the
    real ingest shape: the (bucket, c_raw, c_tgt) state store folds
    file-sized micro-batches (maxFilesPerTrigger=1), survives a
    checkpointed restart with new data, and the final (bucket,
    micro_nats) snapshot equals the batch twin over ALL input — which
    the t2 gate separately proves equal to the DuckDB oracle
    (dsir_importance_weights)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    # disjoint, exhaustive 3-way split → three single-file appends →
    # at least three micro-batches total
    split = F.pmod(F.hash("doc_id"), F.lit(3))
    for k, mode in ((0, "overwrite"), (1, "append")):
        docs.where(split == k).coalesce(1).write.mode(mode).parquet(src)

    def run():
        stream = spark.readStream.schema(
            "doc_id bigint, source string, text string"
        ).option("maxFilesPerTrigger", 1).parquet(src)
        q = dsirstream.dsir_model_snapshot_stream(stream, out, ckpt)
        q.awaitTermination(120)

    run()
    docs.where(split == 2).coalesce(1).write.mode("append").parquet(src)
    run()  # restart from checkpoint — state must resume, not rebuild

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, dsirstream.dsir_model_batch(docs).collect()))
    assert len(got) > 1
    assert got == want
