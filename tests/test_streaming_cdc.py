"""Streaming CDC materialized view (streaming/cdc.py): the maintained
state table must equal the DuckDB-oracled ``cdc_apply`` batch output
over the identical changelog, across maxFilesPerTrigger=1 micro-batches
(changes split BY SEQ, so upsert→delete→resurrect for one key spans
three micro-batches), a checkpointed restart with late out-of-order
strays, and a no-new-data restart (idempotence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import relational
from data_engineering_course_project_2023_spark.sources.readers import load_tables
from data_engineering_course_project_2023_spark.streaming import cdc

from .conftest import SF_SMOKE


def _log(spark):
    return relational.cdc_synthetic_log(load_tables(spark, SF_SMOKE, ("orders",)))


def _run(spark, src, tbl, ckpt):
    stream = (
        spark.readStream.schema(cdc.CDC_LOG_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = cdc.cdc_materialize_stream(stream, tbl, ckpt)
    q.awaitTermination(120)


def test_cdc_stream_equals_oracled_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    log = _log(spark)

    # micro-batches in seq order: base snapshot, then each change wave
    # in its own file — the delete and the resurrection of a key arrive
    # in separate triggers, exercising tombstone retention in state
    for seq, mode in ((0, "overwrite"), (1, "append"), (2, "append")):
        log.where(F.col("seq") == seq).coalesce(1).write.mode(mode).parquet(src)
    _run(spark, src, tbl, ckpt)

    # resurrections (seq 3) land late, after a checkpointed restart
    log.where(F.col("seq") == 3).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tbl, ckpt)

    got = sorted(map(tuple, cdc.cdc_state_view(spark, tbl).collect()))
    want = sorted(
        map(
            tuple,
            relational.cdc_apply(
                load_tables(spark, SF_SMOKE, ("orders",))
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    # no-new-data restart: replaying nothing changes nothing
    _run(spark, src, tbl, ckpt)
    again = sorted(map(tuple, cdc.cdc_state_view(spark, tbl).collect()))
    assert again == got


def test_cdc_out_of_order_stray_loses_to_tombstone(spark, tmp_path):
    """The reason compaction keeps tombstones: a lower-seq stray for a
    DELETED key arriving in a later micro-batch must not resurrect it."""
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    log = _log(spark)

    # batch 1: everything except the seq-1 upserts for keys that will
    # be deleted; batch 2 (later trigger): those seq-1 strays alone
    deleted = (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 21 != 0)
    stray = (F.col("seq") == 1) & deleted
    log.where(~stray).coalesce(1).write.mode("overwrite").parquet(src)
    log.where(stray).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, tbl, ckpt)

    got = sorted(map(tuple, cdc.cdc_state_view(spark, tbl).collect()))
    want = sorted(
        map(
            tuple,
            relational.cdc_apply(
                load_tables(spark, SF_SMOKE, ("orders",))
            ).collect(),
        )
    )
    assert got == want
    # and the state table still carries the tombstones themselves
    state = spark.read.parquet(str(tmp_path / "tbl"))
    assert state.where(F.col("op") == "D").count() > 0
