"""Airflow-layer semantics of the stage runner: skip-if-done on the
atomic _SUCCESS marker, bounded retries, resume-after-failure reading
upstreams from their materialized output (ref: src/airflow/dags/*.py —
task retries + idempotent re-runs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans.orchestrate import (
    Stage,
    StageFailure,
    run_stages,
)
from data_engineering_course_project_2023_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _stages(fail_stage2_times: list[int]):
    """3-stage DAG: clean → per-source stats → report. fail_stage2_times
    is a mutable counter cell: while > 0, stage2 raises (simulating a
    transient failure) and decrements."""

    def clean(up):
        return up["documents"].filter(F.col("n_chars") > 0).select(
            "doc_id", "source", "n_chars"
        )

    def stats(up):
        if fail_stage2_times[0] > 0:
            fail_stage2_times[0] -= 1
            raise RuntimeError("transient: pretend an executor was lost")
        return up["clean"].groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("n_chars"),
        )

    def report(up):
        return up["stats"].agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum("n_docs").alias("n_docs"),
        )

    return [
        Stage("clean", clean, inputs=("documents",)),
        Stage("stats", stats, inputs=("clean",)),
        Stage("report", report, inputs=("stats",)),
    ]


def test_run_skip_retry_and_resume(spark, tmp_path):
    root = str(tmp_path / "dag")
    docs = load_table(spark, SF, "documents")

    # first run: stage2 fails once, retry succeeds
    flaky = [1]
    rep = run_stages(spark, _stages(flaky), root, {"documents": docs})
    assert [r["status"] for r in rep.values()] == ["done-built"] * 3
    assert rep["stats"]["attempts"] == 2 and rep["clean"]["attempts"] == 1

    # result equals the direct (un-orchestrated) composition
    direct = (
        docs.filter(F.col("n_chars") > 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .agg(F.count(F.lit(1)), F.sum("n_docs"))
        .first()
    )
    got = spark.read.parquet(rep["report"]["path"]).first()
    assert (got["n_sources"], got["n_docs"]) == tuple(direct)

    # idempotent re-run: everything skips
    rep2 = run_stages(spark, _stages([0]), root, {"documents": docs})
    assert [r["status"] for r in rep2.values()] == ["done-skipped"] * 3

    # downstream-only rebuild: drop report's marker, upstreams skip
    os.remove(os.path.join(rep["report"]["path"], "_SUCCESS"))
    rep3 = run_stages(spark, _stages([0]), root, {"documents": docs})
    assert rep3["clean"]["status"] == "done-skipped"
    assert rep3["stats"]["status"] == "done-skipped"
    assert rep3["report"]["status"] == "done-built"


def test_exhausted_retries_leave_no_marker_and_resume_cleanly(
    spark, tmp_path
):
    root = str(tmp_path / "dag2")
    docs = load_table(spark, SF, "documents")

    stages = _stages([99])
    stages[1].max_retries = 1  # 2 attempts, both fail
    with pytest.raises(StageFailure) as ei:
        run_stages(spark, stages, root, {"documents": docs})
    assert ei.value.stage == "stats"
    # no _SUCCESS → the failed stage is NOT considered done
    assert not os.path.exists(os.path.join(root, "stats", "_SUCCESS"))
    assert os.path.exists(os.path.join(root, "clean", "_SUCCESS"))

    # fixed run resumes: clean skips, stats+report build
    rep = run_stages(spark, _stages([0]), root, {"documents": docs})
    assert rep["clean"]["status"] == "done-skipped"
    assert rep["stats"]["status"] == "done-built"
    assert rep["report"]["status"] == "done-built"


def test_bad_wiring_rejected(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        run_stages(
            spark,
            [Stage("a", lambda up: docs, inputs=("missing",))],
            str(tmp_path),
            {"documents": docs},
        )


def test_force_rebuilds_named_stage_only(spark, tmp_path):
    root = str(tmp_path / "dag3")
    docs = load_table(spark, SF, "documents")
    run_stages(spark, _stages([0]), root, {"documents": docs})
    rep = run_stages(
        spark, _stages([0]), root, {"documents": docs},
        force=frozenset({"stats"}),
    )
    assert rep["clean"]["status"] == "done-skipped"
    assert rep["stats"]["status"] == "done-built"
    # report's marker is intact, so it still skips (a scheduler wanting
    # transitive invalidation forces the downstream set explicitly)
    assert rep["report"]["status"] == "done-skipped"


def test_weekly_trigger_catchup_and_idempotence(spark, tmp_path):
    """The scheduler leg (reference: weekly schedule_interval +
    catchup): (a) a virtual clock two closed weeks past the anchor
    triggers TWO backfill runs, each materialized under its own
    run=<date> subtree; (b) re-invoking at the same clock is a no-op
    (marker-derived state); (c) advancing one week triggers exactly
    the newly-closed run; (d) the execution_date convention — a week
    runs only after it CLOSES."""
    from data_engineering_course_project_2023_spark.plans.orchestrate import (
        due_run_dates,
        run_scheduled,
    )

    assert due_run_dates("2024-01-01", 7, "2024-01-16") == [
        "2024-01-01", "2024-01-08",
    ]
    assert due_run_dates("2024-01-01", 7, "2024-01-07") == []

    root = str(tmp_path / "sched")
    docs = load_table(spark, SF, "documents")
    stages = _stages([0])

    rep = run_scheduled(
        spark, stages, root, "2024-01-01", 7, "2024-01-16",
        sources_for=lambda d: {"documents": docs},
    )
    assert {k: v["status"] for k, v in rep.items()} == {
        "2024-01-01": "run-built", "2024-01-08": "run-built",
    }
    assert os.path.exists(
        os.path.join(root, "run=2024-01-08", "report", "_SUCCESS")
    )

    rep2 = run_scheduled(
        spark, stages, root, "2024-01-01", 7, "2024-01-16",
        sources_for=lambda d: {"documents": docs},
    )
    assert {v["status"] for v in rep2.values()} == {"run-skipped"}

    rep3 = run_scheduled(
        spark, stages, root, "2024-01-01", 7, "2024-01-23",
        sources_for=lambda d: {"documents": docs},
    )
    assert rep3["2024-01-15"]["status"] == "run-built"
    assert rep3["2024-01-01"]["status"] == "run-skipped"
