"""SCD-2 dimension maintenance semantics."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.operators.scd import scd2_apply

T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 6, 1)


def _dim(spark):
    return spark.createDataFrame(
        [
            ("a1", "Uni X", True, T0, None),       # will change → close+open
            ("a2", "Uni Y", True, T0, None),       # unchanged → untouched
            ("a3", "Uni Old", False, T0, T0),      # history → pass through
            ("a3", "Uni New", True, T0, None),     # current for a3, unchanged
        ],
        "aff_key string, affiliation string, is_current boolean, "
        "start_date timestamp, end_date timestamp",
    )


def test_scd2_apply(spark):
    updates = spark.createDataFrame(
        [("a1", "Uni Z"), ("a2", "Uni Y"), ("a9", "Uni Brand-New")],
        "aff_key string, affiliation string",
    )
    out = scd2_apply(
        _dim(spark), updates, "aff_key", ["affiliation"], F.lit(T1)
    ).collect()
    rows = {(r["aff_key"], r["affiliation"]): r for r in out}

    # a1 old row closed at T1
    closed = rows[("a1", "Uni X")]
    assert closed["is_current"] is False and closed["end_date"] == T1
    # a1 new version open from T1
    opened = rows[("a1", "Uni Z")]
    assert opened["is_current"] is True and opened["start_date"] == T1
    # a2 untouched (idempotent on no-change)
    assert rows[("a2", "Uni Y")]["is_current"] is True
    assert rows[("a2", "Uni Y")]["start_date"] == T0
    # a3 history passes through; a3 current stays
    assert rows[("a3", "Uni Old")]["is_current"] is False
    assert rows[("a3", "Uni New")]["is_current"] is True
    # brand-new key
    assert rows[("a9", "Uni Brand-New")]["is_current"] is True
    assert len(out) == 6


def test_scd2_idempotent(spark):
    """Re-applying identical updates changes nothing."""
    updates = spark.createDataFrame(
        [("a1", "Uni X")], "aff_key string, affiliation string"
    )
    once = scd2_apply(_dim(spark), updates, "aff_key", ["affiliation"], F.lit(T1))
    twice = scd2_apply(once, updates, "aff_key", ["affiliation"], F.lit(T1))
    assert sorted(map(str, once.collect())) == sorted(map(str, twice.collect()))


def test_dq_checks_single_pass(spark):
    """run_checks: correct violation counts, nulls count as violations,
    and the whole suite is ONE aggregation (no per-check scans)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.operators.quality import run_checks

    df = spark.createDataFrame(
        [(1, "ok text here"), (2, "tiny"), (None, None)],
        "id long, text string",
    )
    out = {
        r["check"]: (r["n_violations"], r["n_evaluated"])
        for r in run_checks(
            df,
            {
                "id_not_null": F.col("id").isNull(),
                "text_min_len": F.length("text") < 5,
            },
        ).collect()
    }
    # null text → length(null)<5 is null → counts as violation
    assert out == {"id_not_null": (1, 3), "text_min_len": (2, 3)}
