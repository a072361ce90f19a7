"""Shuffle BYTE budgets (plans/metrics.shuffle_summary): pin what each
query actually moves, not how long it takes. Wall-clock is noise;
shuffle volume is the 100 TB predictor — a regression that silently
turns a map-side partial agg into a full-row shuffle keeps results and
plan keywords identical but fails these budgets loudly.

Bounds are ceilings, not exact pins: partial-agg output = per-map-
partition groups, so record counts scale with input split count
(deterministic for fixed files, but the slack keeps the contract about
SHAPE — O(groups), O(rows·width) — not about one file layout)."""

from __future__ import annotations

from data_engineering_course_project_2023_spark.plans import metrics, registry

from .conftest import SF_CORRECT


def _summary(spark, name):
    return metrics.shuffle_summary(registry.run_query(name, spark, SF_CORRECT))


def test_pricing_summary_shuffles_only_partial_aggregates(spark):
    """60k lineitem rows in, O(groups) records over the wire: the
    map-side combine IS the query's scale story."""
    s = _summary(spark, "pricing_summary")
    assert s["exchanges"] == 1
    assert s["records"] <= 6 * 32  # groups x max map partitions
    assert s["bytes"] < 64 * 1024


def test_star_join_shuffles_only_final_groups(spark):
    """Every dim broadcasts, so the ONLY exchange is the final
    aggregation — O(region x year), not O(lineitem)."""
    s = _summary(spark, "star_revenue_by_region_year")
    assert s["exchanges"] == 1
    assert s["records"] <= 35 * 32
    assert s["bytes"] < 256 * 1024


def test_exact_dedup_never_shuffles_document_text(spark):
    """The dedup shuffle carries (key, fingerprint)-width rows only;
    document text stays where it was scanned. ~46 B/record measured —
    a text-carrying shuffle would be two orders of magnitude wider."""
    s = _summary(spark, "exact_dedup")
    assert s["records"] > 0
    assert s["bytes"] / s["records"] < 128


def test_gopher_quality_moves_zero_shuffle_bytes(spark):
    """Pure map stage — the metric-level twin of the plan assert."""
    s = _summary(spark, "gopher_quality")
    assert s["exchanges"] == 0 and s["bytes"] == 0
