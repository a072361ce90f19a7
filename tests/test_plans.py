"""Physical-plan assertions: the plan *shape* is part of the contract
(SURVEY §4 — what Catalyst must be allowed to do for 100 TB viability).
A regression that blocks pushdown or flips a dim join to sort-merge is a
scale bug even while results stay correct."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from data_engineering_course_project_2023_spark.plans import arxiv_clean, registry

from .conftest import SF_CORRECT


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_star_join_broadcasts_all_dims(spark):
    plan = plan_of(registry.run_query("star_revenue_by_region_year", spark, SF_CORRECT))
    assert "SortMergeJoin" not in plan  # every dim must broadcast
    assert plan.count("BroadcastHashJoin") >= 4
    # scan must not read unused columns (column pruning through 4 joins)
    assert "l_tax" not in plan and "o_orderpriority" not in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(registry.run_query("pricing_summary", spark, SF_CORRECT))
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate inside the scan
    # only needed columns in ReadSchema
    assert "l_partkey" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_clean_is_shuffle_free(spark):
    """Silver-1 cleaning must stay a pure map stage — zero exchanges."""
    from . import fixtures

    plan = plan_of(arxiv_clean.clean_publications(fixtures.arxiv_raw(spark)))
    assert "Exchange" not in plan


def test_enrichment_join_broadcasts_lookup(spark):
    plan = plan_of(registry.run_query("enrichment_join", spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_no_query_plans_nested_loop_or_cartesian(spark):
    """Global plan hygiene: no registry query may plan a
    BroadcastNestedLoopJoin or CartesianProduct — at 100 TB either is a
    query that never finishes. (The range join exists precisely to avoid
    this; this sweep catches regressions anywhere.)"""
    # cosine_topk / ivf_topk crossJoin a tiny broadcast frame (1 query
    # row / k centroids) — broadcast NLJ over O(1) rows is the standard
    # scalar-attach pattern, O(N·k), fine at any scale. copair_components
    # builds its plan per iteration (checkpointed) — covered by its own
    # oracle test. idle_rich_customers / nation_revenue_share broadcast
    # a ONE-ROW global aggregate (the scalar-subquery pattern — the same
    # plan Spark produces for an uncorrelated scalar subquery): O(N·1).
    allowed = {
        "cosine_topk",
        "ivf_topk",
        "copair_components",
        "idle_rich_customers",
        "nation_revenue_share",
        "heavy_hitter_tokens",
        # one-row n_docs scalar broadcast (same pattern as the above)
        "tfidf_top_terms",
        # one-row n_tokens scalar broadcast
        "token_pmi",
        # iterative: plan built per checkpointed round; pair graph only
        "neardup_clusters",
    }
    offenders = {}
    for name in registry.REGISTRY:
        if name in allowed:
            continue
        df = registry.run_query(name, spark, SF_CORRECT)
        plan = plan_of(df)
        bad = [
            kw
            for kw in ("BroadcastNestedLoopJoin", "CartesianProduct")
            if kw in plan
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_chunking_and_quality_rules_are_map_side(spark):
    """chunk_for_rag / gopher_quality must plan as pure map work: no
    hash-partition exchange anywhere (chunk_for_rag's only exchange is
    the spread() round-robin rebalance)."""
    plan = plan_of(registry.run_query("chunk_for_rag", spark, SF_CORRECT))
    assert "hashpartitioning" not in plan
    plan = plan_of(registry.run_query("gopher_quality", spark, SF_CORRECT))
    assert "Exchange" not in plan


def test_vocab_encode_broadcasts_vocab(spark):
    """The dimension-sized vocabulary must broadcast into the encode
    join — the corpus side never sort-merges."""
    plan = plan_of(registry.run_query("vocab_encode", spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
