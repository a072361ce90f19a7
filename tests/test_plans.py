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
        # 5/10-row anchor set broadcast (O(N·|anchors|); label / self
        # exclusion is a non-equi predicate so the NLJ is the honest plan)
        "hard_negatives",
        "retrieval_metrics",
        # iterative: plan built per checkpointed round; pair graph only
        "neardup_clusters",
        # one-row n_docs scalar broadcast feeding the relative df cut
        "doc_cosine_pairs",
        # same scalar broadcast, twice (heavy cut + prefix seed cut)
        "doc_cosine_pairs_capped",
        # composes doc_cosine_pairs_capped -> inherits its scalar NLJ
        "curation_funnel_neardup",
        # one-row corpus-total scalar broadcast for the heavy-hitter cut
        "cms_token_counts",
        # one-row (N1, N2) totals broadcast for the exact-TVD division
        "corpus_drift",
        # one-row n_docs scalar broadcast feeding the relative df cut
        "containment_pairs",
        # same one-row n_docs broadcast inside the capped twin's df cut
        "containment_pairs_capped",
        # three 1-row metric aggregates broadcast-joined into the report
        # (the capped-truth variant of neardup_eval below)
        "neardup_eval_capped",
        # one-row corpus-total scalar broadcast for the surprisal table
        "unigram_surprisal",
        # one-row (Σ√n, Σn) denominator broadcast over the source frame
        "mixture_temperature_weights",
        # one-row corpus-stats broadcast (idf/avgdl) for map-side BM25
        "bm25_topk",
        # same stats row + the 1-row query-vector broadcast
        "hybrid_rrf",
        # three 1-row metric aggregates broadcast-joined into the report
        "neardup_eval",
        # one-row n_users basket-count broadcast for support/lift (the
        # windowed alternative would single-partition the user frame)
        "event_type_lift",
        # |types|² pair enumeration over the DISTINCT event-type dim
        # (a handful of rows both sides; every corpus-sized frame after
        # it moves through keyed equi-joins only)
        "kmv_set_similarity",
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


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """DPP: a fact table written with hive partitions + a FILTERED dim
    join must prune fact partitions at RUNTIME from the dim-side filter
    (the join key's partition values aren't known at compile time). At
    100 TB this is the difference between scanning one month and
    scanning the table — the plan must carry the dynamicpruning
    subquery on the fact scan."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.sources.readers import load_table

    orders = load_table(spark, SF_CORRECT, "orders")
    fact_dir = str(tmp_path / "orders_by_year")
    (
        orders.withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(fact_dir)
    )
    years = spark.createDataFrame(
        [(y, "keep" if y == 1995 else "drop") for y in range(1992, 1999)],
        "o_year int, tag string",
    )
    fact = spark.read.parquet(fact_dir)
    joined = fact.join(years.filter(F.col("tag") == "keep"), "o_year")
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower()
    got_years = {r["o_year"] for r in joined.select("o_year").distinct().collect()}
    assert got_years == {1995}


def test_runtime_bloom_filter_injected_on_selective_join(spark, tmp_path):
    """Runtime filter injection: when a selective build side feeds a
    shuffle join over an un-partitioned fact, Spark should inject a
    bloom filter (or semi-join filter) on the probe side so most fact
    rows drop BEFORE the shuffle — the optimizer-level sibling of the
    explicit novelty Bloom operator. Pinned here so a config regression
    that silently disables runtime filtering fails loudly."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.sources.readers import load_table

    li_path = str(tmp_path / "li")
    o_path = str(tmp_path / "o")
    load_table(spark, SF_CORRECT, "lineitem").write.parquet(li_path)
    load_table(spark, SF_CORRECT, "orders").write.parquet(o_path)
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    # force a shuffle join: bloom injection targets non-broadcast probes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(li_path)
        o = spark.read.parquet(o_path).filter(F.col("o_totalprice") > 400000)
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        plan = plan_of(joined)
        assert "bloom" in plan.lower() or "runtimefilter" in plan.lower(), plan[:2000]
        assert joined.count() > 0
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_probe_plan_is_map_only(spark):
    """novel_docs_bloom's PROBE contract: no Join and no aggregation
    anywhere in the plan — the history is consulted only through the
    bitmap literal, so the probe is scan → filter → project (plus the
    documented spread() rebalance). A Join appearing here would mean
    the operator regressed to shuffling the history."""
    plan = plan_of(registry.run_query("novel_docs_bloom", spark, SF_CORRECT))
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    assert "PushedFilters" in plan


def test_epoch_batches_rank_is_distributed(spark):
    """The global-rank spelling must stay two-pass: the only
    single-partition exchange allowed is the 256-row bucket-offset
    cumsum (a dim-table window); the corpus-side row_number window must
    be hash-partitioned on the bucket. A naive global row_number would
    show a second SinglePartition exchange feeding a Window over the
    full doc frame — the one-task serialization this query exists to
    avoid."""
    df = registry.run_query("epoch_batches", spark, SF_CORRECT)
    plan = plan_of(df)
    assert plan.count("SinglePartition") == 1, plan
    assert "hashpartitioning(bucket" in plan, plan


def test_all_queries_run_under_plain_driver_session():
    """Driver-environment robustness: every registry query must run
    under a PLAIN SparkSession in a separate JVM — default confs, no
    session.py tuning (the external harness builds its own session, so
    nothing may depend on AQE/broadcast/Arrow/timezone settings we
    apply locally). Subprocess, not newSession(): builder-applied SQL
    confs leak into every session that shares the context, which would
    make an in-process check vacuous."""
    import subprocess
    import sys

    script = """
import sys; sys.path.insert(0, '/root/repo')
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
bad = []
for name, fn in e.queries().items():
    try:
        fn(spark, "/root/testdata/sf0.001").count()
    except Exception as ex:
        bad.append((name, str(ex)[:200]))
assert not bad, bad
print("PLAIN_SWEEP_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert "PLAIN_SWEEP_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]


def test_bm25_plan_is_map_side_plus_takeordered(spark):
    """BM25 contract: no inverted index means no corpus shuffle — the
    only Exchanges belong to the 1-row stats aggregate; top-k is
    TakeOrderedAndProject, never a global Sort."""
    from data_engineering_course_project_2023_spark.plans import registry

    import re

    df = registry.run_query("bm25_topk", spark, SF_CORRECT)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # exactly one shuffle (the 1-row stats aggregate) + its broadcast
    # back to the scan side ("(n) Exchange" counts each node once —
    # formatted output repeats node names in the detail section)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange\b", plan)) == 1


def test_skyline_plan_windows_distinct_prices_only(spark):
    """Skyline contract: the dominance test runs as a window over the
    per-price aggregate joined back broadcast-side — no SortMergeJoin,
    no all-pairs join of the part table against itself."""
    from data_engineering_course_project_2023_spark.plans import registry

    df = registry.run_query("skyline_parts", spark, SF_CORRECT)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sliding_window_plan_single_aggregation(spark):
    """Sliding windows expand map-side (the 3-window explode happens in
    the expand operator inside the scan stage); ONE shuffle feeds the
    final aggregation."""
    from data_engineering_course_project_2023_spark.plans import registry

    import re

    df = registry.run_query("sliding_event_counts", spark, SF_CORRECT)
    plan = plan_of(df)
    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1


def test_gdpr_audit_plan_one_pass(spark):
    """Erasure audit contract: evidence comes from the same single scan
    as the deletion filter — one aggregation exchange, no joins."""
    from data_engineering_course_project_2023_spark.plans import registry

    df = registry.run_query("gdpr_erasure_audit", spark, SF_CORRECT)
    plan = plan_of(df)
    assert "Join" not in plan
    assert plan.count("Scan") <= 2  # data scan (+ possible reused subquery)


def test_pii_and_encoding_audits_are_map_only(spark):
    """The scrubbing/encoding audits are pure per-row regexp passes —
    any Exchange in their plans means something broke the map-only
    shape that makes them scan-bound at 100 TB."""
    for name in ("pii_scrub", "encoding_quality"):
        plan = plan_of(registry.run_query(name, spark, SF_CORRECT))
        # spread()'s round-robin rebalance is the one allowed exchange;
        # a hash partitioning would mean an accidental aggregation/join
        assert "hashpartitioning" not in plan, f"{name} gained a shuffle"


def test_boilerplate_strip_reads_only_needed_columns(spark):
    """Column pruning through the posexplode: the scan must not read
    text-adjacent columns the query never touches."""
    plan = plan_of(registry.run_query("boilerplate_strip", spark, SF_CORRECT))
    assert "n_chars" not in plan and '"lang"' not in plan


def test_cbo_column_stats_flip_selective_join_to_broadcast(spark, tmp_path):
    """SURVEY §4 optimizer evidence: ANALYZE TABLE column statistics +
    CBO turn a selective-filter join side into a broadcast. Without
    stats the filtered side is estimated at full table size (SortMerge);
    with stats the selectivity estimate drops it under the broadcast
    threshold. At 100 TB this is the difference between shuffling a
    fact table and shipping a few KB — and it needs no query change,
    only ANALYZE, which is why the engine keeps every plan declarative.
    """
    spark.sql("DROP TABLE IF EXISTS li_cbo")
    spark.sql("DROP TABLE IF EXISTS o_cbo")
    spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").write.mode(
        "overwrite"
    ).saveAsTable("li_cbo")
    spark.read.parquet("/root/testdata/sf0.01/orders.parquet").write.mode(
        "overwrite"
    ).saveAsTable("o_cbo")
    spark.sql("ANALYZE TABLE li_cbo COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE o_cbo COMPUTE STATISTICS FOR ALL COLUMNS")

    keys = (
        "spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.enabled",
    )
    prev = {k: spark.conf.get(k) for k in keys}
    sql = """
      SELECT l.l_orderkey, o.o_totalprice
      FROM li_cbo l JOIN o_cbo o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_totalprice > 550000
    """
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(24 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "false")

        spark.conf.set("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
        without = plan_of(spark.sql(sql))
        assert "SortMergeJoin" in without and "BroadcastHashJoin" not in without

        spark.conf.set("spark.sql.cbo.enabled", "true")
        spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
        with_stats = plan_of(spark.sql(sql))
        assert "BroadcastHashJoin" in with_stats
        assert "SortMergeJoin" not in with_stats
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS li_cbo")
        spark.sql("DROP TABLE IF EXISTS o_cbo")


def test_jl_projection_is_map_only(spark):
    """The JL sketch is Scan→Project→Generate: the ±1 matrix is a
    folded literal and the contraction runs inside the scan stage —
    ANY Exchange means the sketch stopped being scan-bound."""
    plan = plan_of(registry.run_query("jl_projection", spark, SF_CORRECT))
    assert "Exchange" not in plan
    assert "ReadSchema" in plan and "embedding" in plan


def test_es_sample_window_is_distributed(spark):
    """es_weighted_sample's bottom-k selection must hash-partition on
    source — a global-sort or SinglePartition window would serialize
    the corpus through one task, which is exactly what the per-stratum
    window spelling exists to avoid."""
    df = registry.run_query("es_weighted_sample", spark, SF_CORRECT)
    plan = plan_of(df)
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(source" in plan, plan


# ---------------------------------------------------------------------------
# Lambda-CSE rule (VERDICT_r10 #8). Codegen does not common-
# subexpression-eliminate across a LambdaFunction boundary, so a
# string-scanning expression (split / regexp_* / sentences) captured
# INSIDE a higher-order-function lambda re-evaluates per element —
# O(len²) per document. Round 8 shipped exactly this in shingles()
# (green oracles, 12× slower: 42.5 s vs 3.4 s at sf1z) and it was only
# caught by cross-box reproduction in round 10. This sweep would have
# caught it at ship time: it walks every registry query's OPTIMIZED
# plan (CollapseProject runs there, so an aliased-but-single-reference
# spelling that Catalyst inlines back into the lambda is still
# flagged) and fails on any expensive call inside a lambdafunction
# body whose argument is not the lambda's own variable (per-element
# strings are short; scanning them is linear and fine).
# ---------------------------------------------------------------------------

_LAMBDA_EXPENSIVE = __import__("re").compile(
    r"(?<![a-z_])(split|regexp_replace|regexp_extract|regexp_extract_all|sentences)\("
)


def _lambda_bodies(plan: str) -> list[str]:
    """Balanced-paren extraction of every lambdafunction(...) body."""
    out, i, key = [], 0, "lambdafunction("
    while True:
        j = plan.find(key, i)
        if j < 0:
            return out
        depth, k = 0, j + len(key) - 1
        while k < len(plan):
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        out.append(plan[j + len(key): k])
        i = j + len(key)


def _expensive_in_lambda(plan: str) -> list[str]:
    hits = []
    for body in _lambda_bodies(plan):
        for m in _LAMBDA_EXPENSIVE.finditer(body):
            if not body[m.end(): m.end() + 30].startswith("lambda "):
                hits.append(m.group(1))
    return hits


def test_lambda_detector_fires_on_deliberate_violation(spark):
    """The detector must actually fire on the r8 bug shape — an inline
    element_at(split(text), i+1) captured in a transform lambda — and
    stay quiet on the fixed spelling (split materialized into a column
    that CollapseProject keeps separate because it is referenced more
    than once by a non-cheap consumer)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("a b c",)], "t string")
    bad = df.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(2)),
            lambda i: F.element_at(F.split("t", " "), i + 1),
        ).alias("x")
    )
    plan = bad._jdf.queryExecution().optimizedPlan().toString()
    assert _expensive_in_lambda(plan), plan

    # per-element split over the lambda variable itself is linear — the
    # detector must NOT flag it.
    ok = df.select(
        F.transform(F.array("t"), lambda s: F.split(s, " ")).alias("x")
    )
    plan_ok = ok._jdf.queryExecution().optimizedPlan().toString()
    assert not _expensive_in_lambda(plan_ok), plan_ok


def test_no_expensive_expr_in_lambda(spark):
    """Global sweep: no registry query's optimized plan may capture a
    string-scanning expression inside a HOF lambda (the O(len²)
    shape). 237/237 measured clean at round 11."""
    offenders = {}
    for name in registry.REGISTRY:
        df = registry.run_query(name, spark, SF_CORRECT)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        hits = _expensive_in_lambda(plan)
        if hits:
            offenders[name] = hits
    assert not offenders, offenders


def test_session_scale_confs_pinned(spark):
    """The measured session-shaping configs are part of the performance
    contract (OPTIMIZATION_r11.md): zstd codecs (engine-metric A/B —
    shuffle bytes −59 %, CPU −12..−45 %), shuffled-hash preference
    (SMJ nodes 132→60 registry-wide with zero added Sorts), and AQE as
    the scale-adaptive partitioner. A silent rollback of any of these
    would regress measured wins while every oracle stays green, which
    is exactly the class of change tests must catch."""
    conf = {
        "spark.io.compression.codec": "zstd",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "64m",
    }
    for k, v in conf.items():
        assert spark.conf.get(k) == v, f"{k} drifted from measured value {v}"
