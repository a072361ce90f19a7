"""Fixture-pinned semantics for the round-3 second-wave operators —
each pinned on a constructed input whose answer is hand-checked, the
companion to their DuckDB-oracle parity rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import (
    analytics,
    eventstream,
    llmops,
)


def test_skyline_is_exactly_the_nondominated_set(spark):
    """(5,7) dominates everything priced ≥5 with size ≤7; (20,9) is the
    only way to get size 9 — the frontier is exactly those two."""
    parts = spark.createDataFrame(
        [
            (1, "p1", 10.0, 5),
            (2, "p2", 10.0, 7),
            (3, "p3", 5.0, 7),
            (4, "p4", 20.0, 9),
            (5, "p5", 5.0, 3),
        ],
        "p_partkey long, p_name string, p_retailprice double, p_size int",
    )
    got = {
        r["p_partkey"]
        for r in analytics.skyline_parts({"part": parts}).collect()
    }
    assert got == {3, 4}


def test_skyline_duplicate_points_both_survive(spark):
    """Two identical (price, size) points: neither strictly dominates
    the other, so BOTH are frontier rows (dominance needs one strict
    inequality)."""
    parts = spark.createDataFrame(
        [(1, "a", 5.0, 7), (2, "b", 5.0, 7)],
        "p_partkey long, p_name string, p_retailprice double, p_size int",
    )
    got = {
        r["p_partkey"]
        for r in analytics.skyline_parts({"part": parts}).collect()
    }
    assert got == {1, 2}


def _docs(spark, rows):
    return spark.createDataFrame(
        [
            (i, text, "en", "src", len(text))
            for i, text in rows
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_containment_short_doc_inside_long(spark):
    """Doc 1's shingles all appear in doc 2 → containment(1→2) = 1.0;
    the reverse direction is 4/7. Filler docs push n_docs above the
    relative-df cut threshold so shared shingles survive it."""
    filler = [(i, f"f{i}a f{i}b f{i}c f{i}d") for i in range(3, 13)]
    docs = _docs(
        spark,
        [(1, "a b c d e f"), (2, "a b c d e f g h i")] + filler,
    )
    rows = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["n_a"], r["containment"])
        for r in llmops.containment_pairs({"documents": docs}).collect()
    }
    assert rows[(1, 2)] == (4, 4, 1.0)
    assert rows[(2, 1)] == (4, 7, pytest.approx(4 / 7))
    assert set(rows) == {(1, 2), (2, 1)}


def test_affix_overlap_finds_the_seam_and_respects_min_length(spark):
    """Doc 1's last-4 tokens == doc 2's first-4 → one (1, 2) pair; the
    5-token doc is excluded (shorter than 2k, head/tail would overlap)."""
    docs = _docs(
        spark,
        [
            (1, "a b c d w x y z"),
            (2, "w x y z e f g h"),
            (3, "w x y z q"),  # 5 tokens < 2k: excluded
        ],
    )
    rows = [
        (r["doc_a"], r["doc_b"], r["affix"])
        for r in llmops.affix_overlap({"documents": docs}).collect()
    ]
    assert rows == [(1, 2, "w x y z")]


def test_bm25_ranks_tf_and_idf_correctly(spark):
    """The rare term (df=1, idf≈1.30) outranks three occurrences of the
    common one (df=2, idf≈0.59); among equal-idf docs higher tf wins;
    docs with no query term never appear. (With df = N/2 the Robertson
    idf is exactly 0 — the fillers keep both dfs below that.)"""
    docs = _docs(
        spark,
        [
            (1, "spark spark spark x x"),
            (2, "spark x x x x"),
            (3, "x x x x x"),
            (4, "join x x x x"),
            (5, "y y y y y"),
            (6, "z z z z z"),
        ],
    )
    rows = [
        (r["doc_id"], r["bm25"])
        for r in llmops.bm25_topk(
            {"documents": docs}, query=("spark", "join", "stream")
        ).collect()
    ]
    assert [d for d, _ in rows] == [4, 1, 2]
    assert all(s > 0 for _, s in rows)


def test_corpus_query_terms_pick_mid_df_band_deterministically(spark):
    """Term derivation contract (VERDICT_r7 #2): the 3 tokens whose df
    is closest to n_docs/10 win, ties broken by md5(tok) then tok — a
    total order, so the pick is identical cross-engine and never empty
    on any corpus whose vocabulary has >= 3 tokens. Fixture: 20 docs;
    'rare' (df=2, |2*10-20|=0) is the unique best; 'mid' (df=4, 20)
    beats 'common' (df=20, 180); fillers fa..fc (df=1, 10) fill the
    remaining two slots by md5 order."""
    import hashlib

    rows = []
    for i in range(20):
        words = ["common"]
        if i < 2:
            words.append("rare")
        if i < 4:
            words.append("mid")
        if i == 5:
            words += ["fa"]
        if i == 6:
            words += ["fb"]
        if i == 7:
            words += ["fc"]
        rows.append((i, " ".join(words)))
    docs = _docs(spark, rows)
    terms = llmops.corpus_query_terms(docs)
    fillers = sorted(
        ["fa", "fb", "fc"],
        key=lambda w: (hashlib.md5(w.encode()).hexdigest(), w),
    )
    assert terms == ["rare"] + fillers[:2]


def test_hybrid_rrf_rewards_presence_in_both_lists(spark):
    """id 1 is rank-1 lexically AND rank-1 vectorially → fused first;
    ids present in only one list trail it; the query vector (id 0)
    never appears."""
    docs = _docs(
        spark,
        [
            (1, "spark join stream"),
            (2, "x y z"),
            (3, "spark x x x x x x x"),
        ],
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = llmops.hybrid_rrf(
        {"documents": docs, "embeddings": emb},
        query=("spark", "join", "stream"),
        anchor_id=0,
    ).collect()
    ids = [r["id"] for r in rows]
    assert ids[0] == 1
    assert 0 not in ids
    top = rows[0]
    assert top["lex_rank"] == 1 and top["vec_rank"] == 1
    assert top["rrf"] == pytest.approx(2 / 61, abs=1e-6)


def test_ab_chi2_hand_computed_table(spark):
    """variant = k mod 2, conversion = purchase. Cells (3,1 / 1,3) give
    χ² = 8·(3·3−1·1)²/4⁴ = 2.0 and lift = (1/4)/(3/4) = 1/3; the
    k-less event is excluded from every cell."""
    rows = []
    eid = 0
    # variant 0 (k even): 3 purchases, 1 view
    for et in ["purchase", "purchase", "purchase", "view"]:
        rows.append((eid, "2024-01-01 00:00:00", 1, et, 1.0, '{"k": 2}'))
        eid += 1
    # variant 1 (k odd): 1 purchase, 3 views
    for et in ["purchase", "view", "view", "view"]:
        rows.append((eid, "2024-01-01 00:00:00", 2, et, 1.0, '{"k": 3}'))
        eid += 1
    rows.append((eid, "2024-01-01 00:00:00", 3, "purchase", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = eventstream.ab_test_chi2({"events": ev}).collect()[0]
    assert (out["a_conv"], out["a_other"], out["b_conv"], out["b_other"]) == (
        3, 1, 1, 3,
    )
    assert out["chi2"] == pytest.approx(2.0)
    assert out["lift"] == pytest.approx(1 / 3, abs=1e-6)


def test_mixture_weights_sqrt_rebalancing(spark):
    """n = 1 vs 4 → weights 1/3, 2/3 (√-tempered vs natural 1/5, 4/5);
    boost up-samples the small source ×1.67 and down-samples the big
    one ×0.83."""
    rows = [(1, "a", "s1"), (2, "b", "s2"), (3, "c", "s2"),
            (4, "d", "s2"), (5, "e", "s2")]
    docs = spark.createDataFrame(
        [(i, t, "en", s, 1) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {
        r["source"]: (r["n_docs"], r["weight"], r["boost"])
        for r in llmops.mixture_temperature_weights(
            {"documents": docs}
        ).collect()
    }
    assert out["s1"] == (1, pytest.approx(1 / 3, abs=1e-6),
                         pytest.approx(5 / 3, abs=1e-5))
    assert out["s2"] == (4, pytest.approx(2 / 3, abs=1e-6),
                         pytest.approx(5 / 6, abs=1e-5))


def test_embedding_dim_stats_hand_computed(spark):
    """[[1,2],[3,4]] → dim0 mean 2 var 1, dim1 mean 3 var 1; min/max
    exact."""
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["dim"]: r
        for r in llmops.embedding_dim_stats({"embeddings": emb}).collect()
    }
    assert out[0]["mean"] == pytest.approx(2.0)
    assert out[0]["variance"] == pytest.approx(1.0)
    assert out[1]["mean"] == pytest.approx(3.0)
    assert (out[1]["min_v"], out[1]["max_v"]) == (2.0, 4.0)


def test_sliding_window_three_windows_per_event(spark):
    """One event lands in exactly the three 3-day windows starting at
    day −2, −1, 0 — Spark's epoch-aligned slide, which the oracle
    mirrors."""
    ev = spark.createDataFrame(
        [(0, "2024-01-10 12:00:00", 1, "view", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {
        r["win_start"]: r["n_events"]
        for r in eventstream.sliding_event_counts({"events": ev}).collect()
    }
    assert rows == {"2024-01-08": 1, "2024-01-09": 1, "2024-01-10": 1}


def test_simhash_hamming_banding_is_complete_vs_naive(spark):
    """The banded candidate generator must find EVERY pair the naive
    all-pairs hamming join finds (pigeonhole: hamming ≤ 3 over 4
    disjoint bands forces one exact band match). Brute-force the
    fingerprints on a corpus with engineered near-dups and compare."""
    from data_engineering_course_project_2023_spark.operators import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),
        (2, base),  # identical → hamming 0
        (3, base + " extra"),  # one-token drift → small hamming
        (4, "totally different words entirely unrelated content here"),
        (5, base.replace("alpha", "alpah")),  # typo drift
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash60_frame(docs).collect()
    }
    naive = {
        (a, b)
        for a in sh
        for b in sh
        if a < b and bin(sh[a] ^ sh[b]).count("1") <= dedup.SIMHASH_MAX_HAMMING
    }
    banded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_hamming_pairs(docs).collect()
    }
    assert (1, 2) in naive  # identical docs must qualify
    assert banded == naive


def test_simhash_hamming_distances_are_exact(spark):
    """Reported hamming equals the true popcount of the fingerprint
    XOR for every emitted pair."""
    from data_engineering_course_project_2023_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five six"),
            (3, "one two three four five seven"),
        ],
        "doc_id long, text string",
    )
    sh = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash60_frame(docs).collect()
    }
    for r in dedup.simhash_hamming_pairs(docs).collect():
        expect = bin(sh[r["doc_a"]] ^ sh[r["doc_b"]]).count("1")
        assert r["hamming"] == expect


def test_cogroup_reconcile_equals_relational(spark):
    """The §2.7 cogrouped-map seam must agree row-for-row with the
    relational full-outer spelling on every status class."""
    from data_engineering_course_project_2023_spark.operators import reconcile

    docs = spark.createDataFrame(
        [(1, 100), (2, 200), (4, 400)], "doc_id long, n_chars long"
    )
    embs = spark.createDataFrame(
        [(1, 7), (3, 8), (4, 9)], "vec_id long, label int"
    )
    rel = {
        tuple(r) for r in reconcile.reconcile_relational(docs, embs).collect()
    }
    cog = {
        tuple(r) for r in reconcile.reconcile_cogroup(docs, embs).collect()
    }
    assert rel == cog
    assert {(1, "both", 100, 7), (2, "doc_only", 200, None),
            (3, "embedding_only", None, 8), (4, "both", 400, 9)} == rel


def test_golden_records_cluster_and_survivorship(spark):
    """ER chain semantics on an engineered fixture: two typo variants +
    their original form one entity (transitively, even though the two
    variants differ from each other); a different-block twin and a
    distinct name stay singletons; survivorship picks min key as
    canonical and aggregates members/price."""
    parts = spark.createDataFrame(
        [
            (1, "Brand#1", 5, "aquamarine steel widget", 10.0),
            (2, "Brand#1", 5, "aquamarine steel widgit", 30.0),   # typo of 1
            (3, "Brand#1", 5, "aquamarine steel gadget", 20.0),   # lev 6 of 1
            (4, "Brand#2", 5, "aquamarine steel widget", 99.0),   # other block
            (5, "Brand#1", 5, "completely different name", 7.0),
        ],
        "p_partkey long, p_brand string, p_size int, p_name string,"
        " p_retailprice double",
    )
    from data_engineering_course_project_2023_spark.plans import analytics

    got = {
        r["entity_id"]: (r["canonical_name"], r["n_members"], r["max_price"])
        for r in analytics.part_golden_records({"part": parts}).collect()
    }
    assert got == {
        1: ("aquamarine steel widget", 3, 30.0),
        4: ("aquamarine steel widget", 1, 99.0),
        5: ("completely different name", 1, 7.0),
    }


def test_table_manifest_is_layout_and_order_invariant(spark):
    """The manifest's claim: equal key sets → equal fingerprints, no
    matter how the data is partitioned or ordered on arrival."""
    from data_engineering_course_project_2023_spark.plans import relational
    from data_engineering_course_project_2023_spark.sources.readers import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    tables = {
        tb: load_table(spark, sf, tb)
        for tb, _ in relational._MANIFEST_KEYS
    }
    base = {
        r["tbl"]: (r["n_rows"], r["key_fingerprint"])
        for r in relational.table_manifest(tables).collect()
    }
    scrambled = {
        tb: df.repartition(7).sortWithinPartitions(df.columns[0])
        for tb, df in tables.items()
    }
    again = {
        r["tbl"]: (r["n_rows"], r["key_fingerprint"])
        for r in relational.table_manifest(scrambled).collect()
    }
    assert base == again
    # and a dropped row changes the fingerprint (it is content, not count)
    docs = tables["documents"]
    first_id = docs.select("doc_id").orderBy("doc_id").first()["doc_id"]
    mutated = dict(tables)
    from pyspark.sql import functions as F

    mutated["documents"] = docs.filter(F.col("doc_id") != first_id).unionAll(
        docs.filter(F.col("doc_id") == first_id).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    third = {
        r["tbl"]: r["key_fingerprint"]
        for r in relational.table_manifest(mutated).collect()
    }
    assert third["documents"] != base["documents"][1]
    assert third["region"] == base["region"][1]
