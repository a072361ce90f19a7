"""Semantics of the round-2 cluster/graph operators on constructed
fixtures: near-dup cluster resolution (transitivity), the SemDeDup
keep-filter (first-seen-wins), blocked kNN (k + tiebreak), and TF-IDF
ranking. The sf0.01 oracle-parity sweep covers the same queries
end-to-end; these pin the *rules* on inputs built to exercise them."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.operators import dedup, similarity


def test_neardup_clusters_transitive(spark):
    # a~b and b~c share most shingles; a and c are farther apart — the
    # cluster must still merge all three (connected components, not
    # pairwise threshold), with min id as canonical representative.
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (1, base + " tail_a common common2"),
            (2, base + " tail_a tail_b common2"),
            (3, base + " tail_b tail_c common3"),
            (10, "entirely different words here nothing shared at all ok"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["cluster_id"], r["is_canonical"])
        for r in dedup.neardup_clusters(docs).collect()
    }
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)
    assert got[10] == (10, True)


def test_connected_components_chain(spark):
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    got = {
        r["node"]: r["lbl"]
        for r in dedup.connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_semdedup_first_seen_wins(spark):
    # v2 duplicates v1 (kept: v1 is lower id); v3 duplicates v2 but not
    # v1 — still dropped (its lower-id near-neighbor v2 exists, even
    # though v2 itself is dropped): the a<b orientation is per-pair,
    # not per-survivor — the documented greedy-by-id rule.
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.01, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 0),
        (4, [1.0, 0.0, 0.0, 0.0], 1),  # same vector, other block: kept
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    kept = {
        r["vec_id"]
        for r in similarity.semdedup_keep(df, threshold=0.9).collect()
    }
    assert kept == {1, 3, 4}


def test_knn_graph_k_and_blocking(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 0),
        (3, [0.0, 1.0], 0),
        (4, [1.0, 0.0], 1),  # other block: never a neighbor of 1-3
        (5, [1.0, 0.1], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = similarity.knn_graph(df, k=2).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r["neighbor_id"])
    # block 0 has 3 members → each gets exactly 2 neighbors, in-block
    assert sorted(by_vec[1]) == [2, 3]
    assert by_vec[1][0] == 2  # most similar first
    # block 1 has 2 members → only 1 possible neighbor despite k=2
    assert by_vec[4] == [5] and by_vec[5] == [4]


def test_tfidf_ranks_rare_terms(spark):
    from data_engineering_course_project_2023_spark.plans.llmops import (
        tfidf_top_terms,
    )

    docs = spark.createDataFrame(
        [
            (1, "shared shared rare1 rare1 rare1"),
            (2, "shared unique2"),
            (3, "shared filler filler"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms({"documents": docs}).collect()
    top = {}
    for r in out:
        top.setdefault(r["doc_id"], []).append((r["term"], r["tfidf"]))
    # 'shared' appears in every doc → idf = ln(1) = 0 everywhere
    assert all(s == 0.0 for d in top.values() for t, s in d if t == "shared")
    # doc 1's top term is the tf=3 doc-unique one
    assert top[1][0][0] == "rare1"
    assert top[2][0][0] == "unique2"


def test_pagerank_fixed_point_semantics(spark):
    """Fixed-point PageRank on a hand-checkable graph: two customers,
    two suppliers; c1 buys from both suppliers, c2 only from s1 — s1
    must outrank s2, customers (no in-edges) hold the base mass, and
    every unit matches the driver-side integer recurrence exactly."""
    from data_engineering_course_project_2023_spark.plans.analytics import (
        PR_ITERS,
        PR_SCALE,
        _SUPP_OFFSET,
        pagerank_trade,
    )

    li = spark.createDataFrame(
        [(100, 11), (100, 12), (200, 11)],
        "l_orderkey long, l_suppkey long",
    )
    o = spark.createDataFrame(
        [(100, 1), (200, 2)], "o_orderkey long, o_custkey long"
    )
    got = {
        r["node"]: (r["node_type"], r["pr_units"])
        for r in pagerank_trade({"lineitem": li, "orders": o}).collect()
    }

    # reference recurrence in plain ints
    edges = {1: [11 + _SUPP_OFFSET, 12 + _SUPP_OFFSET], 2: [11 + _SUPP_OFFSET]}
    nodes = [1, 2, 11 + _SUPP_OFFSET, 12 + _SUPP_OFFSET]
    init = PR_SCALE // len(nodes)
    base = (15 * init) // 100
    pr = {v: init for v in nodes}
    for _ in range(PR_ITERS):
        s = {v: 0 for v in nodes}
        for u, outs in edges.items():
            for v in outs:
                s[v] += pr[u] // len(outs)
        pr = {v: base + (85 * s[v]) // 100 for v in nodes}

    assert got == {
        v: ("supplier" if v >= _SUPP_OFFSET else "customer", pr[v])
        for v in nodes
    }
    assert got[11 + _SUPP_OFFSET][1] > got[12 + _SUPP_OFFSET][1]
    assert got[1][1] == base


def test_triangle_counts_enumeration(spark):
    """K4 on parts {1,2,3,4} minus edge (2,3): triangles (1,2,4),
    (1,3,4) — node 1 and 4 in two each, 2 and 3 in one. Edges need
    co-occurrence in ≥2 orders, so each pair appears twice."""
    from data_engineering_course_project_2023_spark.plans.analytics import (
        triangle_counts,
    )

    pairs = [(1, 2), (1, 3), (1, 4), (2, 4), (3, 4)]
    rows = []
    for i, (x, y) in enumerate(pairs):
        for rep in (0, 1):
            okey = 1000 + i * 10 + rep
            rows += [(okey, x), (okey, y)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts({"lineitem": li}).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1, 4: 2}


def test_kcore_adaptive_matches_fixed_round(spark):
    """r2 verdict #10: the adaptive (loop-until-fixpoint) peeling must
    equal the registered fixed-round query wherever the fixed rounds
    have converged — which both test SFs have (≤3 peels). Also pins
    that the session shuffle setting is restored after the loop."""
    from data_engineering_course_project_2023_spark.plans import analytics, registry

    sf = "/root/testdata/sf0.01"
    t = registry.load_tables(spark, sf, ("lineitem",))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    fixed = {
        (r["l_partkey"], r["core_degree"])
        for r in analytics.kcore_nodes(t).collect()
    }
    adaptive = {
        (r["l_partkey"], r["core_degree"])
        for r in analytics.kcore_nodes_adaptive(t).collect()
    }
    assert adaptive == fixed and len(fixed) > 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_star_cc_matches_propagation(spark):
    """connected_components_star (alternating large/small star — the
    O(log n)-round scale path) must produce IDENTICAL labels to the
    registered min-label propagation on: a chain + isolated nodes, a
    batch of seeded random graphs (varied density incl. long chains),
    and the real co-order graph at sf0.01."""
    import random

    from data_engineering_course_project_2023_spark.plans import (
        analytics,
        registry,
    )

    def labels(nodes, edges):
        prop = {
            r["node"]: r["lbl"]
            for r in dedup.connected_components(nodes, edges).collect()
        }
        star = {
            r["node"]: r["lbl"]
            for r in dedup.connected_components_star(nodes, edges).collect()
        }
        return prop, star

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    edges = spark.createDataFrame([(1, 2), (2, 3), (5, 6)], "src long, dst long")
    prop, star = labels(nodes, edges)
    assert star == prop == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}

    rng = random.Random(42)
    for n, m in [(12, 6), (20, 25), (30, 15)]:
        es = [
            (rng.randint(1, n), rng.randint(1, n)) for _ in range(m)
        ]
        es = [(a, b) for a, b in es if a != b] or [(1, 2)]
        nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], "node long")
        edges = spark.createDataFrame(es, "src long, dst long")
        prop, star = labels(nodes, edges)
        assert star == prop, (n, m, es)
    # a pure long chain — worst case for propagation (diameter rounds),
    # the case star contraction exists for. Propagation needs its round
    # cap RAISED past the 25-hop diameter to converge (at the default
    # max_iter=20 it silently truncates — exactly the failure mode the
    # O(log n) star rounds are immune to); star needs no tuning.
    chain = [(i, i + 1) for i in range(1, 26)]
    nodes = spark.createDataFrame([(i,) for i in range(1, 27)], "node long")
    edges = spark.createDataFrame(chain, "src long, dst long")
    prop = {
        r["node"]: r["lbl"]
        for r in dedup.connected_components(nodes, edges, max_iter=40).collect()
    }
    star = {
        r["node"]: r["lbl"]
        for r in dedup.connected_components_star(nodes, edges).collect()
    }
    assert star == prop and set(star.values()) == {1}

    t = registry.load_tables(spark, "/root/testdata/sf0.01", ("lineitem",))
    want = {
        (r["l_partkey"], r["component"])
        for r in analytics.copair_components(t).collect()
    }
    und = analytics.coorder_edges(t["lineitem"])
    nodes = t["lineitem"].select(F.col("l_partkey").alias("node")).distinct()
    got = {
        (r["node"], r["lbl"])
        for r in dedup.connected_components_star(nodes, und).collect()
    }
    assert got == want and len(got) > 0


def test_lpa_adaptive_matches_fixed_round_at_convergence(spark):
    """r2 verdict #10 (LPA half): the adaptive loop-until-no-change
    label propagation equals the registered fixed-round query on a
    graph that converges within the fixed budget (two co-order
    triangles — every node adopts its clique's min label in one round;
    synchronous LPA on the full sf0.01 graph is NOT converged after 3
    rounds, which is exactly why the adaptive variant stays internal).
    Also pins that the changed-label observe() probe terminates the
    loop well before max_rounds and the shuffle setting is restored."""
    from data_engineering_course_project_2023_spark.plans import analytics

    rows = [
        (o, p)
        for parts, orders in (((1, 2, 3), (1, 2)), ((10, 11, 12), (3, 4)))
        for o in orders
        for p in parts
    ]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    t = {"lineitem": li}
    before = spark.conf.get("spark.sql.shuffle.partitions")
    fixed = {
        (r["node"], r["community"])
        for r in analytics.community_labels(t).collect()
    }
    adaptive = {
        (r["node"], r["community"])
        for r in analytics.community_labels_adaptive(t, max_rounds=32).collect()
    }
    assert adaptive == fixed
    assert fixed == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_mmr_rerank_matches_stepwise_loop_on_random_vectors(spark):
    """Round 12 (VERDICT r11 #5): mmr_rerank's greedy stage now collects
    the engine-computed shortlist sim matrix once and selects picks
    driver-side (3 jobs instead of MMR_K sequential .first() jobs).
    Every EMITTED value stays engine-computed; the one driver-side
    operation that could diverge is the pick comparison's 6-dp HALF_UP
    round. Pin the full output — ranks, ids, and bit-exact doubles —
    against the reference step-by-step .first() loop (the r11
    spelling, reproduced here verbatim) on seeded random vectors, so
    the equivalence is tested beyond the committed fixture."""
    import random

    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.plans import llmops

    def reference_loop(cand):
        selected = []
        for _ in range(llmops.MMR_K):
            if not selected:
                score = F.col("rel")
            else:
                sims = [
                    F.round(
                        similarity.cosine_exact_q(
                            F.col("embedding"),
                            F.array(
                                *[
                                    F.lit(q)
                                    for q in similarity.quantize_py(vec)
                                ]
                            ),
                        ),
                        6,
                    )
                    for (_vid, _rel, _mmr, vec) in selected
                ]
                maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
                score = F.round(
                    F.lit(0.5) * F.col("rel") - F.lit(0.5) * maxsim, 6
                )
            pick = (
                cand.filter(
                    ~F.col("vec_id").isin([s[0] for s in selected])
                    if selected
                    else F.lit(True)
                )
                .select("vec_id", "rel", score.alias("mmr"), "embedding")
                .orderBy(F.desc("mmr"), F.asc("vec_id"))
                .first()
            )
            selected.append(
                (pick["vec_id"], pick["rel"], pick["mmr"], pick["embedding"])
            )
        return [(i + 1, s[0], s[1], s[2]) for i, s in enumerate(selected)]

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        rows = [
            (v, [rng.uniform(-1.0, 1.0) for _ in range(8)])
            for v in range(0, 30)
        ]
        emb = spark.createDataFrame(
            rows, "vec_id int, embedding array<float>"
        )
        got = [
            (r["rank"], r["vec_id"], r["rel"], r["mmr"])
            for r in llmops.mmr_rerank({"embeddings": emb}).collect()
        ]
        q = emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("query_vec")
        )
        cand = (
            emb.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                "embedding",
                F.round(
                    similarity.cosine_exact(
                        F.col("embedding"), F.col("query_vec")
                    ),
                    6,
                ).alias("rel"),
            )
            .orderBy(F.desc("rel"), F.asc("vec_id"))
            .limit(llmops.MMR_SHORTLIST)
            .localCheckpoint()
        )
        want = reference_loop(cand)
        assert got == want, f"seed {seed}: {got} != {want}"
