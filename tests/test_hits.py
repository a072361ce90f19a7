"""HITS semantics cross-checked against a from-scratch pure-Python
implementation (the BPE/unigram discipline: the DuckDB twin shares the
relational spelling, so only an independent third implementation can
catch a shared misreading of the mutual-reinforcement rounds)."""

from __future__ import annotations

from collections import defaultdict

from data_engineering_course_project_2023_spark.plans import analytics

from .conftest import SF_SMOKE


def _ref_hits(edges: set[tuple[int, int]]):
    h = defaultdict(int)
    a = defaultdict(int)
    for c, _p in edges:
        h[c] = 1_000_000
    for _round in range(2):
        a.clear() if _round else None
        a = defaultdict(int)
        for c, p in edges:
            a[p] += h[c]
        h = defaultdict(int)
        for c, p in edges:
            h[c] += a[p]
    hub = sorted(h.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    auth = sorted(a.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return hub, auth


def test_hits_matches_pure_python(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    rows = analytics.hits_scores(
        {"orders": orders, "lineitem": lineitem}
    ).collect()
    edges = {
        (r["o_custkey"], r["l_partkey"])
        for r in orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        )
        .select("o_custkey", "l_partkey")
        .collect()
    }
    hub, auth = _ref_hits(edges)
    got_hub = [
        (r["node_key"], r["score"], r["rk"])
        for r in sorted(
            (x for x in rows if x["kind"] == "hub"), key=lambda x: x["rk"]
        )
    ]
    got_auth = [
        (r["node_key"], r["score"], r["rk"])
        for r in sorted(
            (x for x in rows if x["kind"] == "authority"),
            key=lambda x: x["rk"],
        )
    ]
    assert got_hub == [(k, s, i + 1) for i, (k, s) in enumerate(hub)]
    assert got_auth == [(k, s, i + 1) for i, (k, s) in enumerate(auth)]
