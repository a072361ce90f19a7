"""A19b Adamic–Adar: the degree-discount must do the one thing common-
neighbor counting can't — rank a pair sharing two RARE neighbors above
a pair sharing two HUBS. Oracle parity runs in test_oracle_parity via
the registry; this pins the semantics on a fixture where the right
answer is hand-computable."""

from __future__ import annotations

import math

from data_engineering_course_project_2023_spark.plans import analytics


def _lineitem(spark):
    """Graph = {1-2, 1-3, 2-3, 2-4, 3-4} (K4 minus edge 1-4): every
    edge realized as its own pair of orders containing exactly that
    part pair, so each co-order count is 2 (the edge threshold).

    Degrees: d(1)=d(4)=2, d(2)=d(3)=3. The two n_common=2 pairs:
      (1,4): common {2,3} — two hubs      → 2·round(1e6/ln 3)
      (2,3): common {1,4} — two rare nodes → 2·round(1e6/ln 2)
    Equal common-neighbor counts, different Adamic–Adar ranks.
    """
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    rows = []
    ok = 0
    for a, b in edges:
        for _ in range(2):
            ok += 1
            rows += [(ok, a), (ok, b)]
    return spark.createDataFrame(
        rows, "l_orderkey bigint, l_partkey bigint"
    )


def test_rare_common_neighbors_outrank_hubs(spark):
    out = analytics.adamic_adar({"lineitem": _lineitem(spark)})
    rows = {(r["node_a"], r["node_b"]): r for r in out.collect()}
    assert set(rows) == {(1, 4), (2, 3)}  # the only n_common >= 2 pairs
    w2 = round(1e6 / math.log(2))
    w3 = round(1e6 / math.log(3))
    assert rows[(1, 4)]["n_common"] == rows[(2, 3)]["n_common"] == 2
    assert rows[(1, 4)]["aa_micro"] == 2 * w3
    assert rows[(2, 3)]["aa_micro"] == 2 * w2
    # the discriminating property: equal counts, rarity wins
    assert rows[(2, 3)]["aa_score"] > rows[(1, 4)]["aa_score"]
    # and the double column is exactly the integer quotient
    for r in rows.values():
        assert r["aa_score"] == r["aa_micro"] / 1e6
