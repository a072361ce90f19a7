"""A10b personalized PageRank: restart mass must stay in the seed
nation's reachable neighborhood — suppliers unreachable from the seed
set get NO mass (and are dropped), which is the one behavior global
PageRank cannot exhibit. Oracle parity runs in test_oracle_parity via
the registry; this pins the semantics on a hand-computable fixture."""

from __future__ import annotations

from data_engineering_course_project_2023_spark.plans import analytics


def _tables(spark):
    """cust 1 (nation 7 = the seed nation) orders from supp 11;
    cust 2 (nation 3) orders from supp 12. Disconnected halves."""
    orders = spark.createDataFrame(
        [(100, 1), (200, 2)], "o_orderkey bigint, o_custkey bigint"
    )
    lineitem = spark.createDataFrame(
        [(100, 11), (200, 12)], "l_orderkey bigint, l_suppkey bigint"
    )
    customer = spark.createDataFrame(
        [(1, 7), (2, 3)], "c_custkey bigint, c_nationkey bigint"
    )
    return {"orders": orders, "lineitem": lineitem, "customer": customer}


def test_mass_stays_in_seed_component(spark):
    out = analytics.ppr_trade(_tables(spark))
    rows = {r["node"]: r for r in out.collect()}
    supp = analytics._SUPP_OFFSET
    # only the seed customer and its supplier carry mass
    assert set(rows) == {1, supp + 11}
    # exact integer trajectory: seed holds base = 15% of 1e12 every
    # round; its sink supplier ends at 85% of that after round 3
    assert rows[1]["ppr_units"] == 150_000_000_000
    assert rows[1]["node_type"] == "customer"
    assert rows[supp + 11]["ppr_units"] == 127_500_000_000
    assert rows[supp + 11]["node_type"] == "supplier"
