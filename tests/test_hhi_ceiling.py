"""nation_supplier_hhi past the old DECIMAL(38,0) ceiling
(VERDICT_r5 #3): on sf10^5-shaped revenues the naive Σ(rev_c²)·10¹⁰
spelling overflows decimal(38,0); the hardened per-nation pre-divided
spelling must complete AND stay bit-equal to the DuckDB twin on the
same fixture."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import analytics

# 50 equal suppliers at ~$9·10^12 each in nation 0 (rev_c ≈ 9·10^14
# cents → Σ(rev_c²)·10^10 ≈ 4·10^41, far past decimal(38,0)), plus a
# modest nation 1 that keeps the e10 = 0 path in the same run.
_BIG = 9_000_000_000_000.0
_N_BIG = 50


def _fixture(spark):
    li = spark.createDataFrame(
        [(k, _BIG, 0.0) for k in range(_N_BIG)]
        + [(100, 5000.0, 0.0), (101, 3000.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    s = spark.createDataFrame(
        [(k, 0) for k in range(_N_BIG)] + [(100, 1), (101, 1)],
        "s_suppkey long, s_nationkey long",
    )
    n = spark.createDataFrame(
        [(0, "BIGLAND"), (1, "SMALLVIA")], "n_nationkey long, n_name string"
    )
    return {"lineitem": li, "supplier": s, "nation": n}


def test_hardened_hhi_survives_and_matches_oracle(spark):
    t = _fixture(spark)
    got = sorted(
        map(tuple, analytics.nation_supplier_hhi(t).collect())
    )

    con = duckdb.connect()
    for name in ("lineitem", "supplier", "nation"):
        con.register(name, t[name].toPandas())
    want = sorted(
        map(tuple, con.execute(analytics.NATION_SUPPLIER_HHI_SQL).fetchall())
    )
    con.close()
    assert got == want
    by_name = {r[0]: r for r in got}
    # 50 equal shares → Σshare² = 1/50 → hhi_micro = 10^10/50 exactly
    # (the pre-divide keeps all meaningful digits: u ≈ 9·10^11 here)
    assert by_name["BIGLAND"][1] == _N_BIG
    assert abs(by_name["BIGLAND"][2] - 10**10 // _N_BIG) <= 1
    # the modest nation matches the exact unscaled arithmetic:
    # shares 5/8 and 3/8 → (25 + 9)/64 · 10^10, floor-div
    assert by_name["SMALLVIA"][2] == (34 * 10**10) // 64


def test_fixture_actually_crosses_the_old_ceiling(spark):
    """The naive spelling must FAIL LOUDLY (ANSI decimal overflow) on
    this fixture — proving the hardening is load-bearing, not
    decorative."""
    t = _fixture(spark)
    li, s = t["lineitem"], t["supplier"]
    rev = (
        li.join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_suppkey", "s_nationkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                .cast("decimal(18,2)")
            ).alias("supp_rev")
        )
    )
    naive = (
        rev.select(
            "s_nationkey",
            (F.col("supp_rev") * 100).cast("decimal(38,0)").alias("rev_c"),
        )
        .groupBy("s_nationkey")
        .agg(
            F.sum("rev_c").alias("nrev_c"),
            F.sum(
                (F.col("rev_c") * F.col("rev_c")).cast("decimal(38,0)")
            ).alias("sumsq_c2"),
        )
        .selectExpr(
            "CAST((sumsq_c2 * CAST(10000000000 AS DECIMAL(38,0)))"
            " div (nrev_c * nrev_c) AS LONG) AS hhi_micro"
        )
    )
    with pytest.raises(Exception) as exc:
        naive.collect()
    assert "NUMERIC_VALUE_OUT_OF_RANGE" in str(exc.value) or "overflow" in str(
        exc.value
    ).lower()
