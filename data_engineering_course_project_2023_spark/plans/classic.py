"""Remaining classic decision-support shapes (TPC-H Q6/Q8/Q9/Q10/Q14/
Q15/Q16/Q19/Q20 analogs), adapted to the driver's narrower schemas.

The reference's warehouse (src/airflow/dags/check_DWH.py) serves exactly
this family of slice-and-aggregate questions over its star schema; these
queries exercise the shapes its tables were wired for but that no shipped
.cql/.sql file spells out: selective fact scans (Q6), conditional-share
aggregation (Q8/Q14), multi-dim profit rollups (Q9), top-k with
dimension context (Q10), scalar-max join-back (Q15), distinct-count
breadth (Q16), disjunctive predicate pushdown (Q19), and nested
semi-join qualification (Q20).

Schema adaptations (testdata has no partsupp / l_shipmode /
l_commitdate): Q9's supplycost → p_retailprice as unit cost; Q20's
excess-stock availability → shipped-quantity threshold.

Scale notes (100 TB): every query here is one pass over lineitem with
dimension broadcasts — no fact-fact shuffle. Q15/Q20's scalar/inner
aggregates produce supplier-cardinality frames (tiny vs the fact) and
re-join broadcast-side. Filters sit directly on scan columns so parquet
row-group pruning and Catalyst pushdown both fire.

Parity conventions per plans/registry.py docstring: money math in
DECIMAL(18,2), final casts to DOUBLE, shares divided as
identically-rounded doubles, quantity sums in DECIMAL (exact,
order-free), deterministic top-k tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import money, revenue

Tables = dict[str, DataFrame]


# --- Q6: selective single-pass forecast ----------------------------------
def discount_forecast(t: Tables) -> DataFrame:
    """Revenue increase if mid-band discounts were dropped: one scan,
    every predicate on a scan column (shipdate range, discount band,
    small quantity) → full pushdown, map-side partial agg, no join."""
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * money("l_discount"))
            .cast("double")
            .alias("potential_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


DISCOUNT_FORECAST_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS potential_revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- Q8: market share (conditional-sum ratio per group) ------------------
def market_share(t: Tables) -> DataFrame:
    """NATION_7's share of supplier revenue into ASIA-region customers,
    per order year. Both sums stay exact DECIMAL; the share divides two
    correctly-rounded doubles (bit-identical cross-engine)."""
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    n, r = t["nation"], t["region"]
    cust_nation = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = (
        s.join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                                 F.col("n_name").alias("supp_nation"))),
            s.s_nationkey == F.col("sn_key"),
        ).select("s_suppkey", "supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_nation), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", revenue())
                  .otherwise(zero)).cast("double").alias("nation_revenue"),
            F.sum(revenue()).cast("double").alias("total_revenue"),
        )
        .withColumn("mkt_share",
                    F.col("nation_revenue") / F.col("total_revenue"))
    )


MARKET_SHARE_SQL = """
WITH shares AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
         CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           AS nation_revenue,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  GROUP BY 1
)
SELECT order_year, nation_revenue, total_revenue,
       nation_revenue / total_revenue AS mkt_share
FROM shares
"""


# --- Q9: product-line profit by nation × year ----------------------------
def nation_profit(t: Tables) -> DataFrame:
    """Profit on 'red' parts by supplier nation and ship year. Unit cost
    is p_retailprice (no partsupp in the testdata — see module doc).
    amount = rev - cost*qty, all in exact DECIMAL until the final cast."""
    li, p, s, n = t["lineitem"], t["part"], t["supplier"], t["nation"]
    red = p.filter(F.col("p_name").like("red%")).select(
        "p_partkey", money("p_retailprice").alias("unit_cost"))
    amount = revenue() - F.col("unit_cost") * money("l_quantity")
    return (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


NATION_PROFIT_SQL = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                - CAST(p_retailprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE 'red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


# --- Q10: returned-item losses (top-k with dimension context) ------------
def returned_item_losses(t: Tables) -> DataFrame:
    """Top 20 customers by revenue lost to returns in 1997H1. Group keys
    carry the dimension columns (functionally dependent on c_custkey);
    the top-k is tiebroken on c_custkey so both engines pick the same
    rows."""
    li, o, c, n = t["lineitem"], t["orders"], t["customer"], t["nation"]
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1997-01-01")
                & (F.col("o_orderdate") < "1997-07-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue()).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


RETURNED_ITEM_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS lost_revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate <  TIMESTAMP '1997-07-01'
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- Q14: promo revenue share (two conditional sums, one row) ------------
def promo_revenue_pct(t: Tables) -> DataFrame:
    """PROMO parts' percentage of 1997 shipped revenue."""
    li, p = t["lineitem"], t["part"]
    zero = F.lit(0).cast("decimal(18,4)")
    agg = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")),
              li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", revenue())
                  .otherwise(zero)).cast("double").alias("promo_revenue"),
            F.sum(revenue()).cast("double").alias("total_revenue"),
        )
    )
    return agg.withColumn(
        "promo_pct", F.lit(100.0) * F.col("promo_revenue") / F.col("total_revenue")
    )


PROMO_REVENUE_SQL = """
WITH s AS (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           AS promo_revenue,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
)
SELECT promo_revenue, total_revenue,
       100.0 * promo_revenue / total_revenue AS promo_pct
FROM s
"""


# --- Q15: top supplier by quarterly revenue (scalar-max join-back) -------
def top_quarter_supplier(t: Tables) -> DataFrame:
    """Supplier(s) with the maximum 1996Q1 revenue. The per-supplier
    revenue frame is supplier-cardinality (tiny); the global max is a
    one-row broadcast; equality happens in exact DECIMAL so both engines
    keep identical winners (ref Q2-shape discipline, see
    analytics.cheapest_supplier_per_nation)."""
    li, s = t["lineitem"], t["supplier"]
    per_supp = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue()).alias("total_rev"))
    )
    max_rev = per_supp.agg(F.max("total_rev").alias("max_rev"))
    return (
        per_supp.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name",
                F.col("total_rev").cast("double").alias("total_revenue"))
    )


TOP_QUARTER_SUPPLIER_SQL = """
WITH per_supp AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM per_supp
JOIN (SELECT MAX(total_rev) AS max_rev FROM per_supp) m ON total_rev = max_rev
JOIN supplier ON l_suppkey = s_suppkey
"""


# --- Q16: supplier breadth per part descriptor ---------------------------
def part_supplier_breadth(t: Tables) -> DataFrame:
    """How many distinct suppliers ship each (brand, type, size) combo,
    excluding one brand and the PROMO line. COUNT(DISTINCT) shuffles on
    the group key with the suppkey carried — breadth per descriptor stays
    exact at any scale."""
    li, p = t["lineitem"], t["part"]
    descr = p.filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.join(F.broadcast(descr), li.l_partkey == descr.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


PART_SUPPLIER_BREADTH_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25)
GROUP BY 1, 2, 3
"""


# --- Q19: disjunctive predicate revenue ----------------------------------
def brand_bulk_revenue(t: Tables) -> DataFrame:
    """Revenue matched by any of three brand × quantity-band × size-band
    alternatives — the OR-of-ANDs shape that tests disjunctive pushdown
    (each disjunct references both scan columns and join-side columns, so
    the common conjuncts get pulled above the join while the per-brand
    bands evaluate post-join)."""
    li, p = t["lineitem"], t["part"]
    j = li.join(F.broadcast(p.select("p_partkey", "p_brand", "p_size")),
                li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#4") & q.between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#19") & q.between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#2") & q.between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        F.sum(revenue()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


BRAND_BULK_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#4'  AND l_quantity BETWEEN 1  AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#19' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#2'  AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
"""


# --- Q20: nested semi-join qualification ---------------------------------
def bulk_red_suppliers(t: Tables) -> DataFrame:
    """Suppliers who shipped more than 600 units of 'red' parts during
    1996-97 (the shipped-quantity stand-in for Q20's excess-stock
    predicate). The inner aggregate is supplier-cardinality; the
    qualification joins back broadcast-side. Quantity sums run in
    DECIMAL so the threshold compare is exact on both engines."""
    li, p, s, n = t["lineitem"], t["part"], t["supplier"], t["nation"]
    red_keys = p.filter(F.col("p_name").like("red%")).select("p_partkey")
    qualified = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(F.broadcast(red_keys), li.l_partkey == red_keys.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("red_qty"))
        .filter(F.col("red_qty") > 600)
    )
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == F.col("l_suppkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              s.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name",
                F.col("red_qty").cast("double").alias("red_qty"))
    )


BULK_RED_SUPPLIERS_SQL = """
WITH qualified AS (
  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS red_qty
  FROM lineitem
  JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%') rp
    ON l_partkey = rp.p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 600
)
SELECT s_suppkey, s_name, n_name, CAST(red_qty AS DOUBLE) AS red_qty
FROM supplier
JOIN qualified ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
"""


# --- Q5: local supplier volume (same-nation customer/supplier) -----------
def regional_sales(t: Tables) -> DataFrame:
    """Q5 analog: 1996 revenue from EUROPE customers served by a
    supplier in the customer's OWN nation, per nation. The only
    fact-fact shuffle is lineitem⋈orders on orderkey; customer/
    supplier/nation/region all attach broadcast-side at test scale
    (at 100 TB AQE swaps customer to a shuffle join automatically —
    nothing here pins a strategy). The same-nation requirement becomes
    a plain equi-filter between the two attached nationkeys, so no
    extra join is needed for it."""
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    n, r = t["nation"], t["region"]
    europe_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("c_custkey",
                F.col("c_nationkey").alias("cust_nation_key"),
                F.col("n_name").alias("nation"))
    )
    return (
        li.join(
            o.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1997-01-01")
            ),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(europe_cust),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("cust_nation_key"))
        .groupBy("nation")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


REGIONAL_SALES_SQL = """
SELECT n_name AS nation,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
"""


# --- Q7: bilateral volume shipping between two nations -------------------
def bilateral_trade(t: Tables) -> DataFrame:
    """Q7 analog: revenue flowing between NATION_3 and NATION_7 in
    either direction, by supplier nation × customer nation × ship
    year. The disjunctive nation-pair predicate applies AFTER both
    nationkeys are broadcast-attached, so it is a cheap filter on the
    joined stream rather than a join condition that would force a
    nested loop; lineitem⋈orders stays the single shuffle."""
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    n = t["nation"]
    supp = (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                                    F.col("n_name").alias("supp_nation"))),
               s.s_nationkey == F.col("snk"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        c.join(F.broadcast(n.select(F.col("n_nationkey").alias("cnk"),
                                    F.col("n_name").alias("cust_nation"))),
               c.c_nationkey == F.col("cnk"))
        .select("c_custkey", "cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_3")
         & (F.col("cust_nation") == "NATION_7"))
        | ((F.col("supp_nation") == "NATION_7")
           & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("ship_year"))
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


BILATERAL_TRADE_SQL = """
SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND ((n2.n_name = 'NATION_3' AND n1.n_name = 'NATION_7')
    OR (n2.n_name = 'NATION_7' AND n1.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""
