"""Sketch-based approximate variants (X5's at-scale path).

The exact forms (count distinct, percentile) are oracle-checked in
eventstream.py / relational.py; these sketch versions are what actually
runs at 100 TB — HLL++ and KLL-ish quantile sketches are mergeable, so
they partial-aggregate map-side and shuffle O(sketch) bytes instead of
O(distinct values). Sketch internals are engine-specific, so the driver
records rows-only checks here (no oracle) — the exact twins pin
correctness, these pin scalability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Tables = dict[str, DataFrame]


def approx_distinct_users(t: Tables) -> DataFrame:
    """HLL++ distinct users per event type (rsd 1%) next to the exact
    count so the error is visible in the output."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )


def approx_value_quantiles(t: Tables) -> DataFrame:
    """percentile_approx (accuracy 10k) — single-pass mergeable sketch."""
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.25, 0.5, 0.75], 10000).alias("q"),
        )
        .select(
            "event_type",
            F.col("q").getItem(0).alias("p25"),
            F.col("q").getItem(1).alias("p50"),
            F.col("q").getItem(2).alias("p75"),
        )
    )


# --- X5c: KMV (k-minimum-values) distinct sketch, exact-oracled --------------
# Unlike HLL++ (JVM-internal hash family → rows-only check), KMV built on
# the repo's md5-int60 hash is a DETERMINISTIC sketch: both engines
# compute identical hashes, identical k-th minima, and identical IEEE
# estimates (the only float ops are /2^60 — a power of two, exact — and
# one correctly-rounded division). An approx algorithm with an EXACT
# cross-engine oracle.
KMV_K = 64
_TWO60 = float(1 << 60)


def kmv_distinct_users(t: Tables) -> DataFrame:
    """KMV distinct-user estimate per event type next to the exact
    count: estimate = (k−1)/h_(k) with h normalized to [0,1).

    Scale shape: the sketch state is the k smallest DISTINCT hashes per
    group — the same bottom-k discipline as any top-k query: one
    distinct-agg shuffle, then a bounded per-group window on
    (groups × distinct-users) rows, never a global sort. Mergeable by
    construction (union of bottom-k sets → bottom-k)."""
    from pyspark.sql.window import Window

    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashes = (
        t["events"]
        .select("event_type", h.alias("h"))
        .distinct()
    )
    kth = (
        hashes.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ),
        )
        .filter(F.col("rk") == KMV_K)
        .select("event_type", (F.col("h") / F.lit(_TWO60)).alias("hk"))
    )
    exact = t["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        exact.join(kth, "event_type")
        .select(
            "event_type",
            "exact_users",
            (F.lit(float(KMV_K - 1)) / F.col("hk")).alias("kmv_est"),
        )
    )


KMV_DISTINCT_SQL = f"""
WITH hashes AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
),
kth AS (
  SELECT event_type, CAST(h AS DOUBLE) / {float(1 << 60)!r} AS hk
  FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
    FROM hashes
  ) WHERE rk = {KMV_K}
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY 1
)
SELECT exact.event_type, exact_users, {float(KMV_K - 1)!r} / hk AS kmv_est
FROM exact JOIN kth USING (event_type)
"""


# --- X5d: Count-Min sketch over the token stream, exact-oracled --------------
# Same idea: CMS counters are plain integer counts under md5-derived
# hash rows, so build AND probe are bit-reproducible in DuckDB. The
# sketch answers point frequency queries with one-sided error
# (est ≥ true); the output exposes the overestimate against true counts
# for the heavy-hitter probe set.
CMS_DEPTH = 4  # one md5 → four 32-bit slices, like the MinHash family
CMS_WIDTH = 1024


def cms_token_counts(t: Tables) -> DataFrame:
    """Count-Min frequency estimates for the corpus heavy hitters
    (tokens over 1/200 of the stream — the same probe set as
    heavy_hitter_tokens) next to their true counts.

    Scale shape: the sketch build is ONE shuffle of (depth × width)
    keyed partial counts — counters, not tokens, cross the wire
    (mergeability = partial aggregation); the probe is a broadcast
    join of the heavy-hitter dim against the counter frame. At 100 TB
    the counter frame is still depth·width rows."""
    toks = t["documents"].select(
        F.explode(
            F.filter(F.split(F.trim("text"), r"\s+"), lambda x: x != "")
        ).alias("tok")
    )
    digest = F.md5(F.col("tok"))
    buckets = F.array(
        *[
            (
                F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long")
                % CMS_WIDTH
            )
            for j in range(CMS_DEPTH)
        ]
    )
    rows = toks.select(F.posexplode(buckets).alias("j", "bucket"))
    counters = rows.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("true_n"))
    total = toks.agg(F.count(F.lit(1)).alias("total"))
    heavy = (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("true_n") * 200 > F.col("total"))
        .select("tok", "true_n")
    )
    probe = heavy.select(
        "tok", "true_n", F.posexplode(buckets).alias("j", "bucket")
    )
    return (
        probe.join(counters, ["j", "bucket"])
        .groupBy("tok", "true_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "tok",
            "true_n",
            "cms_est",
            (F.col("cms_est") - F.col("true_n")).alias("overestimate"),
        )
    )


_CMS_BUCKET = (
    "CAST(('0x' || substr(md5(tok), 1 + 8 * {j}, 8)) AS BIGINT) % "
    + str(CMS_WIDTH)
)

CMS_TOKEN_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(trim(text), ' '), x -> x <> ''))
           AS tok
  FROM documents
),
rows_ AS (
  SELECT j, CASE j
      WHEN 0 THEN {_CMS_BUCKET.format(j=0)}
      WHEN 1 THEN {_CMS_BUCKET.format(j=1)}
      WHEN 2 THEN {_CMS_BUCKET.format(j=2)}
      WHEN 3 THEN {_CMS_BUCKET.format(j=3)}
    END AS bucket
  FROM toks, unnest(range(0, {CMS_DEPTH})) AS u(j)
),
counters AS (SELECT j, bucket, COUNT(*) AS c FROM rows_ GROUP BY 1, 2),
counts AS (SELECT tok, COUNT(*) AS true_n FROM toks GROUP BY 1),
total AS (SELECT COUNT(*) AS total FROM toks),
heavy AS (
  SELECT tok, true_n FROM counts CROSS JOIN total
  WHERE true_n * 200 > total
),
probe AS (
  SELECT tok, true_n, j, CASE j
      WHEN 0 THEN {_CMS_BUCKET.format(j=0)}
      WHEN 1 THEN {_CMS_BUCKET.format(j=1)}
      WHEN 2 THEN {_CMS_BUCKET.format(j=2)}
      WHEN 3 THEN {_CMS_BUCKET.format(j=3)}
    END AS bucket
  FROM heavy, unnest(range(0, {CMS_DEPTH})) AS u(j)
)
SELECT tok, true_n, MIN(c) AS cms_est, MIN(c) - true_n AS overestimate
FROM probe JOIN counters USING (j, bucket)
GROUP BY tok, true_n
"""


# --- X5e: mergeable quantile sketch (log-linear / HDR-style), exact-oracled --
# VERDICT_r4 #2. KLL and t-digest — the usual mergeable quantile
# sketches — cannot be value-oracled across engines: KLL compaction
# flips coins and t-digest centroids depend on merge order. The
# DETERMINISTIC member of the mergeable-summaries family is the
# fixed-bucket log-histogram (q-digest leaves / DDSketch / HDR
# histogram): bucket = (floor(log2(u)), linear sub-bucket), count per
# bucket. Build is order-insensitive, merge is bucket-wise integer
# addition (commutative, associative, EXACT), and every step below is
# integer arithmetic — floor(log2) via length(bin(u)), powers of two
# via an array literal — so Spark and DuckDB produce bit-identical
# sketches and bit-identical quantile answers. Relative value error is
# bounded by 1/HDR_M per octave; the exact disc-quantile twin rides
# along in the same output so the driver hash also pins the error.
HDR_M = 32  # linear sub-buckets per power-of-two octave → rel. err ≤ 1/32
_POW2_CSV = ", ".join(str(1 << i) for i in range(63))


def _hdr_hist(df: DataFrame, group: str, units: str) -> DataFrame:
    """(group, lo, cnt): the sketch itself — bucket lower bound `lo`
    in integer units + occupancy. ≤ 63·HDR_M buckets per group no
    matter the input size; this frame IS the mergeable state."""
    return (
        df.selectExpr(
            group,
            f"length(bin({units})) - 1 AS e",
            f"{units} AS u",
        )
        .selectExpr(
            group,
            f"element_at(array({_POW2_CSV}), CAST(e + 1 AS INT)) AS p",
            "u",
        )
        .selectExpr(group, "p", f"((u - p) * {HDR_M}) div p AS sub")
        .selectExpr(group, f"p + (sub * p) div {HDR_M} AS lo")
        .groupBy(group, "lo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _hist_quantiles(hist: DataFrame, group: str, prefix: str) -> DataFrame:
    """p25/p50/p75 from a (group, lo, cnt) histogram: rank targets are
    pure-integer ceil(n·q); the answer is the smallest bucket whose
    running count reaches the target. Window spans ≤ 63·HDR_M rows per
    group — bounded regardless of data size."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(group)
        .orderBy("lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.select(
        group,
        "lo",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(group)).alias("n"),
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n * {a} + {b - 1}) div {b}"),
                F.col("lo"),
            )
        ).alias(f"_{name}")
        for name, a, b in (("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4))
    ]
    out = cum.groupBy(group).agg(F.max("n").alias("n"), *picks)
    return out.select(
        group,
        "n",
        *[
            (F.col(f"_{q}").cast("double") / F.lit(100.0)).alias(
                f"{prefix}{q}"
            )
            for q in ("p25", "p50", "p75")
        ],
    )
