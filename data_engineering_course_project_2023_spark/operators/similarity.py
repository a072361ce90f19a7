"""Similarity search over embedding columns (extension op, SURVEY §2.8
X3): brute-force cosine top-k as the correctness baseline, and a
sign-random-projection LSH bucketed variant as the scale path.

Scale design:
- Brute force is a broadcast of the query vector + a single map-side
  pass and a top-k (TakeOrdered) — no shuffle of the corpus. Right
  answer, O(N·d) per query: the baseline to beat.
- The LSH path buckets vectors by the sign pattern of projections onto
  hash-derived ±1 hyperplanes. Bucketing is map-side; candidate
  generation is an equi-join on the bucket key, so the shuffle is keyed
  and bounded. Hyperplanes are md5-derived constants — deterministic
  across engines, so even the ANN path is oracle-checkable.
- Everything is float32-in/float64-accumulate with built-in higher-order
  functions (zip_with/aggregate) — no Python in the loop.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from ..functions.expr import spread

EMBED_DIM = 64
# 4 planes → 16 buckets: coarse enough that a query's bucket holds ~n/16
# candidates (decent recall on random data), fine enough to cut the
# rerank set 16×. More planes = faster + lower recall; tune per corpus.
N_PLANES = 4


def hyperplanes(dim: int = EMBED_DIM, n_planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign of bit parity of md5(p|d).
    Shared verbatim by the DuckDB oracle (inlined as literals)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}|{d}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 0 else -1)
        planes.append(row)
    return planes


def dot(a: Column, b: Column) -> Column:
    """Double-accumulated dot product of two float arrays (sequential
    fold → deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 baseline: exact cosine top-k against one stored query vector.
    The query row is broadcast; the corpus never shuffles. Scores are
    rounded to 6 dp — cross-engine float agreement is ~1 ulp, far inside
    the rounding, while real score gaps are orders of magnitude larger.
    """
    q = df.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("query_vec")
    )
    return (
        spread(df).filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("query_vec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_bucket(vec: Column, planes: list[list[int]] | None = None) -> Column:
    """Sign-random-projection bucket id: bit p set when the projection
    onto plane p is positive. Map-side only."""
    planes = planes or hyperplanes()
    bits = []
    for p, weights in enumerate(planes):
        warr = F.array(*[F.lit(float(w)) for w in weights])
        proj = dot(vec, warr)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X3 scale path: candidates = same LSH bucket as the query, then
    exact cosine within the bucket. Recall < 1 by construction (that's
    the ANN trade); the bucket key join keeps the shuffle bounded."""
    bucketed = spread(df).withColumn("bucket", lsh_bucket(F.col(vec_col)))
    q = bucketed.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("query_vec"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.filter(F.col(id_col) != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("query_vec")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )


def blocked_cosine_pairs(
    df: DataFrame,
    block_col: str = "label",
    threshold: float = 0.40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup with blocking: exact all-pairs *within*
    a blocking key (label, shard, source...) — the standard way to make
    pairwise dedup tractable: the join is keyed by the block, so the
    shuffle is bounded and each block's quadratic cost is local.
    Scores rounded to 6 dp (cross-engine 1-ulp tolerance)."""
    e = spread(df).select(
        F.col(id_col), F.col(block_col).alias("_blk"), F.col(vec_col)
    )
    a = e.alias("a")
    b = (
        e.select(
            F.col(id_col).alias("_idb"),
            F.col("_blk"),
            F.col(vec_col).alias("_vecb"),
        )
    ).alias("b")
    return (
        a.join(b, "_blk")
        .filter(F.col(id_col) < F.col("_idb"))
        .select(
            F.col(id_col).alias("vec_a"),
            F.col("_idb").alias("vec_b"),
            F.round(cosine(F.col(vec_col), F.col("_vecb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means for IVF coarse quantization:
    init = the k lowest-id vectors, fixed iteration count.

    Each round: assign (crossJoin the k-row broadcast centroid table —
    the scalar-attach pattern, O(N·k)) → recompute means (one groupBy).
    localCheckpoint truncates lineage per round (same discipline as the
    connected-components loop). Returns (centroid_id, centroid) rows.
    """
    dim_probe = df.select(F.size(vec_col).alias("d")).first()["d"]
    cents = (
        df.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(Window.orderBy(id_col)).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("centroid"),
        )
        .localCheckpoint()
    )
    vecs = df.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    for _ in range(n_iter):
        assigned = (
            vecs.crossJoin(F.broadcast(cents))
            .withColumn(
                "dist",
                F.aggregate(
                    F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy("dist", "centroid_id")
                ),
            )
            .filter(F.col("rn") == 1)
        )
        sums = assigned.groupBy("centroid_id").agg(
            F.array(*[
                F.avg(F.element_at("v", i + 1)) for i in range(dim_probe)
            ]).alias("centroid")
        )
        cents = sums.localCheckpoint()
    return cents


def ivf_topk(
    df: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    n_probe: int = 2,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: assign corpus to centroids once, probe the query's
    ``n_probe`` nearest cells, exact cosine rerank inside them. The
    at-scale layout: the assignment is written partitioned by
    centroid_id so a probe reads only matching partitions.
    """
    cents = kmeans_centroids(df, k=n_clusters, id_col=id_col, vec_col=vec_col)
    vecs = spread(df).select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    dist = F.aggregate(
        F.zip_with("v", "centroid", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dist", dist)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy("dist", "centroid_id")
            ),
        )
        .filter(F.col("rn") == 1)
        .select(id_col, "v", "centroid_id")
        .localCheckpoint()
    )
    qrow = assigned.filter(F.col(id_col) == query_vec_id)
    probe_cells = (
        qrow.select(F.col("v").alias("qv"))
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "qdist",
            F.aggregate(
                F.zip_with("qv", "centroid", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        .orderBy("qdist", "centroid_id")
        .limit(n_probe)
        .select("centroid_id", "qv")
    )
    return (
        assigned.join(F.broadcast(probe_cells), "centroid_id")
        .filter(F.col(id_col) != query_vec_id)
        .select(
            id_col,
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
