"""Gold property graph (SURVEY §7 step 5): the reference's Neo4j layer
(``/root/reference/src/utils/databases.py:148-333``) as node + edge
DataFrames, and the analytical queries that layer served
(``docs/neo4j_analytical_ideas.md``) as DataFrame aggregations.

Graph-as-frames: each node label is a DataFrame keyed by a deterministic
id; each relationship is an edge frame (src, dst, props). Cypher MATCH +
CREATE pairs (J1–J3) are equi-joins; the collaboration graph (J4) is the
canonical-pair self-join. At scale this is the GraphFrames layout — no
graph database, no Bolt bottleneck, partition-parallel bulk load.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.expr import surrogate_key


def build_nodes(enriched: DataFrame) -> dict[str, DataFrame]:
    """Node frames per label (databases.py:149-273: Paper, Author,
    Journal, License, Reference, Version, ISSN, PublicationMetrics…)."""
    papers = enriched.select(
        F.col("id"), "arxiv", "doi", "title", "general_categories"
    )
    authors = (
        enriched.select(F.explode_outer("s2_authors_data").alias("a"))
        .select(F.col("a.name").alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        # N5: first-seen UUID per name → deterministic sha2 key
        .select(surrogate_key("name").alias("author_id"), "name")
    )
    journals = (
        enriched.select(F.col("journal_name").alias("name"))
        .filter(F.col("name").isNotNull())
        .distinct()
        .select(surrogate_key("name").alias("journal_id"), "name")
    )
    metrics = enriched.select(
        F.col("doi"),
        F.col("citationCount"),
        F.col("influentialCitationCount"),
        F.col("referenceCount"),
    ).filter(F.col("doi").isNotNull())
    return {
        "Paper": papers,
        "Author": authors,
        "Journal": journals,
        "PublicationMetrics": metrics,
    }


def build_edges(enriched: DataFrame, nodes: dict[str, DataFrame]) -> dict[str, DataFrame]:
    """Edge frames (databases.py:275-332). J1/J2: equi-joins on the
    paper key; J3: metrics↔paper on doi. The Author node table grows
    with the corpus (~n_papers/2 distinct names at the round-9 census
    scale), so its join strategy is AQE's call — a forced broadcast
    here stops fitting exactly when the data gets interesting."""
    paper_author = (
        enriched.select("id", F.explode_outer("s2_authors_data").alias("a"))
        .select("id", F.col("a.name").alias("name"))
        .filter(F.col("name").isNotNull())
        .join(nodes["Author"], "name")
        .select(F.col("id").alias("paper_id"), "author_id")
    )
    authored_by = paper_author.distinct()
    has_reference = (
        enriched.select("id", F.explode_outer("references").alias("r"))
        .filter(F.col("r").isNotNull())
        .select(
            F.col("id").alias("paper_id"), F.col("r.DOI").alias("cited_doi")
        )
    )
    based_on = (
        nodes["PublicationMetrics"]
        .select("doi")
        .join(enriched.select("id", "doi"), "doi")
        .select(F.col("doi"), F.col("id").alias("paper_id"))
    )
    return {
        "AUTHORED_BY": authored_by,
        "HAS_REFERENCE": has_reference,
        "BASED_ON_PUBLICATION": based_on,
    }


def collaboration_graph(authored_by: DataFrame, min_count: int = 1) -> DataFrame:
    """J4 (create_collaboration_graph.cql:1-5): co-authorship pair
    weights. Cypher MERGE accumulates directed edges both ways; the
    engine's defined semantics is the canonical undirected pair
    (author_a < author_b — SURVEY §4.4), self-pairs excluded.

    Scale: one shuffle on paper_id (both sides co-partitioned);
    quadratic fan-out per paper is the skew point — AQE skew-join plus,
    for pathological >1k-author papers, an upstream per-paper cap would
    bound it.
    """
    a, b = authored_by.alias("a"), authored_by.alias("b")
    return (
        a.join(b, "paper_id")
        .filter(F.col("a.author_id") < F.col("b.author_id"))
        .groupBy(
            F.col("a.author_id").alias("author_a"),
            F.col("b.author_id").alias("author_b"),
        )
        .agg(F.count(F.lit(1)).alias("collab_count"))
        .filter(F.col("collab_count") >= min_count)
    )
