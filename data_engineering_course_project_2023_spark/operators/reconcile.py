"""Cross-asset reconciliation: documents vs their embedding vectors.

A multimodal / RAG corpus carries parallel assets keyed by the same id
(text, embeddings, media features). Drift between them — a doc whose
embedding job failed, an embedding whose source doc was erased by a
GDPR pass — silently corrupts retrieval, so pipelines run a periodic
reconciliation audit. The reference's analog is the staged-table
row-count cross-checks in its DWH load scripts
(``/root/reference/src/utils/databases.py``, insert/validate phases);
this is the per-key version of that audit.

Two spellings with one contract:

- :func:`reconcile_relational` — a full-outer join plus status flags.
  Pure Catalyst: one hash-partitioned join on the key, predicate
  pushdown and column pruning free, the 100 TB path.
- :func:`reconcile_cogroup` — the SAME semantics through
  ``groupBy().cogroup().applyInPandas`` (the §2.7 cogrouped-map seam,
  the one sanctioned-UDF shape the surface did not yet demonstrate).
  Real cogroup use is per-key merge logic SQL can't express
  (per-entity sequence alignment, custom conflict resolution); audit
  reconciliation CAN be expressed relationally, so the engine policy
  stands — the relational spelling is the registry/oracle query and
  the cogroup twin is pinned bit-identical in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RECONCILE_SCHEMA = (
    "key long, status string, n_chars long, label int"
)


def reconcile_relational(docs: DataFrame, embs: DataFrame) -> DataFrame:
    """Full-outer reconcile: one row per key present on either side,
    with status ∈ {both, doc_only, embedding_only} and each side's
    payload columns (null where absent)."""
    d = docs.select(F.col("doc_id").alias("d_key"), "n_chars")
    e = embs.select(F.col("vec_id").alias("e_key"), "label")
    joined = d.join(e, d.d_key == e.e_key, "full_outer")
    status = (
        F.when(F.col("d_key").isNotNull() & F.col("e_key").isNotNull(), "both")
        .when(F.col("d_key").isNotNull(), "doc_only")
        .otherwise("embedding_only")
    )
    return joined.select(
        F.coalesce("d_key", "e_key").alias("key"),
        status.alias("status"),
        "n_chars",
        "label",
    )


def reconcile_cogroup(docs: DataFrame, embs: DataFrame) -> DataFrame:
    """The same audit through the cogrouped-map seam: both frames are
    co-partitioned on the key and each (doc_rows, emb_rows) pair meets
    in one Python callback. Arrow-batched; state is one key's rows, so
    executor memory is bounded by the largest key group (1–1 here).
    """
    import pandas as pd

    def merge(d: "pd.DataFrame", e: "pd.DataFrame") -> "pd.DataFrame":
        has_d, has_e = len(d) > 0, len(e) > 0
        key = int(d["doc_id"].iloc[0]) if has_d else int(e["vec_id"].iloc[0])
        status = "both" if (has_d and has_e) else (
            "doc_only" if has_d else "embedding_only"
        )
        return pd.DataFrame(
            {
                "key": [key],
                "status": [status],
                "n_chars": [int(d["n_chars"].iloc[0])] if has_d else [None],
                "label": [int(e["label"].iloc[0])] if has_e else [None],
            }
        )

    return (
        docs.select("doc_id", "n_chars")
        .groupBy("doc_id")
        .cogroup(embs.select("vec_id", "label").groupBy("vec_id"))
        .applyInPandas(merge, schema=RECONCILE_SCHEMA)
    )
