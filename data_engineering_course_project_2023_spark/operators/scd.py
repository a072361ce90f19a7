"""SCD Type-2 dimension maintenance (gold-layer op).

The reference DWH declares SCD-2 columns on its dimensions —
``is_current BOOLEAN``, ``start_date``, ``end_date``
(``/root/reference/src/airflow/dags/check_DWH.py:30-32,60-63``) — but its
loader only ever inserts (populate_DWH.py formats INSERTs); the
close-old-row / open-new-row maintenance is implied, never written.
This operator supplies it, Spark-style.

Without a MERGE-capable table format the relational spelling is a full
dim rewrite: join current rows to updates on the natural key, close rows
whose tracked attributes changed, append new versions. That rewrite is a
broadcast join + union — at scale you'd partition the dim by key range
and rewrite only touched partitions (or use a MERGE-capable format;
same semantics either way, which is what the test pins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _changed_vs_old(tracked_cols: list[str]) -> Column:
    """True when any tracked attribute differs (null-safe) between the
    update row (u.*) and the old current row (_old_*). Per-column
    comparison — a concatenated-string compare would false-negative on
    concatenation collisions."""
    cond = None
    for c in tracked_cols:
        ne = ~(F.col(f"u.{c}").eqNullSafe(F.col(f"_old_{c}")))
        cond = ne if cond is None else (cond | ne)
    return cond


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    natural_key: str,
    tracked_cols: list[str],
    effective_ts: Column,
) -> DataFrame:
    """Apply ``updates`` (one row per natural key: the new attribute
    values) to an SCD-2 ``dim`` with columns
    ``[natural_key, *tracked_cols, is_current, start_date, end_date]``.

    Semantics:
    - key present with changed tracked attrs → old current row closed
      (is_current=false, end_date=effective_ts), new row opened;
    - key present with identical attrs → untouched (idempotent);
    - new key → new current row;
    - historical (non-current) rows pass through unchanged.
    """
    changed_cond = None
    for c in tracked_cols:
        ne = ~(F.col(f"d.{c}").eqNullSafe(F.col(f"u.{c}")))
        changed_cond = ne if changed_cond is None else (changed_cond | ne)

    current = dim.filter(F.col("is_current")).alias("d")
    upd = updates.alias("u")
    hist = dim.filter(~F.col("is_current"))

    joined = current.join(
        F.broadcast(upd), F.col(f"d.{natural_key}") == F.col(f"u.{natural_key}"), "left"
    )
    # rows to close: matched + changed
    closed = joined.filter(
        F.col(f"u.{natural_key}").isNotNull() & changed_cond
    ).select(
        F.col(f"d.{natural_key}").alias(natural_key),
        *[F.col(f"d.{c}").alias(c) for c in tracked_cols],
        F.lit(False).alias("is_current"),
        F.col("d.start_date").alias("start_date"),
        effective_ts.alias("end_date"),
    )
    # rows to keep open: unmatched, or matched-unchanged
    untouched = joined.filter(
        F.col(f"u.{natural_key}").isNull() | ~changed_cond
    ).select(
        F.col(f"d.{natural_key}").alias(natural_key),
        *[F.col(f"d.{c}").alias(c) for c in tracked_cols],
        F.lit(True).alias("is_current"),
        F.col("d.start_date").alias("start_date"),
        F.lit(None).cast("timestamp").alias("end_date"),
    )
    # new versions: changed rows + brand-new keys
    new_versions = (
        upd.join(
            current.select(F.col(f"d.{natural_key}").alias("_k"),
                           *[F.col(f"d.{c}").alias(f"_old_{c}") for c in tracked_cols]),
            F.col(f"u.{natural_key}") == F.col("_k"),
            "left",
        )
        .filter(F.col("_k").isNull() | _changed_vs_old(tracked_cols))
        .select(
            F.col(f"u.{natural_key}").alias(natural_key),
            *[F.col(f"u.{c}").alias(c) for c in tracked_cols],
            F.lit(True).alias("is_current"),
            effective_ts.alias("start_date"),
            F.lit(None).cast("timestamp").alias("end_date"),
        )
    )
    return hist.unionByName(closed).unionByName(untouched).unionByName(new_versions)
