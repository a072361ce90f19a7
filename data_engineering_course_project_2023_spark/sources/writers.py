"""Sink-side operators (SURVEY §2.1 S5, S6, S9, S10).

- S5 JSONL sink (ref: src/utils/utils.py:175) — ``df.write.json``;
  non-ASCII is preserved by default (Spark writes UTF-8, not \\u escapes).
- S6 partitioned write (ref: src/utils/utils.py:158-176) — the
  reference's 4 contiguous chunks become ``repartition(n)``; at scale,
  ``partitionBy`` on a natural column replaces fixed part counts.
- S9/S10 warehouse sink (ref: src/airflow/dags/populate_DWH.py:25-51,
  check_DWH.py:132-171) — templated-INSERT anti-pattern replaced by
  DataFrame writes; ``saveAsTable``/``insertInto`` in a metastore
  deployment, parquet dir locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S5: write records as JSON-lines (UTF-8, one object per line)."""
    df.write.mode(mode).json(path)


def write_parquet_parts(
    df: DataFrame,
    path: str,
    num_parts: int | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S6: partitioned parquet write.

    ``partition_by`` (hive-style directory partitioning, prunable at
    read) is the scale path; ``num_parts`` reproduces the reference's
    fixed part count for small outputs.
    """
    writer = df
    if num_parts:
        writer = df.repartition(num_parts)
    w = writer.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_jdbc(
    df: DataFrame,
    table: str,
    url: str,
    mode: str = "append",
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """S9 live warehouse sink: per-table JDBC append, the DataFrame
    spelling of the reference's psycopg2 templated-INSERT loader
    (ref: src/airflow/dags/populate_DWH.py:25-51 — one INSERT per table,
    append semantics, fixed column order).

    Scale knobs exposed because they ARE the sink's scale story:
    ``batchsize`` rows per JDBC batch-INSERT round trip, and
    ``num_partitions`` caps concurrent connections (each partition
    opens one) — a 1000-executor write would otherwise open a
    connection per task and fall over the database, so the coalesce
    happens here, not at the call site.

    No live database ships in this container, so the seam is
    interface-tested (options land on the writer; a bogus URL raises
    from the JVM driver lookup, proving the path is wired).
    """
    writer = df.coalesce(num_partitions) if num_partitions else df
    (
        writer.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .save()
    )


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    """S5-analog: delimited-text sink (RFC 4180 quoting, UTF-8)."""
    df.write.mode(mode).option("header", header).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S6-analog: columnar ORC sink (zlib by default; stripe-level
    stats make the output pushdown-scannable like parquet)."""
    df.write.mode(mode).orc(path)
