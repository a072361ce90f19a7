"""Local twin of the driver's t2 correctness gate.

Runs a registry query on Spark and its oracle on DuckDB over the same
parquet tables and compares row count, column names/types, and an
order-insensitive canonical value multiset. Stricter than any plausible
driver hash — if this passes, the driver's hash-compare passes.
"""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or (
        hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
    ):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon(x) for x in seq) + "]"
    if hasattr(v, "item"):  # numpy scalar → python scalar
        return _canon(v.item())
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon(row[c]) for c in cols)
        for _, row in df[cols].iterrows()
    ]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    con = duck_con(sf_dir)
    du = con.execute(oracle_sql).df()
    con.close()

    if len(sp) != len(du):
        problems.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        problems.append(
            f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
        )
        return problems
    # pandas-dtype parity: numerically-equal int64 vs float64 columns
    # hash differently at the driver's pandas layer (classic source:
    # DuckDB SUM(BIGINT) → HUGEINT → float64 vs Spark bigint). The
    # value canon below coerces through iterrows and would miss it.
    fam = lambda k: "i" if k in "iu" else k  # noqa: E731
    for c in sorted(sp.columns):
        if len(sp) and len(du) and fam(sp[c].dtype.kind) != fam(du[c].dtype.kind):
            problems.append(
                f"dtype {c}: spark={sp[c].dtype} duckdb={du[c].dtype}"
            )

    sp_rows, du_rows = canonical_rows(sp), canonical_rows(du)
    if sp_rows != du_rows:
        diff_sp = [r for r in sp_rows if r not in set(du_rows)][:3]
        diff_du = [r for r in du_rows if r not in set(sp_rows)][:3]
        problems.append(
            f"values differ; spark-only={diff_sp} duckdb-only={diff_du}"
        )
    return problems
