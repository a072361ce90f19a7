"""Structured Streaming surfaces (S13 + extensions).

Event-time note: the driver parquet stores wall-clock (NTZ) timestamps,
but Spark's ``withWatermark`` requires a session-zoned TIMESTAMP column.
``with_event_time`` is the sanctioned boundary cast — the session is
pinned to UTC, so the cast is value-preserving and batch twins computed
on the NTZ column agree with the streamed results.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Cast an NTZ event-time column to session-zoned TIMESTAMP so it is
    eligible for ``withWatermark`` (Spark rejects TIMESTAMP_NTZ event
    time). Under the engine's UTC session this changes type only, never
    value."""
    return df.withColumn(col, F.col(col).cast("timestamp"))
