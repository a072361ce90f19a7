"""Streaming twin of the strict-order conversion funnel (extension of
SURVEY §2.6; batch form in ``plans/eventstream.conversion_funnel``).

The batch funnel is a 3-stage join chain (first view → first click
strictly after it within 24 h → first purchase likewise). Chained
stream-stream joins each feeding an aggregation are not expressible as
one continuous query, so the streaming form is the engine's custom
stateful operator seam: ``applyInPandasWithState`` keyed by user.

State per user = (min view ts, candidate click ts list, candidate
purchase ts list). Every update RECOMPUTES the funnel stages from that
set with exactly the batch rule, so arrival order never matters — a
view arriving after the clicks it anchors still converts them, and the
final emitted row per user equals the batch semantics over the same
events. Candidates are pruned to ``t_view + 48 h`` (a click can sit at
most 24 h past the view, a purchase at most 24 h past that click);
the bound stays valid as ``t_view`` only ever decreases, so state is
O(events in a 48 h window per user), not O(history).

Scale notes: the state store shards by user_id across executors; the
watermark bounds how late input may arrive (later rows are dropped
before the stateful op), and a production variant adds a state timeout
to retire users whose funnel window has provably closed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

HORIZON_US = 24 * 3600 * 1_000_000  # 24 h conversion window, microseconds

STATE_SCHEMA = StructType(
    [
        StructField("t_view", LongType()),
        StructField("clicks", ArrayType(LongType())),
        StructField("purchases", ArrayType(LongType())),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_view", LongType()),
        StructField("t_click", LongType()),
        StructField("t_purchase", LongType()),
    ]
)


def _stages(
    t_view: int | None, clicks: list[int], purchases: list[int]
) -> tuple[int | None, int | None]:
    """The batch funnel rule over one user's candidate set: earliest
    click strictly after the view within 24 h, earliest purchase
    strictly after that click within 24 h."""
    t_click = None
    if t_view is not None:
        eligible = [c for c in clicks if t_view < c <= t_view + HORIZON_US]
        t_click = min(eligible) if eligible else None
    t_purchase = None
    if t_click is not None:
        eligible = [p for p in purchases if t_click < p <= t_click + HORIZON_US]
        t_purchase = min(eligible) if eligible else None
    return t_click, t_purchase


def _update_funnel_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        t_view, clicks, purchases = state.get
        clicks, purchases = list(clicks), list(purchases)
    else:
        t_view, clicks, purchases = None, [], []
    for pdf in pdfs:
        us = pdf["ts"].astype("datetime64[us]").astype("int64")
        et = pdf["event_type"]
        views = us[et == "view"]
        if len(views):
            batch_min = int(views.min())
            t_view = batch_min if t_view is None else min(t_view, batch_min)
        clicks.extend(int(x) for x in us[et == "click"])
        purchases.extend(int(x) for x in us[et == "purchase"])
    if t_view is not None:
        hi = t_view + 2 * HORIZON_US
        clicks = [c for c in clicks if c <= hi]
        purchases = [p for p in purchases if p <= hi]
    t_click, t_purchase = _stages(t_view, clicks, purchases)
    state.update((t_view, sorted(clicks), sorted(purchases)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "t_view": pd.array([t_view], dtype="Int64"),
            "t_click": pd.array([t_click], dtype="Int64"),
            "t_purchase": pd.array([t_purchase], dtype="Int64"),
        }
    )


def funnel_stream(events_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming funnel: per-user stage timestamps (micros), update mode
    — each user's LAST emitted row is their current funnel state."""
    src = events_stream.select("user_id", "event_type", "ts").withWatermark(
        "ts", watermark
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _update_funnel_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def finalize_funnel(per_user: DataFrame) -> DataFrame:
    """Fold per-user stage rows into the batch funnel's output schema
    (stage counts + conversion ratios) so stream == batch is a direct
    DataFrame comparison."""
    counted = per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click"),
        F.count("t_purchase").alias("n_purchase"),
    )
    return counted.select(
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_click").cast("double") / F.col("n_view").cast("double"))
        .alias("view_to_click"),
        (F.col("n_purchase").cast("double")
         / F.col("n_click").cast("double")).alias("click_to_purchase"),
    )
