"""TS user_event_sequences: the truncation must keep the LAST
SEQ_LAST_N events and the array must come out chronological regardless
of collect order. Oracle parity runs in test_oracle_parity via the
registry; this pins the boundary semantics on a fixture."""

from __future__ import annotations

import datetime as dt

from data_engineering_course_project_2023_spark.plans import eventstream


def _events(spark):
    """User 1: 20 events inserted in scrambled order, one per minute
    (types cycle a/b/c/d). User 2: 3 events. Timestamps deliberately
    shuffled in the input so any collect-order dependence fails."""
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    order = [13, 2, 19, 7, 0, 11, 5, 16, 3, 9, 1, 18, 6, 14, 4, 10, 8, 17, 12, 15]
    for i in order:
        rows.append((100 + i, base + dt.timedelta(minutes=i), 1, "abcd"[i % 4], 0.0))
    for i in range(3):
        rows.append((200 + i, base + dt.timedelta(minutes=i), 2, "x", 0.0))
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )


def test_last_n_chronological(spark):
    out = {
        r["user_id"]: r
        for r in eventstream.user_event_sequences(
            {"events": _events(spark)}
        ).collect()
    }
    n = eventstream.SEQ_LAST_N
    # user 1: 20 events total, seq = the LAST 16 (minutes 4..19), in
    # chronological order
    r1 = out[1]
    assert r1["n_events"] == 20 and r1["seq_len"] == n
    assert r1["seq_csv"] == ",".join("abcd"[i % 4] for i in range(20 - n, 20))
    # user 2: shorter history than the window — kept whole
    r2 = out[2]
    assert r2["n_events"] == 3 and r2["seq_len"] == 3
    assert r2["seq_csv"] == "x,x,x"
