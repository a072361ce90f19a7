"""TS cusum_shift_flags: the CUSUM recursion is implemented twice for
the parity gate (Spark F.aggregate fold, DuckDB WITH RECURSIVE) — two
engines can share a misreading of the spec, so this pins both against
a from-scratch pure-Python recursion on a hand-built fixture whose
expected excursion is computed independently. Also pins the boundary
semantics: reference window = first CUSUM_REF_DAYS OBSERVED days,
clamp at zero, flag strictly above CUSUM_H_SCALED."""

from __future__ import annotations

import datetime as dt
from collections import Counter

from data_engineering_course_project_2023_spark.plans import eventstream


def _events(spark):
    """One event type over 14 days: 2/day baseline for the 7 reference
    days, then a level shift to 9/day — a textbook CUSUM ramp — plus a
    second type with a single-day spike that must NOT flag (the case
    the 3σ test fires on but a slack-ed CUSUM absorbs). Rows are
    inserted day-scrambled so any order dependence fails."""
    rows = []
    eid = 0
    day_counts = {d: 2 for d in range(7)} | {d: 9 for d in range(7, 14)}
    for d in sorted(day_counts, key=lambda x: (x * 7) % 13):
        for i in range(day_counts[d]):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 10, i), 1, "shift", 0.0)
            )
    for d in range(10):
        n = 8 if d == 5 else 3
        for i in range(n):
            eid += 1
            rows.append(
                (eid, dt.datetime(2024, 3, 1 + d, 11, i), 2, "spike", 0.0)
            )
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )


def _python_cusum(day_counts: dict[str, int]) -> dict[str, tuple[int, bool]]:
    """Independent recursion, written from the definition."""
    r = eventstream.CUSUM_REF_DAYS
    s = eventstream.CUSUM_SLACK_SCALED
    h = eventstream.CUSUM_H_SCALED
    days = sorted(day_counts)
    ref_sum = sum(day_counts[d] for d in days[:r])
    out, c = {}, 0
    for d in days:
        c = max(0, c + r * day_counts[d] - ref_sum - s)
        out[d] = (c, c > h)
    return out


def test_cusum_matches_pure_python_recursion(spark):
    ev = _events(spark)
    got = {
        (r["event_type"], r["day"]): (r["cusum"], r["shift_flag"])
        for r in eventstream.cusum_shift_flags({"events": ev}).collect()
    }
    raw = Counter(
        (r["event_type"], r["ts"].strftime("%Y-%m-%d")) for r in ev.collect()
    )
    for etype in ("shift", "spike"):
        series = {d: n for (t, d), n in raw.items() if t == etype}
        expect = _python_cusum(series)
        for d, (c, f) in expect.items():
            assert got[(etype, d)] == (c, f), (etype, d, got[(etype, d)], (c, f))


def test_cusum_flags_level_shift_not_spike(spark):
    out = eventstream.cusum_shift_flags({"events": _events(spark)}).collect()
    flagged = {r["event_type"] for r in out if r["shift_flag"]}
    # the sustained 2→9/day shift must cross H within its 7 shifted
    # days: ref_sum=14, each shifted day adds 7·9−14−14 = 35 > 0, so
    # cusum reaches 245 > 140 by day 7 of the shift
    assert "shift" in flagged
    # the single-day 3→8 spike adds 7·8−21−14 = 21 once, then drains at
    # 7·3−21−14 = −14/day — never near 140
    assert "spike" not in flagged
