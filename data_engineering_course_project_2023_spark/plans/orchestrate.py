"""Operational stage runner (SURVEY §3.1's Airflow layer): the
reference's DAG semantics — each stage materializes to storage, reruns
SKIP completed stages, failed stages retry and resume — re-expressed
over Spark's own atomicity primitives.

Reference behaviors mirrored (src/airflow/dags/*.py):
- TriggerDagRunOperator chain        → explicit stage list (toposorted)
- per-task retries                   → bounded in-process retry loop
- idempotent re-runs / backfills     → skip-if-done on the _SUCCESS
  marker Spark's parquet committer writes ATOMICALLY at job commit (a
  failed write leaves no marker, so the next run recomputes — no
  partial-output reads, the exact property Airflow task idempotency
  assumes of its operators)
- inter-stage handoff via files      → each stage reads the PARQUET
  output of its upstreams (not their lazy plans), so a resumed run is
  bit-identical to a fresh one and a 100 TB run can restart from the
  last good stage instead of hour-zero.

This is deliberately NOT a scheduler — no cron, no distributed locks;
it is the stage-materialization contract those schedulers call into.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    """One materialized pipeline stage.

    ``build`` receives {input stage name → DataFrame read back from that
    stage's parquet} plus the shared ``sources`` frames, and returns the
    stage's output frame.
    """

    name: str
    build: Callable[[dict[str, DataFrame]], DataFrame]
    inputs: tuple[str, ...] = field(default_factory=tuple)
    max_retries: int = 2


class StageFailure(RuntimeError):
    """A stage exhausted its retries; carries the stage name."""

    def __init__(self, stage: str, cause: Exception):
        super().__init__(f"stage '{stage}' failed after retries: {cause}")
        self.stage = stage


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_stages(
    spark: SparkSession,
    stages: list[Stage],
    root: str,
    sources: dict[str, DataFrame] | None = None,
    force: frozenset[str] = frozenset(),
) -> dict[str, dict]:
    """Run ``stages`` in list order (callers pass a valid topological
    order; names must be unique and inputs must refer to earlier
    stages). Returns a per-stage report {name: {status, attempts,
    path}} where status ∈ {done-skipped, done-built}.

    Completed stages (atomic _SUCCESS marker present) are SKIPPED
    unless named in ``force``; a stage that fails mid-write leaves no
    marker and is rebuilt on the next call, reading its upstreams from
    their materialized parquet — never recomputing them.
    """
    sources = sources or {}
    seen: set[str] = set()
    report: dict[str, dict] = {}
    for st in stages:
        if st.name in seen:
            raise ValueError(f"duplicate stage name: {st.name}")
        missing = [i for i in st.inputs if i not in seen and i not in sources]
        if missing:
            raise ValueError(f"stage '{st.name}' depends on {missing} "
                             "which run later or never")
        seen.add(st.name)

        out = os.path.join(root, st.name)
        if _done(out) and st.name not in force:
            report[st.name] = {"status": "done-skipped", "attempts": 0,
                               "path": out}
            continue

        upstream = {
            i: (sources[i] if i in sources
                else spark.read.parquet(os.path.join(root, i)))
            for i in st.inputs
        }
        last: Exception | None = None
        for attempt in range(1, st.max_retries + 2):
            try:
                st.build(upstream).write.mode("overwrite").parquet(out)
                report[st.name] = {"status": "done-built",
                                   "attempts": attempt, "path": out}
                break
            except Exception as e:  # noqa: BLE001 — retry loop boundary
                last = e
                time.sleep(0)  # yield; a scheduler would back off here
        else:
            raise StageFailure(st.name, last)  # type: ignore[arg-type]
    return report


# --- time trigger (the reference's weekly cron, as a testable seam) ----------
def due_run_dates(
    anchor: str,
    interval_days: int,
    now: str,
) -> list[str]:
    """Logical run dates due by ``now`` — Airflow's schedule_interval +
    catchup semantics as a PURE function (reference:
    src/airflow/dags/download_dataset_stage_1.py:24 runs weekly): one
    run per interval boundary in [anchor, now), each labeled by its
    interval START (Airflow's execution_date convention — the run FOR
    week W fires after W closes). Pure date arithmetic so the trigger
    is unit-testable with any clock and identical on every host."""
    from datetime import date, timedelta

    a = date.fromisoformat(anchor)
    n = date.fromisoformat(now)
    out: list[str] = []
    cur = a
    while cur + timedelta(days=interval_days) <= n:
        out.append(cur.isoformat())
        cur += timedelta(days=interval_days)
    return out


def run_scheduled(
    spark: SparkSession,
    stages: list[Stage],
    root: str,
    anchor: str,
    interval_days: int,
    now: str,
    sources_for: Callable[[str], dict[str, DataFrame]] | None = None,
) -> dict[str, dict]:
    """The scheduler leg over :func:`run_stages`: every logical run due
    by ``now`` (catchup included — a host down for three weeks runs
    three backfills, the Airflow behavior) executes the DAG under its
    own ``root/run=<date>`` subtree. State is DERIVED, not stored: a
    run is complete iff its final stage's atomic _SUCCESS marker
    exists, so re-invocations are idempotent and a run that died
    mid-DAG resumes from its last good stage on the next trigger —
    no scheduler database, no locks, the markers ARE the state.
    ``now`` is injected (no wall-clock read) so tests drive a virtual
    clock and production passes its own notion of now."""
    report: dict[str, dict] = {}
    final = stages[-1].name
    for run_date in due_run_dates(anchor, interval_days, now):
        run_root = os.path.join(root, f"run={run_date}")
        if _done(os.path.join(run_root, final)):
            report[run_date] = {"status": "run-skipped"}
            continue
        srcs = sources_for(run_date) if sources_for else None
        stage_report = run_stages(spark, stages, run_root, sources=srcs)
        built = any(
            v["status"] == "done-built" for v in stage_report.values()
        )
        report[run_date] = {
            "status": "run-built" if built else "run-skipped",
            "stages": stage_report,
        }
    return report
