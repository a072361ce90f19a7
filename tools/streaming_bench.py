"""Streaming throughput micro-bench (VERDICT_r8 #6).

The streaming surface has correctness pins (stream==batch twins,
checkpointed-restart idempotence, watermark semantics) but — until
round 9 — zero *performance* measurement. This bench runs the three
deployable jobs end-to-end under ``maxFilesPerTrigger`` pacing with an
``availableNow`` trigger (bounded replay of a continuous source — the
same pacing a production file-tail shows between checkpoints) and
records the engine's OWN per-microbatch numbers from
``StreamingQuery.recentProgress``:

- **loganalytics** (S13): readStream.text → parse → watermarked daily
  window agg (complete mode, memory sink);
- **hdr_daily_rollup_stream**: parquet file stream of the sf0.1
  events table → foreachBatch partial-HDR-sketch delta writes
  (the sketch-sized-state rollup — sink I/O included);
- **es_sink**: the same log tail bulk-indexed into an in-process
  HTTP /_bulk endpoint (update mode) — serving-sink latency included.

Reported per job: input rows, wall seconds, rows/s, microbatch count,
p50/max triggerExecution ms (the data-available→sink-committed latency
of a paced batch). One JSON doc → BENCH_STREAMING.json.

Usage:
  python -m tools.streaming_bench --sf /root/testdata/sf0.1 \
      --out BENCH_STREAMING.json [--lines 2000000] [--files 50]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LEVELS = ["INFO", "INFO", "INFO", "WARN", "ERROR", "DEBUG"]


def write_log_files(root: str, n_lines: int, n_files: int) -> None:
    """Airflow-ish log lines (FIXTURES.md §B7 shape), n_files files,
    timestamps spread over ~100 days so the daily window has real
    cardinality."""
    os.makedirs(root, exist_ok=True)
    per = n_lines // n_files
    for f in range(n_files):
        with open(os.path.join(root, f"task_{f:03d}.log"), "w") as fh:
            for i in range(per):
                g = f * per + i
                day = 1 + (g % 100)
                ts = f"2024-{1 + day // 31:02d}-{1 + day % 28:02d} " \
                     f"{g % 24:02d}:{g % 60:02d}:{(g * 7) % 60:02d}"
                lvl = LEVELS[g % len(LEVELS)]
                fh.write(
                    f"[{ts},123] {{dag_{f}.task_{g % 9}}} {lvl} - "
                    f"step {g} done\n"
                )


def _make_collector():
    """StreamingQueryListener that accumulates EVERY progress event.

    ``StreamingQuery.recentProgress`` retains only the last
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    updates — summing it silently undercounts any run with >100
    microbatches (ADVICE r9; the soak below runs 200+). The listener
    sees each event exactly once, so rows/batches/latency are exact at
    any batch count, and it also captures the per-batch
    ``stateOperators`` totals the soak's bounded-state evidence needs.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _Collector(StreamingQueryListener):
        def __init__(self):
            self.by_id: dict = {}
            self.terminated: set = set()

        def _rec(self, qid):
            return self.by_id.setdefault(
                qid, {"rows": 0, "durs": [], "state": []}
            )

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = json.loads(event.progress.json)
            r = self._rec(p["id"])
            n = int(p.get("numInputRows") or 0)
            r["rows"] += n
            te = (p.get("durationMs") or {}).get("triggerExecution")
            if te is not None and n > 0:
                r["durs"].append(float(te))
            ops = p.get("stateOperators") or []
            if ops:
                r["state"].append(
                    {
                        "batch": int(p.get("batchId", -1)),
                        "rows_total": sum(
                            int(o.get("numRowsTotal") or 0) for o in ops
                        ),
                        "mem_bytes": sum(
                            int(o.get("memoryUsedBytes") or 0) for o in ops
                        ),
                    }
                )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            self.terminated.add(str(event.id))

    return _Collector()


def _await_events(collector, qid: str, timeout: float = 15.0) -> None:
    """Listener events are delivered asynchronously — wait for the
    terminated marker so no tail-of-run progress event is missed."""
    t0 = time.monotonic()
    while str(qid) not in collector.terminated:
        if time.monotonic() - t0 > timeout:
            break
        time.sleep(0.2)


def progress_stats(collector, query) -> dict:
    """Distill the collector's exact event log for one query."""
    r = collector.by_id.get(str(query.id), {"rows": 0, "durs": []})
    durs = r["durs"]
    return {
        "input_rows": r["rows"],
        "batches": len(durs),
        "batch_ms_p50": round(statistics.median(durs), 1) if durs else None,
        "batch_ms_max": round(max(durs), 1) if durs else None,
    }


def write_event_files(
    root: str, n_files: int, rows_per_file: int,
    minutes_per_file: int = 30, dup_lookback: int = 2,
) -> None:
    """Deterministic event-time-ordered parquet shards for the soak:
    each file advances event time by ``minutes_per_file``, ~20% of its
    event_ids replay ids from the previous ``dup_lookback`` files
    (inside the 1 h watermark horizon → suppressed by the dedup
    operator, keeping its state exercised) and the rest are novel.
    With 30 min/file and a 1 h watermark, keys expire every ~2 batches
    — 200 files cross ~100 watermark expirations."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    base_us = 1_704_067_200_000_000  # 2024-01-01 UTC, micros
    for f in range(n_files):
        g = np.arange(rows_per_file, dtype=np.int64)
        fresh = f * rows_per_file + g
        # every 5th row replays an id from dup_lookback files back
        replay = np.maximum(f - dup_lookback, 0) * rows_per_file + g
        ids = np.where(g % 5 == 0, replay, fresh)
        secs = (f * minutes_per_file * 60) + (g * 7919) % (
            minutes_per_file * 60
        )
        tbl = pa.table({
            "event_id": pa.array(ids),
            # tz-aware: tz-naive arrow timestamps load as TIMESTAMP_NTZ,
            # which withWatermark rejects
            "ts": pa.array(base_us + secs * 1_000_000,
                           pa.timestamp("us", tz="UTC")),
            "user_id": pa.array(ids % 997),
            "event_type": pa.array(
                np.where(g % 3 == 0, "click",
                         np.where(g % 3 == 1, "view", "purchase"))
            ),
            "value": pa.array((ids % 10_000) / 100.0),
            "props": pa.array(["{}"] * rows_per_file),
        })
        pq.write_table(tbl, os.path.join(root, f"ev_{f:04d}.parquet"))


def _curve_summary(curve: list[dict]) -> dict:
    """Flat-or-bounded evidence from a per-batch state curve: peak,
    final, and a first-half vs second-half comparison (a leak grows
    monotonically; bounded state plateaus), plus a ~40-point
    downsample of the full curve for the committed artifact."""
    rows = [c["rows_total"] for c in curve]
    half = len(rows) // 2
    step = max(1, len(curve) // 40)
    return {
        "batches_with_state": len(rows),
        "rows_max": max(rows) if rows else 0,
        "rows_final": rows[-1] if rows else 0,
        "rows_first_half_max": max(rows[:half]) if rows[:half] else 0,
        "rows_second_half_max": max(rows[half:]) if rows[half:] else 0,
        "mem_bytes_max": max((c["mem_bytes"] for c in curve), default=0),
        "curve_downsampled": [
            {"batch": c["batch"], "rows_total": c["rows_total"]}
            for c in curve[::step]
        ],
    }


def run_soak(spark, collector, args) -> None:
    """VERDICT_r9 #7: ~200-microbatch soak with state-size evidence.

    Job A — ``dedup_events_stream`` (dropDuplicatesWithinWatermark):
    the real state-store operator. Expectation: numRowsTotal plateaus
    at ~(watermark horizon / file period) files' worth of keys and
    NEVER trends up across the run — watermark expiry keeps pace with
    ingestion at any run length.

    Job B — ``hdr_daily_rollup_stream``: the foreachBatch bucket-merge
    rollup. Its DESIGN claim is offsets-only streaming state (sketches
    live in the sink table, not the state store); the soak's evidence
    is an empty stateOperators list on every one of the 200 batches
    plus a flat per-batch latency curve (no per-batch cost growth as
    the sink table accumulates 200 delta partitions)."""
    from data_engineering_course_project_2023_spark.streaming import (
        hdrsketch,
        joins,
    )

    ev_dir = os.path.join(args.work, "soak_events")
    print(
        f"writing {args.soak_files} event files x {args.soak_rows} rows",
        flush=True,
    )
    write_event_files(ev_dir, args.soak_files, args.soak_rows)
    schema = spark.read.parquet(ev_dir).schema
    soak: dict = {
        "files": args.soak_files,
        "rows_per_file": args.soak_rows,
        "minutes_per_file": 30,
        "watermark": "1 hour",
    }

    # ---- job A: watermarked dedup (real state store) -------------------
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    out_rows = []
    q = (
        joins.dedup_events_stream(src, watermark="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _i: out_rows.append(df.count()))
        .option("checkpointLocation", os.path.join(args.work, "ck_soak_dd"))
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    q.awaitTermination()
    wall = round(time.monotonic() - t0, 3)
    _await_events(collector, q.id)
    rec = collector.by_id[str(q.id)]
    st = progress_stats(collector, q)
    st.update(
        wall_sec=wall,
        rows_per_sec=round(st["input_rows"] / wall),
        out_rows=int(sum(out_rows)),
        state=_curve_summary(rec["state"]),
    )
    soak["dedup_events_stream"] = st
    print("soak dedup:", json.dumps(
        {k: v for k, v in st.items() if k != "state"}
        | {"state_max": st["state"]["rows_max"],
           "state_final": st["state"]["rows_final"]}), flush=True)

    # ---- job B: HDR rollup (offsets-only claim) ------------------------
    src2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    table_dir = os.path.join(args.work, "soak_hdr_table")
    t0 = time.monotonic()
    q2 = hdrsketch.hdr_daily_rollup_stream(
        src2, table_dir, os.path.join(args.work, "ck_soak_hdr")
    )
    q2.awaitTermination()
    wall2 = round(time.monotonic() - t0, 3)
    _await_events(collector, q2.id)
    rec2 = collector.by_id[str(q2.id)]
    st2 = progress_stats(collector, q2)
    durs = rec2["durs"]
    half = len(durs) // 2
    st2.update(
        wall_sec=wall2,
        rows_per_sec=round(st2["input_rows"] / wall2),
        out_rows=hdrsketch.hdr_daily_from_table(spark, table_dir).count(),
        state_batches=len(rec2["state"]),  # design claim: 0
        batch_ms_p50_first_half=(
            round(statistics.median(durs[:half]), 1) if half else None
        ),
        batch_ms_p50_second_half=(
            round(statistics.median(durs[half:]), 1) if half else None
        ),
    )
    soak["hdr_daily_rollup_stream"] = st2
    print("soak hdr:", json.dumps(st2), flush=True)

    # ---- job C: stream-stream attribution join (two-sided state) -------
    # (VERDICT_r10 #6) The inner join holds click state watermark+gap
    # and purchase state watermark; with 30 min of event time per file
    # and a 1 h watermark, both sides must plateau at ~3 files' worth
    # of their event type and NEVER trend up across 200 batches.
    src3 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    out3 = []
    q3 = (
        joins.attribution_join_stream(src3, watermark="1 hour")
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _i: out3.append(df.count()))
        .option("checkpointLocation", os.path.join(args.work, "ck_soak_attr"))
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    q3.awaitTermination()
    wall3 = round(time.monotonic() - t0, 3)
    _await_events(collector, q3.id)
    rec3 = collector.by_id[str(q3.id)]
    st3 = progress_stats(collector, q3)
    st3.update(
        wall_sec=wall3,
        rows_per_sec=round(st3["input_rows"] / wall3),
        out_rows=int(sum(out3)),
        state=_curve_summary(rec3["state"]),
    )
    soak["attribution_join_stream"] = st3
    print("soak attribution:", json.dumps(
        {k: v for k, v in st3.items() if k != "state"}
        | {"state_max": st3["state"]["rows_max"],
           "state_final": st3["state"]["rows_final"]}), flush=True)

    # ---- job D: per-user funnel (applyInPandasWithState) ---------------
    # State is keyed by user_id (997 distinct in the generator) and
    # each user's candidate lists are clamped to t_view + 2×24 h, so
    # the curve's claim is DOUBLE-bounded: row count flat at the user
    # cardinality, and per-key payload bounded by the horizon clamp
    # (a leak in either shows as memory growth across 200 batches).
    from data_engineering_course_project_2023_spark.streaming import funnel

    src4 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(ev_dir)
    )
    out4 = []
    q4 = (
        funnel.funnel_stream(src4, watermark="1 hour")
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, _i: out4.append(df.count()))
        .option("checkpointLocation", os.path.join(args.work, "ck_soak_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    t0 = time.monotonic()
    q4.awaitTermination()
    wall4 = round(time.monotonic() - t0, 3)
    _await_events(collector, q4.id)
    rec4 = collector.by_id[str(q4.id)]
    st4 = progress_stats(collector, q4)
    st4.update(
        wall_sec=wall4,
        rows_per_sec=round(st4["input_rows"] / wall4),
        out_rows=int(sum(out4)),
        state=_curve_summary(rec4["state"]),
    )
    soak["funnel_stream"] = st4
    print("soak funnel:", json.dumps(
        {k: v for k, v in st4.items() if k != "state"}
        | {"state_max": st4["state"]["rows_max"],
           "state_final": st4["state"]["rows_final"]}), flush=True)

    doc = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            doc = json.load(f)
    doc["soak"] = soak
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({
        "soak_dedup_state_max": st["state"]["rows_max"],
        "soak_dedup_state_final": st["state"]["rows_final"],
        "soak_hdr_state_batches": st2["state_batches"],
        "soak_attr_state_max": st3["state"]["rows_max"],
        "soak_attr_state_final": st3["state"]["rows_final"],
        "soak_funnel_state_max": st4["state"]["rows_max"],
        "soak_funnel_state_final": st4["state"]["rows_final"],
    }))


def _start_bulk_server():
    """In-process ES-shaped /_bulk endpoint (same seam the pytest uses:
    the wire contract is HTTP bulk NDJSON; the real cluster is
    out-of-container by nature)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    stats = {"posts": 0, "docs": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = self.rfile.read(int(self.headers["Content-Length"]))
            n_docs = sum(
                1 for ln in body.decode().splitlines()
                if ln and '"index"' in ln
            )
            with lock:
                stats["posts"] += 1
                stats["docs"] += n_docs
            resp = b'{"errors": false, "items": []}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default="BENCH_STREAMING.json")
    ap.add_argument("--lines", type=int, default=2_000_000)
    ap.add_argument("--files", type=int, default=50)
    ap.add_argument("--files-per-trigger", type=int, default=5)
    ap.add_argument("--work", default="/tmp/streaming_bench")
    ap.add_argument(
        "--soak", action="store_true",
        help="long-run bounded-state soak (VERDICT_r9 #7): drive the "
        "two stateful/stateful-shaped jobs over --soak-files "
        "microbatches spanning many watermark expirations and record "
        "the per-batch stateOperators numRowsTotal curve — the "
        "evidence that state stays flat, not just that throughput is "
        "high. Results merge into --out under a 'soak' key.",
    )
    ap.add_argument("--soak-files", type=int, default=200)
    ap.add_argument("--soak-rows", type=int, default=5000)
    args = ap.parse_args()

    from data_engineering_course_project_2023_spark.session import get_spark
    from data_engineering_course_project_2023_spark.streaming import (
        es_sink,
        hdrsketch,
        loganalytics,
    )

    spark = get_spark(app_name="streaming_bench")
    spark.sparkContext.setLogLevel("ERROR")
    collector = _make_collector()
    spark.streams.addListener(collector)

    if os.path.exists(args.work):
        shutil.rmtree(args.work)

    if args.soak:
        run_soak(spark, collector, args)
        return

    log_dir = os.path.join(args.work, "logs")
    print(f"writing {args.lines} log lines / {args.files} files", flush=True)
    write_log_files(log_dir, args.lines, args.files)

    results: dict[str, dict] = {}

    # ---- job 1: loganalytics daily window agg -------------------------
    lines = (
        spark.readStream.option("maxFilesPerTrigger", args.files_per_trigger)
        .text(log_dir)
    )
    agg = loganalytics.daily_level_counts(
        loganalytics.parse_log_lines(lines)
    )
    t0 = time.monotonic()
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sb_log_counts")
        .option("checkpointLocation", os.path.join(args.work, "ck_log"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = round(time.monotonic() - t0, 3)
    _await_events(collector, q.id)
    st = progress_stats(collector, q)
    st.update(wall_sec=wall, rows_per_sec=round(st["input_rows"] / wall))
    st["out_rows"] = spark.table("sb_log_counts").count()
    results["loganalytics_daily_counts"] = st
    print("loganalytics:", json.dumps(st), flush=True)

    # ---- job 2: HDR daily rollup over the events table ----------------
    ev_dir = os.path.join(args.work, "events_files")
    events = spark.read.parquet(os.path.join(args.sf, "events.parquet"))
    events.repartition(32).write.parquet(ev_dir)
    ev_stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(ev_dir)
    )
    table_dir = os.path.join(args.work, "hdr_table")
    t0 = time.monotonic()
    q = hdrsketch.hdr_daily_rollup_stream(
        ev_stream, table_dir, os.path.join(args.work, "ck_hdr")
    )
    q.awaitTermination()
    wall = round(time.monotonic() - t0, 3)
    _await_events(collector, q.id)
    st = progress_stats(collector, q)
    st.update(wall_sec=wall, rows_per_sec=round(st["input_rows"] / wall))
    st["out_rows"] = hdrsketch.hdr_daily_from_table(spark, table_dir).count()
    results["hdr_daily_rollup_stream"] = st
    print("hdr_rollup:", json.dumps(st), flush=True)

    # ---- job 3: ES bulk serving sink ----------------------------------
    srv, es_stats = _start_bulk_server()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    t0 = time.monotonic()
    q = es_sink.stream_daily_counts_to_es(
        spark, log_dir, os.path.join(args.work, "ck_es"), endpoint,
        max_files_per_trigger=args.files_per_trigger,
    )
    q.awaitTermination()
    wall = round(time.monotonic() - t0, 3)
    srv.shutdown()
    _await_events(collector, q.id)
    st = progress_stats(collector, q)
    st.update(wall_sec=wall, rows_per_sec=round(st["input_rows"] / wall))
    st["bulk_posts"] = es_stats["posts"]
    st["docs_indexed"] = es_stats["docs"]
    results["es_bulk_sink"] = st
    print("es_sink:", json.dumps(st), flush=True)

    doc = {
        "metric": "streaming_throughput",
        "unit": "rows_per_sec",
        "jobs": results,
        "config": {
            "lines": args.lines,
            "files": args.files,
            "files_per_trigger": args.files_per_trigger,
            "sf_dir": args.sf,
        },
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({k: v["rows_per_sec"] for k, v in results.items()}))


if __name__ == "__main__":
    main()
