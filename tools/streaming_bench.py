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


def progress_stats(query) -> dict:
    """Distill recentProgress into rows / batches / latency stats."""
    rows = 0
    durs: list[float] = []
    for p in query.recentProgress:
        rows += int(p["numInputRows"])
        te = (p.get("durationMs") or {}).get("triggerExecution")
        if te is not None and int(p["numInputRows"]) > 0:
            durs.append(float(te))
    return {
        "input_rows": rows,
        "batches": len(durs),
        "batch_ms_p50": round(statistics.median(durs), 1) if durs else None,
        "batch_ms_max": round(max(durs), 1) if durs else None,
    }


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
    args = ap.parse_args()

    from data_engineering_course_project_2023_spark.session import get_spark
    from data_engineering_course_project_2023_spark.streaming import (
        es_sink,
        hdrsketch,
        loganalytics,
    )

    spark = get_spark(app_name="streaming_bench")
    spark.sparkContext.setLogLevel("ERROR")

    if os.path.exists(args.work):
        shutil.rmtree(args.work)
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
    st = progress_stats(q)
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
    st = progress_stats(q)
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
    st = progress_stats(q)
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
