"""S13': ES-bulk search-index sink — payload contract, idempotent
replay, and checkpointed restart against an in-process HTTP server
(the tests/test_sources.py fetch precedent; no external service).
Reference contract: logstash.conf:11's daily-rotated index."""

from __future__ import annotations

import json
import threading

import pytest

from data_engineering_course_project_2023_spark.streaming import es_sink


def _start_bulk_server():
    """In-process ES-shaped endpoint: POST /_bulk upserts into a shared
    dict keyed by (_index, _id); returns (url, docs, requests, close)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    docs: dict = {}
    requests: list = []
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            assert self.path == "/_bulk"
            n = int(self.headers["Content-Length"])
            lines = self.rfile.read(n).decode("utf-8").splitlines()
            with lock:
                requests.append(len(lines))
                for i in range(0, len(lines), 2):
                    action = json.loads(lines[i])["index"]
                    src = json.loads(lines[i + 1])
                    docs[(action["_index"], action["_id"])] = src
            body = json.dumps({"errors": False}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    return url, docs, requests, srv.shutdown


def test_bulk_payload_ids_routing_and_chunking():
    """Deterministic _id = day|level, daily index routing, and
    batch_size chunking (2 lines per action)."""
    rows = [
        {"day": "2024-01-05", "level": "INFO", "n_lines": 7},
        {"day": "2024-01-05", "level": "ERROR", "n_lines": 1},
        {"day": "2024-01-06", "level": "INFO", "n_lines": 2},
    ]
    payloads = list(es_sink.bulk_payloads(rows, "logs", batch_size=2))
    assert len(payloads) == 2  # 3 actions chunked at 2/request
    first = payloads[0].splitlines()
    assert json.loads(first[0]) == {
        "index": {"_index": "logs-2024-01-05", "_id": "2024-01-05|INFO"}
    }
    assert json.loads(first[1]) == {
        "day": "2024-01-05", "level": "INFO", "n_lines": 7
    }
    assert payloads[0].endswith("\n")


def _log_line(ts: str, level: str, i: int) -> str:
    return f"[{ts},123] {{dag.task}} {level} - line {i}"


def test_stream_to_es_checkpointed_restart_idempotent(spark, tmp_path):
    """The full serving leg: file-stream → daily rollup → bulk sink.
    (a) first run indexes the batch-twin counts; (b) re-running the
    sink on the same microbatch (foreachBatch replay) leaves the doc
    store IDENTICAL (deterministic _ids upsert); (c) a checkpointed
    restart over appended lines re-emits only updated rollups and the
    store converges to the batch twin over ALL lines."""
    from data_engineering_course_project_2023_spark.streaming.loganalytics import (
        daily_level_counts,
        parse_log_lines,
    )

    url, docs, requests, close = _start_bulk_server()
    logs = tmp_path / "logs"
    logs.mkdir()
    ckpt = str(tmp_path / "ckpt")
    (logs / "a.log").write_text(
        "\n".join(
            [_log_line("2024-01-05 10:00:00", "INFO", i) for i in range(3)]
            + [_log_line("2024-01-05 11:00:00", "ERROR", 0)]
            + [_log_line("2024-01-06 09:00:00", "INFO", 0)]
        )
        + "\n"
    )
    try:
        q = es_sink.stream_daily_counts_to_es(
            spark, str(logs), ckpt, url, trigger_available_now=True
        )
        q.awaitTermination(120)

        def twin() -> dict:
            rows = daily_level_counts(
                parse_log_lines(spark.read.text(str(logs)))
            ).collect()
            return {
                (f"logs-{r['day']}", f"{r['day']}|{r['level']}"): {
                    "day": r["day"], "level": r["level"],
                    "n_lines": r["n_lines"],
                }
                for r in rows
            }

        assert docs == twin() and len(docs) == 3

        # (b) foreachBatch replay: same rollup, same sink — store unchanged
        before = dict(docs)
        batch = daily_level_counts(parse_log_lines(spark.read.text(str(logs))))
        es_sink.es_bulk_sink(url)(batch, 999)
        assert docs == before

        # (c) append WITHIN the persisted watermark (run 1's max ts is
        # 2024-01-06 09:00, watermark 1 h ⇒ anything older than 08:00
        # is correctly dropped as late — so the bump targets the latest
        # day): one more INFO on the 6th (count bump) + a new WARN
        (logs / "b.log").write_text(
            _log_line("2024-01-06 09:30:00", "INFO", 1)
            + "\n"
            + _log_line("2024-01-06 10:00:00", "WARN", 0)
            + "\n"
        )
        q2 = es_sink.stream_daily_counts_to_es(
            spark, str(logs), ckpt, url, trigger_available_now=True
        )
        q2.awaitTermination(120)
        assert docs == twin() and len(docs) == 4
        assert docs[("logs-2024-01-06", "2024-01-06|INFO")]["n_lines"] == 2
    finally:
        close()
