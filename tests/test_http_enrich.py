"""HTTP enrichment seam: batching, rate pacing, miss handling."""

from __future__ import annotations

import time

from data_engineering_course_project_2023_spark.operators import http_enrich


def test_enrich_by_key_batches_and_misses(spark):
    # the fetcher runs inside the executor's python worker, so batching
    # evidence must travel through the OUTPUT (a closure list would stay
    # in the worker process)
    def fake_fetcher(keys):
        assert len(keys) <= 2, "batch_size exceeded"
        return {
            k: {"title": f"T-{k}", "batch_n": str(len(keys))}
            for k in keys
            if k != "miss"
        }

    df = spark.createDataFrame(
        [("a",), ("b",), ("miss",), ("a",)], "doi string"
    ).coalesce(1)
    out = http_enrich.enrich_by_key(
        df, "doi", fake_fetcher, ["title", "batch_n"], rps=1000, batch_size=2
    ).collect()
    got = {r["doi"]: r["title"] for r in out}
    assert got == {"a": "T-a", "b": "T-b", "miss": None}
    assert len(out) == 4  # row-preserving (dup key kept)
    # 3 unique keys at batch_size=2 → first chunk saw 2 keys
    assert {r["batch_n"] for r in out if r["batch_n"]} <= {"1", "2"}
    assert any(r["batch_n"] == "2" for r in out)


def test_rate_limit_paces_requests(spark):
    def slow_fetcher(keys):
        return {k: {"v": "x"} for k in keys}

    df = spark.createDataFrame([(str(i),) for i in range(6)], "k string").coalesce(1)
    t0 = time.perf_counter()
    http_enrich.enrich_by_key(
        df, "k", slow_fetcher, ["v"], rps=20, batch_size=2
    ).collect()
    elapsed = time.perf_counter() - t0
    # 3 requests at 20 rps → ≥ 2 inter-request gaps of 50ms
    assert elapsed >= 0.1


def test_fetcher_exception_is_all_miss(spark):
    def broken(keys):
        raise RuntimeError("http down")

    df = spark.createDataFrame([("a",)], "k string")
    out = http_enrich.enrich_by_key(df, "k", broken, ["v"], rps=1000).collect()
    assert out[0]["v"] is None  # job survives; miss is relational


def test_live_socket_enrichment_with_retry(spark):
    """End-to-end over a REAL socket: an in-process stdlib HTTP server
    plays the metadata API (deterministic responses, first request
    rejected 429 + Retry-After), and the urllib transport runs inside
    the executor's Python worker — exercising serialization of the
    fetcher closure, actual POST framing, rate pacing, retry, and the
    miss path, mirroring the reference fetchers' semantics
    (ref: src/utils/api.py:139-180)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from data_engineering_course_project_2023_spark.operators.http_enrich import (
        make_json_post_fetcher,
    )

    state = {"requests": 0, "batch_sizes": [], "rejected": 0}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            ids = json.loads(self.rfile.read(n))["ids"]
            with lock:
                state["requests"] += 1
                first = state["requests"] == 1
                if first:
                    state["rejected"] += 1
                else:
                    state["batch_sizes"].append(len(ids))
            if first:
                self.send_response(429)
                self.send_header("Retry-After", "0.05")
                self.end_headers()
                return
            out = {
                k: ({"title": f"T-{k}", "year": str(2000 + len(k))}
                    if k != "missing-doi" else None)
                for k in ids
            }
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        fetcher = make_json_post_fetcher(
            f"http://127.0.0.1:{port}/meta", max_retries=2, backoff=0.05
        )
        df = spark.createDataFrame(
            [("10.1/a",), ("10.1/bb",), ("missing-doi",), ("10.1/a",)],
            "doi string",
        ).coalesce(1)
        out = http_enrich.enrich_by_key(
            df, "doi", fetcher, ["title", "year"], rps=50, batch_size=2
        ).collect()
    finally:
        srv.shutdown()
        srv.server_close()

    got = {r["doi"]: (r["title"], r["year"]) for r in out}
    assert got["10.1/a"] == ("T-10.1/a", "2006")
    assert got["10.1/bb"] == ("T-10.1/bb", "2007")
    assert got["missing-doi"] == (None, None)  # null entry → miss
    assert len(out) == 4  # row-preserving
    # 3 unique keys at batch_size=2 → 2 successful requests, plus the
    # 429 replay of the first chunk
    assert state["rejected"] == 1
    assert sorted(state["batch_sizes"]) == [1, 2]
