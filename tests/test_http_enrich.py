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
