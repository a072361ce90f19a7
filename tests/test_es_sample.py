"""X4 Efraimidis–Spirakis exact-size weighted sample: the fixed-size
guarantee Bernoulli sampling can't give, plus an independent pure-
Python recomputation of the frozen exponential key (the guard against
"Spark and DuckDB agree but both spell the hash wrong"). Oracle parity
runs in test_oracle_parity via the registry."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from data_engineering_course_project_2023_spark.plans import llmops

from .conftest import SF_CORRECT


def _e_micro_ref(doc_id: int) -> int:
    h = int(hashlib.md5(f"{doc_id}:es".encode()).hexdigest()[:15], 16)
    x = -math.log((h + 1) / float(1 << 60)) * 1e6
    # Spark F.round is HALF_UP; Python round() is banker's — match Spark
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_exact_size_per_stratum_and_key_freeze(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    out = llmops.es_weighted_sample({"documents": docs}).collect()
    by_source: dict[str, list] = {}
    for r in out:
        by_source.setdefault(r["source"], []).append(r)
    stratum_sizes = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert set(by_source) == set(stratum_sizes)
    for src, rows in by_source.items():
        # EXACT size: min(K, stratum) rows, ranks contiguous from 1
        assert len(rows) == min(llmops.ES_K, stratum_sizes[src])
        assert sorted(r["rk"] for r in rows) == list(range(1, len(rows) + 1))
    # the frozen key is the md5-derived exponential variate, verified
    # off-engine for every sampled doc
    for r in out[:200]:
        assert r["e_micro"] == _e_micro_ref(r["doc_id"])


def test_dsir_quota_sample_biases_toward_high_quartiles(spark):
    """The composed score→weight→sample pipeline must actually BIAS:
    ES inclusion probability rises with the DSIR quartile, so the
    sampled docs' mean quartile must sit above the population mean of
    2.5 (deterministic data ⇒ a fixed, re-runnable value)."""
    from data_engineering_course_project_2023_spark.plans.llmops import (
        DQ_K,
        dsir_quota_sample,
    )

    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    rows = dsir_quota_sample({"documents": docs}).collect()
    assert rows
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
        assert 1 <= r["w"] <= 4
    assert all(n <= DQ_K for n in per_source.values())
    mean_w = sum(r["w"] for r in rows) / len(rows)
    assert mean_w > 2.5, mean_w
