"""PII redaction: the scrub pass runs before tokenization, so it must
catch every pattern class, count without double-counting, and leave
clean text untouched. The synthetic documents table contains no PII, so
this operator is exercised on a constructed fixture (the registry's
oracle gate would only ever see zero redactions)."""

from __future__ import annotations

from data_engineering_course_project_2023_spark.operators.text import redact_pii


def test_redact_pii_all_classes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@example.co.uk today"),
            (2, "ssn 123-45-6789 and server 10.0.255.7 down"),
            (3, "call +1 (415) 555-0199 now"),
            (4, "nothing sensitive here at all"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}

    assert out[1]["redacted"] == "mail me at [EMAIL] today"
    assert out[1]["n_redactions"] == 1
    # SSN tagged as SSN (not swallowed by the phone pattern), IP as IPV4
    assert out[2]["redacted"] == "ssn [SSN] and server [IPV4] down"
    assert out[2]["n_redactions"] == 2
    assert out[3]["redacted"] == "call [PHONE] now"
    assert out[3]["n_redactions"] == 1
    assert out[4]["redacted"] == out[4]["text"]
    assert out[4]["n_redactions"] == 0
    assert out[5]["n_redactions"] == 0


def test_redact_pii_multiple_hits_one_doc(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io or c@d.io, host 1.2.3.4")], "doc_id long, text string"
    )
    row = redact_pii(df).collect()[0]
    assert row["redacted"] == "[EMAIL] or [EMAIL], host [IPV4]"
    assert row["n_redactions"] == 3


def test_rolling_fingerprint_order_sensitive_and_empty_safe(spark):
    from data_engineering_course_project_2023_spark.operators.text import (
        rolling_fingerprint,
    )

    df = spark.createDataFrame(
        [
            (1, "hello world"),
            (2, "world hello"),  # same tokens, different order
            (3, "hello world"),  # exact copy of doc 1
            (4, ""),
            (5, "   "),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["fp"]
        for r in df.select("doc_id", rolling_fingerprint("text").alias("fp")).collect()
    }
    assert out[1] == out[3]  # identical text → identical fingerprint
    assert out[1] != out[2]  # order matters (unlike a bag-of-words hash)
    assert out[4] == 0 and out[5] == 0  # empty fold = seed
    assert all(0 <= v < 2147483647 for v in out.values())


def test_dup_trigram_ratio_bounds(spark):
    from data_engineering_course_project_2023_spark.operators.text import (
        dup_trigram_ratio,
        trigrams,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # heavy repetition
            (2, "one two three four five"),  # all distinct
            (3, "too short"),  # < 3 tokens → no trigrams
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(trigrams("text")).alias("n_tri"),
            dup_trigram_ratio("text").alias("ratio"),
        ).collect()
    }
    # 9 tokens → 7 trigrams, only 3 distinct ("a b c","b c a","c a b")
    assert rows[1]["n_tri"] == 7
    assert abs(rows[1]["ratio"] - 4 / 7) < 1e-12
    assert rows[2]["ratio"] == 0.0
    assert rows[3]["n_tri"] == 0 and rows[3]["ratio"] == 0.0
    assert rows[4]["n_tri"] == 0 and rows[4]["ratio"] == 0.0


def test_chunk_dedup_detects_verbatim_block_only(spark):
    """A 32-token block copied verbatim into another doc is flagged;
    a shared run shorter than one chunk is not (chunk granularity is
    the documented contract — finer repeats need a second stride)."""
    from data_engineering_course_project_2023_spark.plans.llmops import (
        chunk_dedup_spans,
    )

    block = " ".join(f"tok{i}" for i in range(32))
    short = " ".join(f"sh{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, block + " " + " ".join(f"a{i}" for i in range(32))),
            (2, block + " " + " ".join(f"b{i}" for i in range(32))),
            (3, short + " " + " ".join(f"c{i}" for i in range(24))),
            (4, short + " " + " ".join(f"d{i}" for i in range(24))),
        ],
        "doc_id long, text string",
    )
    out = chunk_dedup_spans({"documents": docs}).collect()
    # exactly one duplicated chunk: the aligned 32-token block in docs 1+2
    assert len(out) == 1
    row = out[0]
    assert row["n_docs"] == 2 and row["n_copies"] == 2 and row["first_doc"] == 1
