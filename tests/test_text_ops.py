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
