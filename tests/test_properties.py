"""Property-based tests (hypothesis): operator invariants on generated
data. Each example packs its whole case list into ONE DataFrame so a
test runs a handful of Spark jobs, not hundreds."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.functions.expr import (
    clean_text,
    null_default,
    surrogate_key,
)

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd", "Zs"),
            whitelist_characters="\t\n\r äöüñ",
        ),
        max_size=60,
    ),
    min_size=1,
    max_size=30,
)

SLOW_OK = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=TEXTS)
@SLOW_OK
def test_clean_text_idempotent_and_single_spaced(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    out = df.select(
        clean_text("s").alias("once"),
        clean_text(clean_text("s")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]  # idempotent
        assert "  " not in r["once"]  # no runs
        assert r["once"] == r["once"].strip()  # trimmed
        for ws in ("\t", "\n", "\r"):
            assert ws not in r["once"]


@given(keys=st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=30))
@SLOW_OK
def test_surrogate_keys_deterministic_and_injective_on_distinct(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = df.select("k", surrogate_key("k").alias("sk")).collect()
    by_key = {}
    for r in out:
        # same key always same surrogate
        assert by_key.setdefault(r["k"], r["sk"]) == r["sk"]
    # distinct keys → distinct surrogates (sha2 collision ≈ impossible)
    assert len({r["sk"] for r in out}) == len({r["k"] for r in out})


@given(
    vals=st.lists(
        st.one_of(st.none(), st.text(max_size=10)), min_size=1, max_size=30
    )
)
@SLOW_OK
def test_null_default_total(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    out = df.select(null_default("s").alias("d")).collect()
    assert all(r["d"] is not None for r in out)
    assert sum(r["d"] == "Unknown" for r in out) >= sum(v is None for v in vals)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),  # key
            st.integers(min_value=0, max_value=100_000),  # seconds offset
        ),
        min_size=2,
        max_size=60,
    ),
    gap=st.integers(min_value=10, max_value=5000),
)
@SLOW_OK
def test_range_join_equals_naive_property(spark, rows, gap):
    from data_engineering_course_project_2023_spark.operators.temporal import (
        bucketized_range_join,
    )

    base = 1_700_000_000
    df = spark.createDataFrame(
        [(k, base + s, i) for i, (k, s) in enumerate(rows)],
        "k int, epoch long, rid int",
    ).select("k", F.timestamp_seconds("epoch").alias("ts"), "rid")
    left = df.select("k", F.col("ts").alias("lts"), F.col("rid").alias("lid"))
    right = df.select("k", F.col("ts").alias("rts"), F.col("rid").alias("rid"))
    fast = {
        (r["lid"], r["rid"])
        for r in bucketized_range_join(left, right, "k", "lts", "rts", gap).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .filter(F.abs(F.unix_timestamp("lts") - F.unix_timestamp("rts")) <= gap)
        .collect()
    }
    assert fast == naive


@given(
    hist=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Ll", "Nd")),
                min_size=1, max_size=20),
        min_size=1, max_size=30),
    fresh=st.lists(
        st.text(alphabet=st.characters(whitelist_categories=("Lu",)),
                min_size=1, max_size=20),
        min_size=1, max_size=30),
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bloom_never_false_negative(spark, hist, fresh):
    """PROPERTY: for any history and any probe batch, every probe key
    that IS in the history is filtered out (Bloom admits false
    positives, never false negatives). Lowercase/digit history vs
    uppercase fresh keys guarantees the two pools are disjoint."""
    from data_engineering_course_project_2023_spark.operators import dedup

    hist_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hist)], "doc_id int, text string"
    )
    probe = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(hist)]
        + [(1000 + i, t) for i, t in enumerate(fresh)],
        "doc_id int, text string",
    )
    bitmap = dedup.bloom_build_bitmap(hist_df, "text")
    surviving = {
        r["text"] for r in dedup.bloom_novel(probe, bitmap, "text").collect()
    }
    assert surviving.isdisjoint(set(hist))


@given(
    rows=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 12)),
        min_size=1, max_size=60,
    ),
)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_coorder_pair_stream_equals_self_join(spark, rows):
    """PROPERTY: the map-side array pair build is EXACTLY the distinct
    items self-join it replaced — same (src, dst, count) multiset for
    any (order, part) multiset, duplicates and singleton orders
    included. Guards the graph-family refactor forever."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.plans.analytics import (
        coorder_pair_stream,
    )

    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r["src"], r["dst"], r["n"])
        for r in coorder_pair_stream(li)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    want = {
        (r["src"], r["dst"], r["n"])
        for r in a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
