"""Stream-stream join and watermarked-dedup twins: the streaming
operators must converge to their batch twins through checkpointed
``availableNow`` runs, including across a restart."""

from __future__ import annotations

from datetime import datetime

from data_engineering_course_project_2023_spark.streaming import joins

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def _run(stream_df, ckpt, out):
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_attribution_stream_equals_batch(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    t = datetime(2024, 1, 1, 10, 0)

    def at(minute):
        return t.replace(minute=minute)

    rows = [
        (1, at(0), 7, "click", 0.0),
        (2, at(5), 7, "purchase", 9.99),   # 300 s after click 1 → match
        (3, at(20), 7, "purchase", 5.00),  # 1200 s after click 1 → no match
        (4, at(1), 8, "click", 0.0),
        (5, at(2), 8, "click", 0.0),
        (6, at(9), 8, "purchase", 1.25),   # within gap of BOTH clicks
        (7, at(3), 9, "purchase", 2.50),   # user 9 never clicked
    ]
    _write(spark, src, rows)

    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    _run(joins.attribution_join_stream(stream), ckpt, out)

    got = sorted(
        (r["purchase_id"], r["click_id"], r["user_id"], r["gap_seconds"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["purchase_id"], r["click_id"], r["user_id"], r["gap_seconds"])
        for r in joins.attribution_join_batch(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    )
    assert got == want
    assert (6, 4, 8, 480) in got and (6, 5, 8, 420) in got
    assert all(p != 3 and p != 7 for p, *_ in got)


def test_dedup_stream_suppresses_replays_across_restart(spark, tmp_path):
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    t = datetime(2024, 1, 1, 10, 0)

    # batch 1: event 1 replayed twice, event 2 once
    _write(
        spark,
        src,
        [
            (1, t, 7, "click", 1.0),
            (1, t, 7, "click", 1.0),
            (2, t.replace(minute=1), 8, "view", 2.0),
        ],
    )
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    _run(joins.dedup_events_stream(stream), ckpt, out)

    # batch 2 after restart: event 2 replayed (state still within the
    # watermark horizon → suppressed) plus a fresh event 3
    _write(
        spark,
        src,
        [
            (2, t.replace(minute=1), 8, "view", 2.0),
            (3, t.replace(minute=2), 9, "purchase", 3.0),
        ],
    )
    stream2 = spark.readStream.schema(_SCHEMA).parquet(src)
    _run(joins.dedup_events_stream(stream2), ckpt, out)

    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]

    batch = joins.dedup_events_batch(
        spark.read.parquet(src)
    ).select("event_id")
    assert sorted(r["event_id"] for r in batch.collect()) == [1, 2, 3]


def test_stream_to_jdbc_loads_warehouse(spark, tmp_path):
    """foreachBatch streaming load into embedded Derby: all rows land;
    a checkpointed re-run with no new input writes nothing more
    (committed batch ids are not re-executed)."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ck")
    t = datetime(2024, 1, 1, 10, 0)
    _write(spark, src, [(1, t, 7, "click", 1.0), (2, t, 8, "view", 2.0)])

    url = "jdbc:derby:memory:graftstream;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    stream = spark.readStream.schema(_SCHEMA).parquet(src).select(
        "event_id", "user_id", "event_type"
    )
    q = joins.stream_to_jdbc(stream, "fact_events", url, ckpt, properties=props)
    q.awaitTermination(120)

    def read_back():
        return sorted(
            r["event_id"]
            for r in spark.read.format("jdbc")
            .options(url=url, dbtable="fact_events", **props)
            .load()
            .collect()
        )

    assert read_back() == [1, 2]

    # restart with no new data: nothing re-appended
    stream2 = spark.readStream.schema(_SCHEMA).parquet(src).select(
        "event_id", "user_id", "event_type"
    )
    q2 = joins.stream_to_jdbc(stream2, "fact_events", url, ckpt, properties=props)
    q2.awaitTermination(120)
    assert read_back() == [1, 2]


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-STATIC join: a streaming fact enriched against a static
    dimension (the broadcast-enrichment pattern at ingest time) lands
    on the same result as the batch join — and the static side needs no
    watermark/state at all."""
    import shutil

    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.sources.readers import load_table
    from data_engineering_course_project_2023_spark.streaming import with_event_time

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    dim = (
        events.select("user_id").distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold")
                    .otherwise("standard"))
    )
    batch = {
        (r["tier"], r["n"]) for r in
        events.join(dim, "user_id").groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    src = str(tmp_path / "ss_src")
    events.repartition(2).write.parquet(src)
    stream_in = with_event_time(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    agg = (
        stream_in.join(F.broadcast(dim), "user_id")
        .groupBy("tier").agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = str(tmp_path / "ss_ck")
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("ss_join").option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["tier"], r["n"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert streamed == batch
    shutil.rmtree(ckpt, ignore_errors=True)


def test_novelty_ingest_stream_equals_batch(spark, tmp_path):
    """Streaming incremental novelty: history hits dropped via the
    stateless stream-static anti join, within-stream replays suppressed
    by watermarked fingerprint state — including across a checkpointed
    restart — and the surviving set equals the batch twin."""
    from data_engineering_course_project_2023_spark.streaming.joins import (
        novelty_ingest_batch,
        novelty_ingest_stream,
    )

    doc_schema = "doc_id long, text string, source string, ingest_ts timestamp"
    src, ckpt, out = (str(tmp_path / d) for d in ("nsrc", "nck", "nout"))
    t = datetime(2024, 1, 1, 10, 0)

    history = spark.createDataFrame(
        [(100, "old doc alpha", "h"), (101, "old doc beta", "h")],
        "doc_id long, text string, source string",
    )

    def write_batch(rows):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(doc_schema).parquet(src)
        q = (
            novelty_ingest_stream(stream, history)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: one history dup, one fresh doc replayed twice, one fresh
    write_batch(
        [
            (1, "old doc alpha", "crawl", t),            # in history → drop
            (2, "fresh doc one", "crawl", t),
            (2, "fresh doc one", "crawl", t),            # replay → once
            (3, "fresh doc two", "crawl", t.replace(minute=1)),
        ]
    )
    run()
    # batch 2 after restart: replay of doc 2 (state within watermark →
    # suppressed), another history dup, one new doc
    write_batch(
        [
            (2, "fresh doc one", "crawl", t.replace(minute=2)),
            (4, "old doc beta", "crawl", t.replace(minute=2)),  # history
            (5, "fresh doc three", "crawl", t.replace(minute=3)),
        ]
    )
    run()

    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert got == [2, 3, 5]

    batch = novelty_ingest_batch(spark.read.parquet(src), history)
    assert sorted(r["doc_id"] for r in batch.collect()) == [2, 3, 5]


def test_streaming_topk_snapshot_equals_batch(spark, tmp_path):
    """Heavy-hitters snapshot: the foreachBatch top-k overwrite must
    equal the batch twin over everything ingested, including across a
    checkpointed restart (complete-mode state survives; the snapshot
    reflects ALL batches, not just the last)."""
    from data_engineering_course_project_2023_spark.streaming.topk import (
        topk_snapshot_stream,
        topk_tokens_batch,
    )

    doc_schema = "doc_id long, text string"
    src, ckpt, out = (str(tmp_path / d) for d in ("tsrc", "tck", "tout"))

    def write_batch(rows):
        spark.createDataFrame(rows, doc_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        stream = spark.readStream.schema(doc_schema).parquet(src)
        q = topk_snapshot_stream(stream, out, ckpt, k=3)
        q.awaitTermination(120)

    write_batch([(1, "apple apple banana"), (2, "apple cherry cherry")])
    run()
    write_batch([(3, "banana banana banana date")])
    run()  # restart from checkpoint; counts must accumulate

    snap = [
        (r["token"], r["n"])
        for r in spark.read.parquet(out).orderBy("token").collect()
    ]
    batch = [
        (r["token"], r["n"])
        for r in topk_tokens_batch(spark.read.parquet(src), k=3)
        .orderBy("token")
        .collect()
    ]
    assert snap == batch
    assert dict(snap) == {"apple": 3, "banana": 4, "cherry": 2}


def test_attribution_outer_stream_equals_batch(spark, tmp_path):
    """LEFT OUTER stream-stream join: unmatched clicks must flush as
    (null purchase, converted=false) rows once the watermark passes
    them — the deferred null emission only watermarked state eviction
    can produce. A far-future click+purchase sentinel pair advances
    BOTH sides' watermarks past every real event (filtered-out rows
    never move a watermark, so the sentinel must survive both filters);
    the batch twin includes the sentinels too, so the comparison is
    row-for-row over identical input. Run split across a checkpointed
    restart: the unmatched-click state must survive it."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    t = datetime(2024, 1, 1, 10, 0)

    def at(minute):
        return t.replace(minute=minute)

    rows1 = [
        (1, at(0), 7, "click", 0.0),
        (2, at(5), 7, "purchase", 9.99),   # 300 s after click 1 → match
        (3, at(30), 7, "click", 0.0),      # NEVER converts → null flush
        (4, at(1), 8, "click", 0.0),
        (5, at(2), 8, "click", 0.0),
        (6, at(9), 8, "purchase", 1.25),   # matches clicks 4 AND 5
    ]
    # sentinel pair: far future (advances watermark hours past the
    # real events), same user, same instant → they match each other.
    rows2 = [
        (98, datetime(2024, 1, 2, 10, 0), 99, "click", 0.0),
        (99, datetime(2024, 1, 2, 10, 0), 99, "purchase", 0.0),
    ]
    _write(spark, src, rows1)
    stream = lambda: joins.attribution_join_outer_stream(  # noqa: E731
        spark.readStream.schema(_SCHEMA).parquet(src)
    )
    _run(stream(), ckpt, out)
    _write(spark, src, rows2)
    _run(stream(), ckpt, out)  # restart from checkpoint

    key = lambda r: (  # noqa: E731
        r["click_id"], r["user_id"], r["purchase_id"], r["gap_seconds"],
        r["converted"],
    )
    got = sorted(key(r) for r in spark.read.parquet(out).collect())
    want = sorted(
        key(r)
        for r in joins.attribution_join_outer_batch(
            spark.createDataFrame(rows1 + rows2, _SCHEMA)
        ).collect()
    )
    assert got == want
    # the load-bearing rows: the match emitted AND the never-converted
    # click flushed as a null row after the sentinel moved the watermark
    assert (1, 7, 2, 300, True) in got
    assert (3, 7, None, None, False) in got
