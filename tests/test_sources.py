"""Source/sink roundtrips (SURVEY §2.1 S1-S7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark import schemas
from data_engineering_course_project_2023_spark.sources import (
    read_jsonl,
    scan_subset,
    write_jsonl,
    write_parquet_parts,
)


def test_jsonl_roundtrip_preserves_unicode(spark, tmp_path):
    """S5: JSONL sink keeps non-ASCII verbatim (ref utils.py:175
    force_ascii=False) + S1 schema-pinned rescan."""
    df = spark.createDataFrame(
        [("0704.0001", "Ünïcødé Tïtlé", "10.1/x")], "id string, title string, doi string"
    )
    path = str(tmp_path / "out")
    write_jsonl(df, path)
    raw = "".join(
        p.read_text() for p in (tmp_path / "out").glob("*.json")
    )
    assert "Ünïcødé" in raw  # UTF-8 bytes, not \u escapes

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in ("id", "title", "doi")]
    )
    back = read_jsonl(spark, path, schema, required_non_null=["id", "doi"])
    assert back.count() == 1 and back.first()["title"] == "Ünïcødé Tïtlé"


def test_partitioned_write_and_glob_rescan(spark, tmp_path):
    """S6 fixed part count + S7 single-glob rescan replacing the
    reference's sequential per-part loop."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    path = str(tmp_path / "parts")
    write_parquet_parts(df, path, num_parts=4)
    files = list((tmp_path / "parts").glob("part-*.parquet"))
    assert len(files) == 4
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert back.agg(F.sum("id")).first()[0] == 4950


def test_hive_partitioned_write_prunes(spark, tmp_path):
    """S6 scale path: partitionBy directory layout is partition-prunable
    — the pruned scan must read only the matching directory."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("bucket")
    )
    path = str(tmp_path / "hive")
    write_parquet_parts(df, path, partition_by=["bucket"])
    assert (tmp_path / "hive" / "bucket=0").exists()
    pruned = spark.read.parquet(path).filter(F.col("bucket") == 1)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    assert "bucket=1" in buf.getvalue() or pruned.count() == 33
    assert pruned.count() == 33


def test_scan_subset(spark):
    """S2 offset/limit against a deterministic ordering."""
    df = spark.range(0, 50).select(F.col("id"))
    got = [r["id"] for r in scan_subset(df, "id", 10, 5).collect()]
    assert got == [10, 11, 12, 13, 14]


def test_driver_schemas_match_files(spark):
    """schemas.DRIVER_TABLES stays truthful against the real files."""
    from data_engineering_course_project_2023_spark.sources.readers import load_table

    for name, expected in schemas.DRIVER_TABLES.items():
        actual = load_table(spark, "/root/testdata/sf0.001", name).schema
        got = {(f.name, f.dataType.simpleString()) for f in actual}
        want = {(f.name, f.dataType.simpleString()) for f in expected}
        assert got == want, f"{name}: {got ^ want}"


def test_write_jdbc_roundtrip_embedded_derby(spark):
    """S9 live JDBC sink: real write + read-back through Spark's bundled
    embedded Derby (same-JVM in local mode, standing in for the
    reference's Postgres DWH). Append semantics: two writes of the same
    frame double the rows — exactly populate_DWH's per-table INSERT
    behavior."""
    from data_engineering_course_project_2023_spark.sources.writers import write_jdbc

    url = "jdbc:derby:memory:graftdwh;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.createDataFrame(
        [(1, "EUROPE"), (2, "ASIA"), (3, "AFRICA")], "r_regionkey int, r_name string"
    )
    write_jdbc(df, "dim_region", url, mode="overwrite",
               num_partitions=1, properties=props)
    back = spark.read.format("jdbc").options(
        url=url, dbtable="dim_region", **props
    ).load()
    assert {(r["r_regionkey"], r["r_name"]) for r in back.collect()} == {
        (1, "EUROPE"), (2, "ASIA"), (3, "AFRICA")
    }
    # append mode is the populate_DWH contract
    write_jdbc(df, "dim_region", url, properties=props)
    assert back.count() == 6


def test_csv_roundtrip_schema_pinned(spark, tmp_path):
    """CSV sink → schema-pinned scan roundtrips values exactly,
    including quoted embedded delimiters; no inference pass."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_engineering_course_project_2023_spark.sources.readers import read_csv
    from data_engineering_course_project_2023_spark.sources.writers import write_csv

    rows = [(1, "plain"), (2, 'with,comma'), (3, 'with "quotes" too'), (4, None)]
    schema = StructType(
        [StructField("id", LongType()), StructField("text", StringType())]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "csv")
    write_csv(df, path)
    back = read_csv(spark, path, schema)
    assert sorted((r["id"], r["text"]) for r in back.collect()) == sorted(rows)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink → scan roundtrips and the filter reaches the scan
    (PushedFilters), matching the parquet discipline."""
    from data_engineering_course_project_2023_spark.sources.readers import read_orc
    from data_engineering_course_project_2023_spark.sources.writers import write_orc

    df = spark.range(100).withColumn("bucket", (F.col("id") % 5).cast("int"))
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path).filter(F.col("bucket") == 3).select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "bucket" in plan
    assert back.count() == 20


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """20 micro-batch files compact to the byte-sized part count (1
    here) with identical data."""
    from data_engineering_course_project_2023_spark.sources.writers import (
        compact_parquet,
    )

    src, dest = str(tmp_path / "frag"), str(tmp_path / "compact")
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 20
    n = compact_parquet(spark, src, dest)
    assert n == 1
    assert len(glob.glob(dest + "/*.parquet")) == 1
    assert sorted(r["id"] for r in spark.read.parquet(dest).collect()) == list(
        range(200)
    )


def test_schema_evolution_merge_read(spark, tmp_path):
    """A widened batch (new column) reads back as one unified scan with
    mergeSchema; old rows surface NULL for the new column."""
    path = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", True).parquet(path)
    assert set(back.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in back.collect()}
    assert got == {1: None, 2: 9.5}


def test_write_sorted_ranges_disjoint_files(spark, tmp_path):
    """Files are range-disjoint and internally sorted — the layout that
    makes min/max pruning effective."""
    import glob

    from data_engineering_course_project_2023_spark.sources.writers import (
        write_sorted_ranges,
    )

    path = str(tmp_path / "sorted")
    df = spark.range(1000).withColumn("k", (F.col("id") * 37) % 1000)
    write_sorted_ranges(df, path, "k", num_parts=4)
    files = sorted(glob.glob(path + "/*.parquet"))
    assert len(files) == 4
    ranges = []
    for f in files:
        vals = [r["k"] for r in spark.read.parquet(f).collect()]
        assert vals == sorted(vals)  # sorted inside the file
        ranges.append((min(vals), max(vals)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint across files


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """With partitionOverwriteMode=dynamic, an overwrite write replaces
    only the partitions present in the incoming frame — the
    reprocess-one-day pattern; static mode would drop the whole table."""
    path = str(tmp_path / "days")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2)], "day string, v int"
    )
    base.write.partitionBy("day").parquet(path)
    fix = spark.createDataFrame([("2024-01-02", 99)], "day string, v int")
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )
    # partition values read back type-inferred (string → date)
    got = {(str(r["day"]), r["v"]) for r in spark.read.parquet(path).collect()}
    assert got == {("2024-01-01", 1), ("2024-01-02", 99)}


def test_export_training_shards_deterministic_and_complete(spark, tmp_path):
    """Shard export: every doc lands in exactly one shard, assignment is
    content-deterministic (identical across differently-partitioned
    re-runs), shard dirs are hive-readable with pruning, and the
    manifest counts match the files on disk."""
    from data_engineering_course_project_2023_spark.sources.readers import load_table
    from data_engineering_course_project_2023_spark.sources.writers import (
        export_training_shards,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out1 = str(tmp_path / "shards1")
    manifest = export_training_shards(docs, out1, n_shards=4,
                                      max_records_per_file=50)
    back = spark.read.parquet(out1)
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    assert (tmp_path / "shards1" / "shard=0").exists()
    # manifest matches disk
    disk = {r["shard"]: r["cnt"] for r in
            back.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert {r["shard"]: r["n_rows"] for r in manifest.collect()} == disk
    # determinism under a different input partitioning
    out2 = str(tmp_path / "shards2")
    export_training_shards(docs.repartition(7), out2, n_shards=4)
    a = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"]) for r in
         spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b
    # pruning: a shard-filtered scan reads only that hive dir
    one = spark.read.parquet(out1).filter(F.col("shard") == 2)
    assert one.count() == disk.get(2, 0)


def test_read_binary_dir_media_ingest(spark, tmp_path):
    """binaryFile source: bytes land intact, glob filter prunes by
    name, and the size cap prunes from file-status metadata (no
    content read needed to drop an oversized blob)."""
    from data_engineering_course_project_2023_spark.operators import multimodal
    from data_engineering_course_project_2023_spark.sources.readers import (
        read_binary_dir,
    )

    d = tmp_path / "media"
    d.mkdir()
    (d / "a.img").write_bytes(b"\x89fakepng-bytes\x00\x01")
    (d / "b.img").write_bytes(b"tiny")
    (d / "notes.txt").write_bytes(b"not media")
    df = read_binary_dir(spark, str(d), glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {
        "a.img": b"\x89fakepng-bytes\x00\x01",
        "b.img": b"tiny",
    }
    capped = read_binary_dir(spark, str(d), glob="*.img", max_bytes=5)
    assert [r["path"].rsplit("/", 1)[-1] for r in capped.collect()] == ["b.img"]
    # feeds the multimodal feature pipeline end-to-end
    media = df.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content"),
        F.lit("image/fake").alias("mime"),
        F.col("length").alias("n_bytes"),
    )
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 2 and all(
        len(r["features"]) == multimodal.FEATURE_DIM for r in feats
    )


def _fixture_api_server(state):
    """Deterministic metadata API: POST {"ids": [...]} → {id: {...}},
    ids ≥ 900 unknown (null → dropped rows)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            ids = json.loads(self.rfile.read(n))["ids"]
            with lock:
                state["requests"] += 1
                state["ids"].update(int(i) for i in ids)
            out = {
                i: ({"title": f"T-{i}", "year": str(1990 + int(i) % 30)}
                    if int(i) < 900 else None)
                for i in ids
            }
            body = json.dumps(out).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_httpjson_datasource_scan_and_pushdown(spark):
    """S8 in-engine (Spark 4 Python DataSource): the remote-metadata
    fetch as a real scan node — partitioned ranges, one task each,
    batched POSTs over real sockets; and an id-range predicate must be
    PUSHED so the HTTP layer never requests filtered-out ids."""
    from data_engineering_course_project_2023_spark.sources import http_source

    state = {"requests": 0, "ids": set()}
    srv = _fixture_api_server(state)
    try:
        http_source.register(spark)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        url = f"http://127.0.0.1:{srv.server_address[1]}/meta"
        reader = (
            spark.read.format("httpjson")
            .option("url", url)
            .option("total", "1000")
            .option("partitions", "4")
            .option("batchsize", "100")
        )
        # full scan: 1000 ids requested, 900 have metadata
        full = reader.load()
        assert full.count() == 900
        assert len(state["ids"]) == 1000
        assert full.rdd.getNumPartitions() == 4

        # pushdown: only [200, 210) may reach the wire
        state["ids"].clear()
        pushed = reader.load().filter("id >= 200 AND id < 210")
        rows = {r["id"]: r["title"] for r in pushed.collect()}
        assert rows == {i: f"T-{i}" for i in range(200, 210)}
        assert state["ids"] == set(range(200, 210))
    finally:
        srv.shutdown()
        srv.server_close()


def test_httpjson_stream_cursor_paging(spark, tmp_path):
    """Streaming variant: cursor-paged microbatches from the same API
    (offset = next unread id, checkpointable dict). availableNow drains
    the fixture keyspace in rows_per_batch pages; every known id lands
    exactly once."""
    from data_engineering_course_project_2023_spark.sources import http_source

    state = {"requests": 0, "ids": set()}
    srv = _fixture_api_server(state)
    try:
        http_source.register(spark)
        url = f"http://127.0.0.1:{srv.server_address[1]}/meta"
        stream = (
            spark.readStream.format("httpjson")
            .option("url", url)
            .option("total", "250")
            .option("rowsperbatch", "100")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("httpjson_sink")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        # drain: the cursor stops advancing at total=250
        import time as _time

        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.sql("SELECT COUNT(*) FROM httpjson_sink").first()[0] >= 250:
                break
            _time.sleep(0.5)
        q.stop()
        rows = spark.sql("SELECT id, title FROM httpjson_sink").collect()
        got = {r["id"]: r["title"] for r in rows}
        assert got == {i: f"T-{i}" for i in range(250)}
        assert len(rows) == 250  # exactly once
        assert state["ids"] == set(range(250))
    finally:
        srv.shutdown()
        srv.server_close()


def test_fetch_extract_cleanup_end_to_end(spark, tmp_path):
    """S8 over a real socket: serve a zip of JSONL from an in-process
    HTTP server, fetch-if-absent → extract-if-absent → cleanup, then
    scan the extracted files with the normal reader path. Re-running
    the stage is a no-op (reference utils.py idempotency)."""
    import io
    import json
    import os
    import threading
    import zipfile
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from data_engineering_course_project_2023_spark.sources import fetch

    buf = io.BytesIO()
    rows = [{"id": i, "name": f"r{i}"} for i in range(5)]
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "data/part0.jsonl", "\n".join(json.dumps(r) for r in rows)
        )

    payload = buf.getvalue()
    n_requests = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            n_requests.append(1)
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/dataset.zip"
        work = str(tmp_path / "s8")
        extracted = fetch.fetch_extract_cleanup(url, work)

        df = spark.read.json(f"{extracted}/data/*.jsonl")
        assert df.count() == 5
        assert not os.path.exists(f"{work}/dataset.zip")  # cleaned up

        # idempotency: second run skips everything (archive is gone but
        # the extracted dir exists; nothing re-downloads)
        assert fetch.extract_if_absent(f"{work}/dataset.zip", extracted) == []
        assert len(n_requests) == 1
    finally:
        srv.shutdown()


def test_fetch_rejects_zip_slip(tmp_path):
    """Archive members escaping the extraction root must be refused."""
    import io
    import zipfile

    import pytest as _pytest

    from data_engineering_course_project_2023_spark.sources import fetch

    evil = io.BytesIO()
    with zipfile.ZipFile(evil, "w") as zf:
        zf.writestr("../escape.txt", "nope")
    bad = str(tmp_path / "evil.zip")
    with open(bad, "wb") as f:
        f.write(evil.getvalue())
    with _pytest.raises(ValueError, match="unsafe archive member"):
        fetch.extract_if_absent(bad, str(tmp_path / "out"))


def test_corrupt_file_handling_fails_loud_then_skips_when_asked(spark, tmp_path):
    """Ingestion resilience at lake scale: a garbage file inside a
    parquet directory must fail the read LOUDLY by default (silent
    data loss is worse than a failed job), and be skippable explicitly
    via ignoreCorruptFiles with the valid rows intact — the posture a
    100 TB backfill needs when one object of a million is truncated."""
    import os

    import pytest as _pytest

    d = str(tmp_path / "mixed")
    spark.range(10).write.parquet(d)
    with open(os.path.join(d, "part-corrupt.parquet"), "wb") as f:
        f.write(b"PAR1 this is not a real parquet footer")

    with _pytest.raises(Exception):
        spark.read.parquet(d).count()

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(d).count() == 10
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)


def test_malformed_jsonl_rows_route_to_corrupt_record_column(spark, tmp_path):
    """Row-level resilience for JSONL ingest: malformed lines must not
    kill the scan NOR vanish — PERMISSIVE mode parks them in
    _corrupt_record for a dead-letter sink, keeping the good rows
    (the reference's JSONL ingest had no bad-line story at all)."""
    import os

    p = str(tmp_path / "rows.jsonl")
    with open(p, "w") as f:
        f.write('{"id": 1, "name": "ok"}\n')
        f.write("this is not json\n")
        f.write('{"id": 2, "name": "also ok"}\n')

    df = spark.read.schema(
        "id long, name string, _corrupt_record string"
    ).json(p)
    rows = df.collect()
    good = {r["id"] for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert good == {1, 2}
    assert len(bad) == 1 and "not json" in bad[0]["_corrupt_record"]


def test_zorder_layout_clusters_two_dim_predicates(spark, tmp_path):
    """Z-order witness: after write_zordered on (user_id, value), the
    rows matching a narrow 2-D rectangle predicate concentrate in a few
    files (tight min/max on BOTH columns per file → footer pruning at
    scale), while a hash-random layout scatters them across ~all files.
    Row content is identical in both layouts."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.sources.readers import load_table
    from data_engineering_course_project_2023_spark.sources.writers import (
        write_zordered,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
    write_zordered(ev, zpath, "user_id", "value", num_parts=16)
    ev.repartition(16).write.parquet(rpath)

    stats = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    lo_u, hi_u, lo_v, hi_v = stats
    # ~10% of each dimension's span → ~1% of the 2-D space
    pu = lo_u + (hi_u - lo_u) * 0.1
    pv = lo_v + (hi_v - lo_v) * 0.1

    def touched(path):
        df = spark.read.parquet(path).filter(
            (F.col("user_id") <= pu) & (F.col("value") <= pv)
        )
        rows = df.count()
        files = df.select(
            F.input_file_name().alias("f")
        ).distinct().count()
        return rows, files

    z_rows, z_files = touched(zpath)
    r_rows, r_files = touched(rpath)
    assert z_rows == r_rows and z_rows > 0
    # content parity under the full scan too
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(rpath).count()
        == ev.count()
    )
    # the curve concentrates the rectangle; random scatters it
    assert z_files < r_files
    assert z_files <= 4, f"z-order touched {z_files}/16 files"


def test_zorder_code_matches_reference_interleave(spark):
    """zorder_code == the textbook bit-interleave (reference impl in
    Python) for values across the 16-bit domain, including the mask
    cascade's edge values."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.sources.writers import (
        zorder_code,
    )

    def ref(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    vals = [0, 1, 2, 3, 255, 256, 0x5555, 0xAAAA, 0xFFFF, 12345]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a", "b", zorder_code(F.col("a"), F.col("b")).alias("z")
    )
    for r in df.collect():
        assert r["z"] == ref(r["a"], r["b"]), (r["a"], r["b"])


def test_graph_bulk_load_to_database(spark):
    """S11+S9: the reference's Neo4j bulk load (databases.py:148-333 —
    MERGE every node label, then relationship CREATEs) as DataFrame
    writes into a live database: every node frame and the edge frame
    land per-table through the JDBC sink (embedded Derby standing in
    for the graph store's bulk endpoint), and the read-back edge table
    joins its endpoint node tables with full referential integrity —
    the property the reference's MERGE-then-CREATE ordering exists to
    guarantee."""
    from . import fixtures
    from data_engineering_course_project_2023_spark.plans.arxiv_graph import (
        build_edges,
        build_nodes,
    )
    from data_engineering_course_project_2023_spark.sources.writers import (
        write_jdbc,
    )

    enriched = fixtures.enriched(spark)
    nodes = build_nodes(enriched)
    edges = build_edges(enriched, nodes)
    url = "jdbc:derby:memory:graftgraph;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    for label, frame in nodes.items():
        # Derby has no ARRAY type: serialize array columns as csv the
        # way the driver-facing queries already do for array outputs
        for f in frame.schema.fields:
            if f.dataType.simpleString().startswith("array"):
                frame = frame.withColumn(
                    f.name, F.concat_ws(",", F.col(f.name))
                )
        write_jdbc(frame, f"node_{label}", url, mode="overwrite",
                   num_partitions=1, properties=props)
    pa_edges = edges["AUTHORED_BY"]
    write_jdbc(pa_edges, "edge_authored_by", url, mode="overwrite",
               num_partitions=1, properties=props)

    def read(table):
        return spark.read.format("jdbc").options(
            url=url, dbtable=table, **props
        ).load()

    for label, frame in nodes.items():
        assert read(f"node_{label}").count() == frame.count()
    back_edges = read("edge_authored_by")
    assert back_edges.count() == pa_edges.count() > 0
    # referential integrity: every edge endpoint exists in its node table
    papers = read("node_Paper").select(F.col("id").alias("pid"))
    authors = read("node_Author").select("author_id")
    dangling_p = back_edges.join(
        papers, back_edges["paper_id"] == papers["pid"], "left_anti"
    ).count()
    dangling_a = back_edges.join(authors, "author_id", "left_anti").count()
    assert dangling_p == 0 and dangling_a == 0
