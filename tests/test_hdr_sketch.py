"""X5e HDR log-histogram quantile sketch (plans/approx.py) and the
full BPE trainer (plans/llmops.py): merge==recompute, the driver-pinned
error bound, the positivity guard, the streaming twin, and a
pure-Python cross-check of the BPE merge sequence (the guard against
"both engines agree but both are wrong")."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import registry
from data_engineering_course_project_2023_spark.plans.approx import (
    HDR_M,
    _hdr_hist,
    _hist_quantiles,
)
from data_engineering_course_project_2023_spark.streaming import hdrsketch

from .conftest import SF_SMOKE


def _units(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id", "event_type", "CAST(round(value * 100) AS BIGINT) AS u"
        )
    )


def test_hdr_merge_equals_recompute_arbitrary_split(spark):
    """The mergeable-summaries property itself: partial sketches built
    over ANY disjoint split of the input, merged by bucket-wise integer
    addition, must equal the sketch built directly — here a 3-way
    user_id split (different from the registered query's 80/20
    event_id split, so the property is pinned beyond the oracle row)."""
    u = _units(spark, SF_SMOKE)
    parts = [
        _hdr_hist(u.where(F.col("user_id") % 3 == k), "event_type", "u")
        for k in range(3)
    ]
    merged = (
        parts[0].unionByName(parts[1]).unionByName(parts[2])
        .groupBy("event_type", "lo")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = _hdr_hist(u, "event_type", "u")
    key = lambda r: (r["event_type"], r["lo"])  # noqa: E731
    got = sorted(((key(r), r["cnt"]) for r in merged.collect()))
    want = sorted(((key(r), r["cnt"]) for r in direct.collect()))
    assert got == want
    # and the quantiles read off the merged state match too
    mq = sorted(map(tuple, _hist_quantiles(merged, "event_type", "q").collect()))
    dq = sorted(map(tuple, _hist_quantiles(direct, "event_type", "q").collect()))
    assert mq == dq


def test_hdr_error_bound_vs_exact_twin(spark):
    """Sketch lower-bounds the exact discrete quantile and is within
    one sub-bucket relatively: hdr ≤ exact < hdr·(1 + 1/HDR_M). This is
    the bound the driver hash pins (both columns ride in the same
    output); asserted here explicitly so a bucketing regression fails
    with the offending numbers, not a hash diff."""
    rows = registry.run_query(
        "hdr_value_quantiles", spark, SF_SMOKE
    ).collect()
    assert rows
    for r in rows:
        for q in ("p25", "p50", "p75"):
            hdr, exact = r[f"hdr_{q}"], r[f"exact_{q}"]
            assert hdr <= exact <= hdr * (1 + 1.0 / HDR_M), (
                r["event_type"], q, hdr, exact,
            )


def test_hdr_hist_filters_non_positive_units(spark):
    """ADVICE_r5: bin() of a negative long is 64 two's-complement bits
    (octave-array overrun); zero has no octave. Non-positive units must
    be filtered, not crash or mis-bucket."""
    df = spark.createDataFrame(
        [("a", -7), ("a", 0), ("a", 5), ("a", 100)], "g string, u long"
    )
    hist = _hdr_hist(df, "g", "u").collect()
    assert sum(r["cnt"] for r in hist) == 2  # only the two positive rows
    assert all(r["lo"] >= 1 for r in hist)


def test_hdr_stream_snapshot_equals_batch(spark, tmp_path):
    """Cross-micro-batch mergeability on the real ingest shape: the
    bucket state store folds file-sized micro-batches
    (maxFilesPerTrigger=1), survives a checkpointed restart with new
    data, and the final snapshot equals the batch twin over ALL input
    — which the t2 gate separately proves equal to the DuckDB oracle."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_type", "value"
    )
    # disjoint, exhaustive 3-way split → three single-file appends →
    # at least three micro-batches total
    split = F.pmod(F.hash("event_type", "value"), F.lit(3))
    for k, mode in ((0, "overwrite"), (1, "append")):
        events.where(split == k).coalesce(1).write.mode(mode).parquet(src)

    def run():
        stream = spark.readStream.schema("event_type string, value double").option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = hdrsketch.hdr_snapshot_stream(stream, out, ckpt)
        q.awaitTermination(120)

    run()
    events.where(split == 2).coalesce(1).write.mode("append").parquet(src)
    run()  # restart from checkpoint — state must resume, not rebuild

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, hdrsketch.hdr_quantiles_batch(events).collect()))
    assert got == want


# Java's \s (the engine tokenizer's split class) is ASCII-only; mirror
# it exactly rather than Python's unicode-aware \s.
_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"


def _bpe_reference(texts: list[str], rounds: int):
    """Straight-line reference BPE trainer (greedy leftmost-first,
    non-overlapping merges; ties broken count desc then pair asc)."""
    wf = Counter(
        w for t in texts for w in re.split(_JAVA_WS, t) if w
    )
    vocab = {w: tuple(w) for w in wf}
    merges = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            n = wf[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        new = {}
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new[w] = tuple(out)
        vocab = new
    return merges, vocab


def test_bpe_train_matches_python_reference(spark):
    """The engine's 8-round merge sequence equals a from-scratch Python
    trainer on the smoke corpus — independent of the DuckDB twin, so a
    shared misreading of BPE semantics cannot pass."""
    from data_engineering_course_project_2023_spark.plans.llmops import BPE_ROUNDS

    texts = [
        r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("text")
        .collect()
    ]
    want, _ = _bpe_reference(texts, BPE_ROUNDS)
    got = [
        (r["sym_a"], r["sym_b"], r["pair_count"])
        for r in registry.run_query("bpe_train_merges", spark, SF_SMOKE)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == want


def test_bpe_encode_matches_python_reference(spark):
    """The inference path too: per-doc BPE token counts under the
    trained vocab equal a from-scratch Python encode."""
    from data_engineering_course_project_2023_spark.plans.llmops import BPE_ROUNDS

    docs = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    _, vocab = _bpe_reference([r["text"] for r in docs], BPE_ROUNDS)
    want = {}
    for r in docs:
        words = [w for w in re.split(_JAVA_WS, r["text"]) if w]
        want[r["doc_id"]] = (
            len(words),
            sum(len(w) for w in words),
            sum(len(vocab[w]) for w in words),
        )
    got = {
        r["doc_id"]: (r["n_words"], r["n_chars"], r["n_tokens"])
        for r in registry.run_query(
            "bpe_encode_stats", spark, SF_SMOKE
        ).collect()
    }
    assert got == want


def test_bpe_merge_fold_handles_overlapping_runs(spark):
    """The replace-last fold must merge greedily left-to-right without
    overlap: 'aaa' under pair (a,a) → [aa, a], 'aaaa' → [aa, aa]."""
    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("baab",)], "word string"
    ).selectExpr(
        "word",
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        " AS syms",
        "'a' AS ba", "'a' AS bb",
    )
    merged = df.selectExpr(
        "word",
        "aggregate(syms, CAST(array() AS ARRAY<STRING>),"
        " (acc, s) -> IF(size(acc) > 0"
        "   AND element_at(acc, -1) = ba AND s = bb,"
        "   concat(slice(acc, 1, size(acc) - 1), array(concat(ba, bb))),"
        "   concat(acc, array(s)))) AS m",
    ).collect()
    got = {r["word"]: r["m"] for r in merged}
    assert got["aaa"] == ["aa", "a"]
    assert got["aaaa"] == ["aa", "aa"]
    assert got["baab"] == ["b", "aa", "b"]


def test_kmv_merge_equals_direct(spark):
    """KMV union-bottom-k mergeability: the merged-partials estimate
    (kmv_sketch_merge, event_id 80/20 split) must equal the direct
    build (kmv_distinct_users) row-for-row — the distinct-count
    companion to the HDR merge==recompute pin. Runs at SF_CORRECT:
    the smoke SF has < KMV_K distinct users per group, so every group
    (correctly) lacks a k-th hash and both frames are empty."""
    from data_engineering_course_project_2023_spark.plans.approx import (
        kmv_distinct_users,
        kmv_sketch_merge,
    )

    from .conftest import SF_CORRECT

    t = {"events": spark.read.parquet(f"{SF_CORRECT}/events.parquet")}
    got = sorted(map(tuple, kmv_sketch_merge(t).collect()))
    want = sorted(map(tuple, kmv_distinct_users(t).collect()))
    assert got and got == want


def test_hdr_bucket_matches_python_reference(spark):
    """Pure-Python recomputation of the bucket function (the BPE-style
    guard against both engines agreeing on a shared misreading): the
    Spark-built histogram over the smoke events must equal a
    from-scratch Python fold over the same units."""
    from collections import Counter as _C

    def bucket_ref(u: int) -> int:
        e = u.bit_length() - 1
        p = 1 << e
        sub = ((u - p) * HDR_M) // p
        return p + (sub * p) // HDR_M

    u = _units(spark, SF_SMOKE).collect()
    want = _C(
        (r["event_type"], bucket_ref(r["u"])) for r in u if r["u"] >= 1
    )
    got = {
        (r["event_type"], r["lo"]): r["cnt"]
        for r in _hdr_hist(
            _units(spark, SF_SMOKE), "event_type", "u"
        ).collect()
    }
    assert got == dict(want)


def test_kmv_kth_hash_matches_python_reference(spark):
    """Same guard for KMV: the k-th smallest distinct user hash per
    group, recomputed with hashlib over the collected user ids, must
    reproduce the hk the engines rank with."""
    import hashlib

    from data_engineering_course_project_2023_spark.plans.approx import (
        KMV_K,
        kmv_distinct_users,
    )

    from .conftest import SF_CORRECT

    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet").select(
        "event_type", "user_id"
    ).collect()
    groups: dict[str, set] = {}
    for r in ev:
        groups.setdefault(r["event_type"], set()).add(r["user_id"])
    want = {}
    for g, users in groups.items():
        hs = sorted(
            int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
            for u in users
        )
        if len(hs) >= KMV_K:
            want[g] = (KMV_K - 1) / (hs[KMV_K - 1] / float(1 << 60))
    got = {
        r["event_type"]: r["kmv_est"]
        for r in kmv_distinct_users(
            {"events": spark.read.parquet(f"{SF_CORRECT}/events.parquet")}
        ).collect()
    }
    assert got == want


def test_hdr_daily_rollup_stream_equals_oracled_batch(spark, tmp_path):
    """VERDICT_r6 #4: the daily-rollup spelling — foreachBatch writes
    each micro-batch's PARTIAL (type|day) sketch as a batch_id delta
    partition (streaming state = offsets only; replay rewrites its own
    partition), and the read-side bucket merge must equal the oracled
    ``hdr_daily_quantiles`` batch query over ALL input, across
    maxFilesPerTrigger=1 micro-batches AND a checkpointed restart."""
    from data_engineering_course_project_2023_spark.plans import approx

    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ck")
    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "ts", "event_type", "value"
    )
    split = F.pmod(F.hash("event_type", "value"), F.lit(3))
    for k, mode in ((0, "overwrite"), (1, "append")):
        events.where(split == k).coalesce(1).write.mode(mode).parquet(src)

    def run():
        stream = (
            spark.readStream.schema(
                "ts timestamp_ntz, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = hdrsketch.hdr_daily_rollup_stream(stream, tbl, ckpt)
        q.awaitTermination(120)

    run()
    # late data for already-rolled-up days arrives after a restart
    events.where(split == 2).coalesce(1).write.mode("append").parquet(src)
    run()

    got = sorted(
        map(tuple, hdrsketch.hdr_daily_from_table(spark, tbl).collect())
    )
    want = sorted(
        map(tuple, approx.hdr_daily_quantiles({"events": events}).collect())
    )
    assert got == want
    # no-new-data restart is a no-op (idempotent sink)
    run()
    again = sorted(
        map(tuple, hdrsketch.hdr_daily_from_table(spark, tbl).collect())
    )
    assert again == got
