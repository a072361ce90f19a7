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


def test_clean_text_unicode_whitespace_matches_oracle(spark):
    """Spark's (?U)\\s+ collapse and the DuckDB oracle class
    [\\s\\p{Z}\\x{85}\\x{0B}]+ must agree on every White_Space
    codepoint — RE2's bare \\s is ASCII-only, so an un-widened oracle
    would silently diverge on NBSP / U+2000-class input (ADVICE r1)."""
    import duckdb

    from data_engineering_course_project_2023_spark.functions.expr import clean_text

    ws_cps = [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x20, 0x85, 0xA0, 0x1680,
              0x2000, 0x2005, 0x200A, 0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    rows = [(cp, f"a{chr(cp)}b{chr(cp)}{chr(cp)}c") for cp in ws_cps]
    sdf = spark.createDataFrame(rows, "cp int, text string")
    got = {
        r["cp"]: r["clean"]
        for r in sdf.select("cp", clean_text("text").alias("clean")).collect()
    }
    con = duckdb.connect()
    oracle = {
        cp: con.execute(
            r"SELECT trim(regexp_replace(?, '[\s\p{Z}\x{85}\x{0B}]+', ' ', 'g'))",
            [text],
        ).fetchone()[0]
        for cp, text in rows
    }
    assert got == oracle
    assert set(got.values()) == {"a b c"}


def test_ngram_jaccard_staged_matches_default(spark, tmp_path):
    """The parquet staging path (the 100 TB substitute for the r1
    session-lifetime persist) must return identical pairs, and its plan
    must actually scan the staged files rather than re-deriving the
    shingle frame."""
    from data_engineering_course_project_2023_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    stage = str(tmp_path / "shingle_stage")
    default = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    staged_df = ngram_jaccard_pairs(docs, threshold=0.5, stage_dir=stage)
    staged = {
        (r["doc_a"], r["doc_b"], r["jaccard"]) for r in staged_df.collect()
    }
    assert staged == default and len(staged) == 1
    jvm = spark._jvm
    plan = staged_df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "shingle_stage" in plan  # consumers read the durable stage


def test_mixture_resample_unmapped_lang_default(spark):
    """Langs outside MIXTURE_RATES — and NULL lang — resample at the
    explicit 0.25 default on BOTH engines (the r1 Spark chain left the
    rate NULL and silently dropped such docs while the oracle copied
    them; the fixture's all-mapped langs masked it)."""
    import duckdb

    from data_engineering_course_project_2023_spark.plans import llmops

    rows = [(i, lang) for i, lang in enumerate(["xx", None, "en", "de"] * 25)]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        (r["doc_id"], r["lang"], r["copy_no"])
        for r in llmops.mixture_resample_docs({"documents": sdf}).collect()
    )
    # unmapped/NULL langs must contribute SOME copies (~25% of 50 docs)
    unmapped = [g for g in got if g[1] in ("xx", None)]
    assert 0 < len(unmapped) < 50

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            "({}, {})".format(i, "NULL" if lang is None else f"'{lang}'")
            for i, lang in rows
        )
        + ") v(doc_id, lang)"
    )
    oracle = sorted(tuple(r) for r in con.execute(llmops.MIXTURE_RESAMPLE_SQL).fetchall())
    assert got == oracle


def test_paragraph_dedup_and_profile_semantics(spark):
    """Paragraph boundaries (newline runs) drive the dedup: a paragraph
    shared verbatim across docs is flagged regardless of surrounding
    text; internal whitespace/layout differences inside a paragraph do
    not defeat the hash; the driver corpus is single-line so these
    semantics live here."""
    from data_engineering_course_project_2023_spark.plans.llmops import (
        paragraph_dedup,
        paragraph_profile,
    )

    boiler = "all rights reserved contact us for details"
    docs = spark.createDataFrame(
        [
            (1, "unique intro one\n\n" + boiler + "\nunique tail one"),
            # same boilerplate but with doubled internal spaces + tabs
            (2, "other intro\n" + boiler.replace(" ", "  ") + "\n\nmore"),
            (3, "totally unrelated text with no repeats at all"),
            # within-doc repetition only → not cross-doc
            (4, "same para\n\nsame para"),
        ],
        "doc_id long, text string",
    )
    dups = paragraph_dedup({"documents": docs}).collect()
    assert len(dups) == 1
    assert (dups[0]["n_docs"], dups[0]["n_copies"], dups[0]["first_doc"]) == (2, 2, 1)

    prof = {r["doc_id"]: r for r in paragraph_profile({"documents": docs}).collect()}
    assert prof[1]["n_paras"] == 3 and prof[1]["dup_para_ratio"] == 0.0
    assert prof[4]["n_paras"] == 2 and prof[4]["n_distinct_paras"] == 1
    assert prof[4]["dup_para_ratio"] == 0.5


def test_decontaminate_exact_substring_guarantee(spark):
    """A training doc embedding a verbatim >=63-token run of eval text
    is flagged (the 2k-1 aligned-chunk guarantee); a 31-token verbatim
    run is below the operator's minimum match length and is not."""
    from data_engineering_course_project_2023_spark.plans.llmops import (
        decontaminate_exact_substring,
    )

    eval_tokens = [f"ev{i}" for i in range(80)]
    eval_text = " ".join(eval_tokens)
    # embed a 64-token eval run at an UNALIGNED offset inside train noise
    leak = " ".join(eval_tokens[5:69])
    short_leak = " ".join(eval_tokens[5:36])  # 31 tokens: under the bound
    pad = lambda p, n: " ".join(f"{p}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (0, "src0", eval_text),
            (1, "src1", pad("a", 7) + " " + leak + " " + pad("z", 10)),
            (2, "src1", pad("b", 7) + " " + short_leak + " " + pad("y", 40)),
            (3, "src2", pad("c", 70)),
        ],
        "doc_id long, source string, text string",
    )
    hits = {
        r["doc_id"]: r["n_verbatim_chunks"]
        for r in decontaminate_exact_substring({"documents": docs}).collect()
    }
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits and 3 not in hits


def test_chunk_for_rag_windows(spark):
    """Chunk boundaries: a 40-token doc at (size=32, stride=24) yields
    starts {0, 24} — a full 32-token chunk then a 16-token tail with an
    8-token overlap; a short doc is one chunk; empty text still emits a
    single empty chunk (chunk-per-doc floor keeps downstream joins
    total)."""
    from data_engineering_course_project_2023_spark.plans.llmops import chunk_for_rag

    words40 = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, words40), (2, "only three tokens"), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_for_rag({"documents": docs}).collect()
    }
    assert sorted(rows) == [(1, 0), (1, 1), (2, 0), (3, 0)]
    assert rows[(1, 0)]["n_chunk_tokens"] == 32
    assert rows[(1, 0)]["chunk_text"].split(" ")[0] == "w0"
    # second window starts at token 24 → 8-token overlap, 16-token tail
    tail = rows[(1, 1)]["chunk_text"].split(" ")
    assert tail[0] == "w24" and len(tail) == 16
    assert rows[(1, 1)]["n_chunk_tokens"] == 16
    assert rows[(2, 0)]["chunk_text"] == "only three tokens"
    assert rows[(3, 0)]["chunk_text"] == "" and rows[(3, 0)]["n_chunk_tokens"] == 0


def test_gopher_quality_rules(spark):
    """Each rule trips independently: too-short doc, degenerate mean
    word length, zero stopwords, all-repeated words; a normal doc keeps
    all flags."""
    from data_engineering_course_project_2023_spark.plans.llmops import gopher_quality

    good = "the quick brown fox jumps over a lazy dog and then " + " ".join(
        f"word{i}" for i in range(15)
    )
    docs = spark.createDataFrame(
        [
            (1, good),  # keeps
            (2, "the a of short"),  # < 20 words
            (3, "the " + " ".join(["x"] * 30)),  # mean word len < 2
            (4, " ".join(f"tok{i}" for i in range(25))),  # no stopwords
            (5, "the " + " ".join(["same"] * 40)),  # unique_ratio < 0.30
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality({"documents": docs}).collect()}
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["flag_n_words"] is False
    assert got[3]["keep"] is False and got[3]["flag_mean_len"] is False
    assert got[4]["keep"] is False and got[4]["flag_stop"] is False
    assert got[5]["keep"] is False and got[5]["flag_unique"] is False


def test_vocab_encode_ids_and_oov(spark):
    """Vocab ids rank by (freq desc, term asc); OOV encodes as 0; the
    id array preserves token order."""
    import data_engineering_course_project_2023_spark.plans.llmops as llmops

    orig = llmops.VOCAB_SIZE
    llmops.VOCAB_SIZE = 2
    try:
        docs = spark.createDataFrame(
            [
                (1, "b b a a c"),   # freq: a=2+1, b=2+1 → tie → a first
                (2, "a b rare"),
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in llmops.vocab_encode({"documents": docs}).collect()}
    finally:
        llmops.VOCAB_SIZE = orig
    # a and b both appear 3× → tie broken by term: a=1, b=2; c/rare OOV
    assert got[1]["token_ids_csv"] == "2,2,1,1,0"
    assert got[1]["n_tokens"] == 5 and got[1]["n_oov"] == 1
    assert got[2]["token_ids_csv"] == "1,2,0"
    assert got[2]["n_oov"] == 1


def test_bloom_novelty_contract(spark):
    """X1c Bloom guarantees: NO false negatives (every truly-seen doc is
    filtered), false positives bounded, and the probe result is exactly
    the exact-path result minus FPs — on a constructed corpus where the
    new batch half-overlaps the history."""
    from data_engineering_course_project_2023_spark.operators import dedup

    hist = spark.createDataFrame(
        [(i, f"history document number {i} body") for i in range(200)],
        "doc_id int, text string",
    )
    # new batch: 50 docs copied verbatim from history + 50 fresh ones
    new = spark.createDataFrame(
        [(1000 + i, f"history document number {i} body") for i in range(50)]
        + [(2000 + i, f"brand new crawl text {i}") for i in range(50)],
        "doc_id int, text string",
    )
    bitmap = dedup.bloom_build_bitmap(hist, "text")
    got = {r["doc_id"] for r in dedup.bloom_novel(new, bitmap, "text").collect()}
    truly_novel = {2000 + i for i in range(50)}
    # no false negatives: nothing outside the truly-novel set survives ∁,
    # i.e. every seen doc was dropped
    assert got <= truly_novel
    # FP rate at this fill factor is ~1e-9; allow a tiny slack anyway
    assert len(truly_novel - got) <= 2
    # determinism: rebuilding the bitmap yields the identical filter
    assert bitmap == dedup.bloom_build_bitmap(hist, "text")


def test_bloom_bitmap_bits_match_positions(spark):
    """The bitmap words encode exactly the md5-slice positions — the
    property that makes the DuckDB position-set oracle a faithful model
    of the bit test."""
    from data_engineering_course_project_2023_spark.operators import dedup

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "doc_id int, text string")
    bitmap = dedup.bloom_build_bitmap(df, "text")
    rows = df.select(
        F.explode(F.array(*dedup.bloom_positions(F.col("text")))).alias("p")
    ).collect()
    expect = {r["p"] for r in rows}
    got_bits = {
        w * 64 + b
        for w, word in enumerate(bitmap)
        if word
        for b in range(64)
        if (word >> b) & 1
    }
    assert got_bits == expect


def test_sentence_split_udtf_matches_builtin_spelling(spark):
    """§2.7 UDTF: the Python table function agrees with the built-in
    split+posexplode spelling on the shared simple grammar — pinning
    both the UDTF seam's mechanics (lateral row expansion, multiple
    output rows per input) and the engine's built-ins-first policy."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.operators.text import (
        sentence_split_udtf,
    )

    docs = spark.createDataFrame(
        [
            (1, "First sentence. Second one! Third?"),
            (2, "Only one sentence"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    spark.udtf.register("sentence_split", sentence_split_udtf())
    docs.createOrReplaceTempView("udtf_docs")
    got = {
        (r["doc_id"], r["sent_idx"], r["sentence"])
        for r in spark.sql(
            "SELECT d.doc_id, s.sent_idx, s.sentence "
            "FROM udtf_docs d, LATERAL sentence_split(d.doc_id, d.text) s"
        ).collect()
    }
    builtin = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(
                F.filter(
                    F.transform(
                        F.split(F.trim("text"), r"(?<=[.!?])\s+"),
                        lambda s: F.trim(s),
                    ),
                    lambda s: s != "",
                )
            ).alias("sent_idx", "sentence"),
        )
    )
    want = {
        (r["doc_id"], r["sent_idx"], r["sentence"]) for r in builtin.collect()
    }
    assert got == want
    assert (1, 1, "Second one!") in got


def test_stage_and_bloom_memos_see_inplace_overwrite(spark, tmp_path):
    """r2 defect: both memos keyed on inputFiles (paths) only, so
    overwriting an input file in place — or pointing a second input at
    the same stage_dir — silently served the previous input's stage or
    bitmap. Keys now carry (mtime_ns, size) fingerprints and the stage
    memo is keyed per directory, so both rewrites re-derive."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_engineering_course_project_2023_spark.operators import dedup

    p = str(tmp_path / "docs.parquet")
    stage = str(tmp_path / "stage")

    def write(texts):
        pq.write_table(
            pa.table(
                {"doc_id": list(range(len(texts))), "text": texts}
            ),
            p,
        )

    near_a = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
    ]
    write(near_a)
    df = spark.read.parquet(p)
    pairs_a = dedup.ngram_jaccard_pairs(
        df, threshold=0.5, stage_dir=stage
    ).count()
    bitmap_a = dedup.bloom_build_bitmap(df, "text")
    assert pairs_a == 1

    # in-place overwrite: same path, disjoint content (sleep covers
    # filesystems with coarse mtime granularity; size also differs)
    time.sleep(0.05)
    write(["alpha bravo charlie delta echo", "foxtrot golf hotel india juliet"])
    df2 = spark.read.parquet(p)
    pairs_b = dedup.ngram_jaccard_pairs(
        df2, threshold=0.5, stage_dir=stage
    ).count()
    bitmap_b = dedup.bloom_build_bitmap(df2, "text")
    assert pairs_b == 0  # re-staged: B has no near-dup pair
    assert bitmap_b != bitmap_a  # bloom memo invalidated too

    # same stage_dir fed from a different input path: must re-stage
    p2 = str(tmp_path / "docs2.parquet")
    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": near_a}), p2
    )
    pairs_c = dedup.ngram_jaccard_pairs(
        spark.read.parquet(p2), threshold=0.5, stage_dir=stage
    ).count()
    assert pairs_c == 1


def test_doc_cosine_staged_matches_default(spark, tmp_path):
    """doc_cosine_pairs with stage_dir (the tokenize-once 100 TB path)
    must return identical pairs and scan the staged parquet."""
    from data_engineering_course_project_2023_spark.plans import llmops
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, "/root/testdata/sf0.001", ("documents",))
    stage = str(tmp_path / "cosine_tf_stage")
    default = {
        (r["doc_a"], r["doc_b"], r["dot"], r["cosine"])
        for r in llmops.doc_cosine_pairs(t).collect()
    }
    staged_df = llmops.doc_cosine_pairs(t, stage_dir=stage)
    staged = {
        (r["doc_a"], r["doc_b"], r["dot"], r["cosine"])
        for r in staged_df.collect()
    }
    assert staged == default and len(staged) > 0
    jvm = spark._jvm
    plan = staged_df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "cosine_tf_stage" in plan


def test_prefix_jaccard_complete_and_prunes(spark):
    """Prefix filtering must be LOSSLESS (exactly the naive result —
    also enforced at sf0.01 by the parity gate, whose oracle is the
    naive algorithm) and must actually prune: the prefix index must be
    materially smaller than the full inverted index."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.operators import dedup
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, "/root/testdata/sf0.001", ("documents",))
    docs = t["documents"]
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.prefix_jaccard_pairs(docs).collect()
    }
    naive = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.8, max_df=None
        ).collect()
    }
    assert got == naive and len(got) > 0

    full_index = dedup.shingles(docs).count()
    sh = dedup.shingles(docs)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    keyed = sh.join(freq, "shingle").select(
        "doc_id", F.struct("df", "shingle").alias("ks")
    )
    prefix_index = (
        keyed.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("ks")).alias("arr"))
        .select(
            F.size(
                F.slice(
                    "arr", 1,
                    (F.size("arr") - F.expr(
                        "(size(arr) * 4 + 4) div 5") + 1).cast("int"),
                )
            ).alias("p")
        )
        .agg(F.sum("p"))
        .first()[0]
    )
    assert prefix_index * 3 < full_index  # >3x smaller index


def test_doc_cosine_capped_recall_vs_exact_sf01z(spark, sf01z_dir):
    """Prefix-policy recall pin (VERDICT_r7 #1): on the Zipf axis the
    capped variant must (a) emit a SUBSET of the exact operator's pairs
    with identical dot/cosine values (exact scoring — the policy can
    only miss, never mis-score) and (b) recall every exact pair at
    sf0.1z (measured 24/24; the residual misses only appear at sf1z —
    the env-gated slow pin below covers that decade). The sf01z_dir
    fixture REGENERATES the axis when absent — the pin can no longer
    silently skip its Zipf leg (round-9 methodology catch)."""
    from data_engineering_course_project_2023_spark.plans import llmops
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, sf01z_dir, ("documents",))
    exact = {
        (r["doc_a"], r["doc_b"], r["dot"], r["cosine"])
        for r in llmops.doc_cosine_pairs(t).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["dot"], r["cosine"])
        for r in llmops.doc_cosine_pairs_capped(t).collect()
    }
    assert capped <= exact  # never a spurious or mis-scored pair
    assert capped == exact and len(exact) > 0  # full recall at this SF


def test_doc_cosine_capped_recall_sf1z_slow(spark):
    """The sf1z decade recall pin — env-gated (exact operator needs
    ~10 min at sf1z): SPARK_GRAFT_SLOW=1 runs it; the round-8 measured
    value is 243/248 = 0.980 with every miss being an accidental
    common-token pair (min shared df >= 773), recorded in SCALE.md."""
    import os

    import pytest

    if os.environ.get("SPARK_GRAFT_SLOW") != "1":
        pytest.skip("slow sf1z recall pin (set SPARK_GRAFT_SLOW=1)")
    if not os.path.isdir("/root/repo/testdata/sf1z"):
        pytest.skip("self-generated sf1z absent (tools/gen_sf.py)")
    from data_engineering_course_project_2023_spark.plans import llmops
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, "/root/repo/testdata/sf1z", ("documents",))
    exact = {
        (r["doc_a"], r["doc_b"]) for r in llmops.doc_cosine_pairs(t).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.doc_cosine_pairs_capped(t).collect()
    }
    assert not (capped - exact)
    assert len(capped & exact) / len(exact) >= 0.97


def test_ngram_jaccard_capped_recall_vs_exact(spark, sf01z_dir):
    """VERDICT_r8 #1 pin: the capped shingle-Jaccard must emit a
    SUBSET of the exact operator's pairs with identical jaccard values
    (exact rescoring — the policy can only miss, never mis-score) and
    recall every exact pair on BOTH vocabulary regimes at these SFs
    (measured 25/25 fixed sf0.01, 256/256 fixed sf0.1, 8/8 Zipf
    sf0.1z). The Zipf leg is MANDATORY — sf01z_dir regenerates the
    axis when absent instead of the assertion set silently shrinking
    (round-9 methodology catch)."""
    from data_engineering_course_project_2023_spark.operators import dedup
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    dirs = ["/root/testdata/sf0.01", sf01z_dir]
    for sf_dir in dirs:
        t = load_tables(spark, sf_dir, ("documents",))
        docs = t["documents"]
        exact = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_pairs(
                docs, threshold=0.8, max_df=1000
            ).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in dedup.ngram_jaccard_capped_pairs(docs).collect()
        }
        assert capped <= exact, sf_dir  # never spurious / mis-scored
        assert capped == exact and len(exact) > 0, sf_dir


def test_containment_capped_recall_vs_exact(spark, sf01z_dir):
    """The directed-prefix containment pin: capped ⊆ exact with
    identical (n_common, n_a, containment) values, full recall at
    sf0.01 (fixed) and sf0.1z (Zipf — the axis where the symmetric
    prefix×prefix block measured 32/46 and the directed block +
    df>=2 prefix filter measured 46/46). The Zipf leg is MANDATORY —
    sf01z_dir regenerates the axis when absent (round-9 catch)."""
    from data_engineering_course_project_2023_spark.plans import llmops
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    dirs = ["/root/testdata/sf0.01", sf01z_dir]
    for sf_dir in dirs:
        t = load_tables(spark, sf_dir, ("documents",))
        exact = {
            (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"],
             r["containment"])
            for r in llmops.containment_pairs(t).collect()
        }
        capped = {
            (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"],
             r["containment"])
            for r in llmops.containment_pairs_capped(t).collect()
        }
        assert capped <= exact, sf_dir
        assert capped == exact and len(exact) > 0, sf_dir


def _superset_fixture(spark, noise_prefixes):
    """Adversarial containment corpus (ADVICE r9): a 12-token doc `a`
    wholly contained in a large doc `b` that carries ~400 of its OWN
    rare df=2 shingles (partnered by doc `c` so they survive the df>=2
    cut), plus unique-token fillers to keep the relative-df heavy cut
    quiet. `noise_prefixes` controls where b's noise shingles sort
    relative to a's in the global (df asc, s asc) rank order — the
    variable that decides whether any o(|b|) postings cap can see the
    pair. Returns (tables, a_tokens, noise_tokens)."""
    a_toks = [f"b{j:02d}x" for j in range(12)]  # shingles start "b…"
    noise = [
        f"{p}{j:03d}" for j in range(40) for p in noise_prefixes
    ]  # ~400 tokens -> ~400 df=2 shingles in b (partnered by c)
    docs = [
        (0, " ".join(a_toks)),  # a
        (1, " ".join(noise + a_toks)),  # b = noise ++ a
        (2, " ".join(noise)),  # c: df-partner for b's noise shingles
    ] + [
        (10 + i, " ".join(f"f{i:02d}w{j}" for j in range(12)))
        for i in range(40)  # fillers: df=1 shingles, raise n_docs
    ]
    return {"documents": spark.createDataFrame(docs, ["doc_id", "text"])}


def test_containment_capped_large_superset(spark):
    """The size-aware postings cap pin (ADVICE r9 medium): a small doc
    contained in a large superset whose own rare shingles push the
    contained doc's witnesses BEYOND the fixed CONTAIN_POST_R rank must
    still be recalled, because b keeps >= 1/CONTAIN_POST_DIV of its
    df>=2 ranks. The fixture places a's shingles ~10% into b's rank
    order (noise spread over prefixes a..z below and above) — past the
    old absolute cap, inside the size-aware fraction; the test asserts
    that geometry explicitly, so it cannot silently degrade into a
    case the old cap would also have caught."""
    from collections import Counter

    from data_engineering_course_project_2023_spark.plans import llmops

    # noise prefixes: 1 below "b…" ("a"), 9 above ("c".."k") — a's
    # shingles land ~10% into b's df>=2 rank order.
    t = _superset_fixture(
        spark, ["a"] + [chr(ord("c") + k) for k in range(9)]
    )
    # fixture-geometry assert, pure python twin of the rank logic
    rows = t["documents"].collect()
    sh = {
        r["doc_id"]: {
            " ".join(w[i:i + 3])
            for w in [r["text"].split()]
            for i in range(len(w) - 2)
        }
        for r in rows
    }
    df_cnt = Counter(s for ss in sh.values() for s in ss)
    n_docs = len(rows)
    kept_b = sorted(
        (df_cnt[s], s)
        for s in sh[1]
        if df_cnt[s] >= 2 and df_cnt[s] * llmops.CONTAIN_DF_DIV <= n_docs
    )
    ranks_of_a = sorted(
        i + 1 for i, (_, s) in enumerate(kept_b) if s in sh[0]
    )
    # 2nd witness past the old fixed cap, inside the size-aware cap:
    assert ranks_of_a[1] > llmops.CONTAIN_POST_R, ranks_of_a[:3]
    size_cap = max(
        llmops.CONTAIN_POST_R,
        -(-len(kept_b) // llmops.CONTAIN_POST_DIV),
    )
    assert ranks_of_a[1] <= size_cap, (ranks_of_a[:3], size_cap)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.containment_pairs_capped(t).collect()
    }
    assert (0, 1) in pairs, pairs
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.containment_pairs(t).collect()
    }
    assert pairs <= exact  # still never a spurious pair


def test_containment_capped_adversarial_residue(spark):
    """The OUT-OF-CONTRACT shape, pinned honestly: when every one of
    b's ~400 noise shingles sorts strictly RARER-THEN-LEXICALLY-BEFORE
    a's witnesses (all df=2 ties, noise prefixes entirely below "b…"),
    a's witnesses sit in the last ~3% of b's ranks — beyond ANY
    fixed-fraction cap with DIV>1. The capped operator misses the pair
    BY DESIGN (documented at CONTAIN_POST_R/CONTAIN_POST_DIV); the
    exact operator finds it. If this test ever fails because the
    capped side FOUND the pair, the cap semantics changed — update the
    contract note, don't delete the pin."""
    from data_engineering_course_project_2023_spark.plans import llmops

    # 10 prefixes all lexically below "b…": "a0".."a9"
    t = _superset_fixture(spark, [f"a{k}" for k in range(10)])
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.containment_pairs(t).collect()
    }
    assert (0, 1) in exact
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in llmops.containment_pairs_capped(t).collect()
    }
    assert capped <= exact
    assert (0, 1) not in capped  # the documented residual miss


def test_ngram_jaccard_capped_recall_sf1z_slow(spark):
    """The sf1z decade pin for the shingle family — env-gated like the
    cosine one (the exact inverted index needs minutes at sf1z)."""
    import os

    import pytest

    if os.environ.get("SPARK_GRAFT_SLOW") != "1":
        pytest.skip("slow sf1z recall pin (set SPARK_GRAFT_SLOW=1)")
    if not os.path.isdir("/root/repo/testdata/sf1z"):
        pytest.skip("self-generated sf1z absent (tools/gen_sf.py)")
    from data_engineering_course_project_2023_spark.operators import dedup
    from data_engineering_course_project_2023_spark.plans.registry import (
        load_tables,
    )

    t = load_tables(spark, "/root/repo/testdata/sf1z", ("documents",))
    docs = t["documents"]
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            docs, threshold=0.8, max_df=1000
        ).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_capped_pairs(docs).collect()
    }
    assert not (capped - exact)
    assert len(capped & exact) / max(len(exact), 1) >= 0.97
