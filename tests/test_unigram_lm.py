"""Unigram-LM trainer semantics, cross-checked against a from-scratch
pure-Python implementation (the BPE discipline: the DuckDB twin unrolls
the same relational spelling, so a shared misreading of the EM could
slip through two agreeing engines — the third, independent spelling
here pins the intended semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.plans import llmops

from .conftest import SF_SMOKE


def _ref_unigram(word_freqs: dict[str, int]):
    """From-scratch hard-EM unigram trainer mirroring the documented
    spec (caps, seed inventory, Viterbi tiebreak, Laplace M-step)."""
    max_piece = llmops.UNIGRAM_MAX_PIECE
    wf = {
        w: n for w, n in word_freqs.items() if len(w) <= llmops.UNIGRAM_MAX_WORD
    }
    f: dict[str, int] = {}
    for w, n in wf.items():
        for i in range(len(w)):
            for ln in range(1, max_piece + 1):
                if i + ln <= len(w):
                    p = w[i : i + ln]
                    f[p] = f.get(p, 0) + n
    chars = {p: c for p, c in f.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in f.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[: llmops.UNIGRAM_TOP_MULTI]
    inv = dict(chars)
    inv.update(dict(multi))
    tot = sum(inv.values())
    score = {p: round(math.log(tot / c) * 1e6) for p, c in inv.items()}
    cnt = dict(inv)

    def segment(w: str) -> list[str]:
        best = None
        for mask in range(1 << (len(w) - 1)):
            starts = [1] + [
                k + 1 for k in range(1, len(w)) if (mask >> (k - 1)) & 1
            ]
            pieces, ok = [], True
            for idx, s in enumerate(starts):
                e = starts[idx + 1] if idx + 1 < len(starts) else len(w) + 1
                p = w[s - 1 : e - 1]
                if len(p) > max_piece or p not in score:
                    ok = False
                    break
                pieces.append(p)
            if not ok:
                continue
            key = (sum(score[p] for p in pieces), len(pieces), mask)
            if best is None or key < best[0]:
                best = (key, pieces)
        assert best is not None  # all-chars split is always valid
        return best[1]

    for _ in range(llmops.UNIGRAM_EM_ROUNDS):
        c: dict[str, int] = {}
        for w, n in wf.items():
            for p in segment(w):
                c[p] = c.get(p, 0) + n
        kept = {p for p in score if len(p) == 1 or c.get(p, 0) > 0}
        tot = sum(c.get(p, 0) for p in kept)
        n_inv = len(kept)
        score = {
            p: round(math.log((tot + n_inv) / (c.get(p, 0) + 1)) * 1e6)
            for p in kept
        }
        cnt = {p: c.get(p, 0) for p in kept}
    seg_len = {w: len(segment(w)) for w in wf}
    return cnt, score, seg_len


def _word_freqs(spark, sf_dir: str) -> dict[str, int]:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return {r["w"]: r["n"] for r in rows}


def test_train_matches_pure_python(spark):
    got = {
        r["piece"]: (r["piece_count"], r["score_micro"])
        for r in llmops.unigram_lm_train(
            {"documents": spark.read.parquet(f"{SF_SMOKE}/documents.parquet")}
        ).collect()
    }
    cnt, score, _ = _ref_unigram(_word_freqs(spark, SF_SMOKE))
    want = {p: (cnt[p], score[p]) for p in score}
    assert got == want


def test_encode_matches_pure_python_segmentation(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = llmops.unigram_lm_encode({"documents": docs}).collect()
    _, _, seg_len = _ref_unigram(_word_freqs(spark, SF_SMOKE))
    import re

    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for row in got:
        words = [w for w in re.split(r"\s+", texts[row["doc_id"]]) if w]
        n_pieces = sum(seg_len.get(w, len(w)) for w in words)
        assert row["n_words"] == len(words)
        assert row["n_chars"] == sum(len(w) for w in words)
        assert row["n_pieces"] == n_pieces
        assert row["chars_per_piece"] == pytest.approx(
            row["n_chars"] / n_pieces
        )


def test_long_word_char_fallback(spark):
    """Words past the 12-char training cap never enter the model and
    encode as one piece per char — spelled via the left join + coalesce
    in both engines."""
    docs = spark.createDataFrame(
        [
            (0, "short tokens here", "en", "s", 17),
            (1, "supercalifragilistic word", "en", "s", 25),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    train = llmops.unigram_lm_train({"documents": docs}).collect()
    assert all(len(r["piece"]) <= llmops.UNIGRAM_MAX_PIECE for r in train)
    assert not any("super" in r["piece"] for r in train)
    enc = {
        r["doc_id"]: r
        for r in llmops.unigram_lm_encode({"documents": docs}).collect()
    }
    # doc 1: "supercalifragilistic" (20 chars, excluded) falls back to
    # 20 single-char pieces; "word" is trained.
    _, _, seg_len = _ref_unigram({"short": 1, "tokens": 1, "here": 1, "word": 1})
    assert enc[1]["n_pieces"] == 20 + seg_len["word"]


def test_em_improves_or_holds_corpus_cost(spark):
    """Sanity: the EM's final model segments the corpus at no more
    pieces than the all-chars baseline, and every word's piece count is
    between ceil(len/4) and len."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    _, seg = llmops._unigram_train({"documents": docs})
    for r in seg.collect():
        w = r["word"]
        assert -(-len(w) // llmops.UNIGRAM_MAX_PIECE) <= r["wpieces"] <= len(w)
