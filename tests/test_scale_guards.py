"""Typed scale-guard pins (VERDICT_r10 #2).

prefix_jaccard's exact PPJoin prefix is lossless but structurally
unbounded on saturated-vocab corpora — the sf10 fixed-vocab census row
died at budget_exceeded(1800 s) with no signal beyond the timeout.
Round 11 gave it the minhash_ml treatment: a cheap exact pre-probe of
the candidate-slot volume Σ(prefix-df)² that refuses with a typed
AlgorithmScaleLimit naming ngram_jaccard_capped as the scale path.

Fires / does-not-fire evidence:
- fires: an inline saturated-vocab corpus (30k docs over a 16-word
  vocabulary — the sf10 fixed-vocab regime in miniature) crosses the
  DEFAULT 5e8 guard: the per-doc prefix is long enough to admit
  full-df core shingles (df = n_docs, identically ranked in every
  doc), so Σ(prefix-df)² ≳ 2·30000² ≈ 1.8e9;
- does not fire: the sf0.1z Zipf axis (real Heaps-law vocab growth,
  the regime the operator is FOR) probes at ~3e5 slots, three decades
  under the guard.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_course_project_2023_spark.operators import dedup


def _saturated_corpus(spark, n_docs=30000, vocab=16, tokens=60):
    """Fixed-vocab documents: every doc is `tokens` words drawn
    cyclically (offset by doc id) from a `vocab`-word list — df stops
    discriminating exactly as on the sf10 fixed-vocab axis."""
    words = [f"w{i}" for i in range(vocab)]
    ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    text = F.concat_ws(
        " ",
        *[F.lit(words[0]), *[
            F.element_at(
                F.array(*[F.lit(w) for w in words]),
                ((F.col("doc_id") + k) % vocab + 1).cast("int"),
            )
            for k in range(tokens)
        ]],
    )
    return ids.select("doc_id", text.alias("text"))


def test_guard_fires_on_saturated_vocab(spark):
    df = _saturated_corpus(spark)
    with pytest.raises(dedup.AlgorithmScaleLimit) as ei:
        dedup.prefix_jaccard_pairs(df)
    msg = str(ei.value)
    assert "ngram_jaccard_capped" in msg  # names the scale path
    assert "slots" in msg


def test_guard_quiet_on_zipf_axis(spark, sf01z_dir):
    docs = spark.read.parquet(f"{sf01z_dir}/documents.parquet")
    # Building the frame runs the probe eagerly; no exception = the
    # guard correctly classifies the Heaps-law regime as in-contract.
    out = dedup.prefix_jaccard_pairs(docs)
    assert "jaccard" in out.columns


def test_guard_is_a_census_visible_scale_guard():
    """census_bench records any ScaleGuard as skipped_scale_guard —
    the new AlgorithmScaleLimit must be in that hierarchy (and the
    existing LibraryScaleLimit must remain so)."""
    assert issubclass(dedup.AlgorithmScaleLimit, dedup.ScaleGuard)
    assert issubclass(dedup.LibraryScaleLimit, dedup.ScaleGuard)
