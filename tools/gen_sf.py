"""Deterministic scale-factor generator for scale-stress testing.

The driver's testdata tops out at sf0.1 (~17 MB); the 100 TB story
needs at least one measured decade above that (VERDICT_r6 #1). This
tool regenerates all ten TESTDATA.md tables at an arbitrary SF with the
same schemas (physical parquet types matched to the driver drop:
timestamp[us] NTZ, int32 small keys) and the same *statistical shape*,
profiled from the sf0.1 drop:

- row counts: linear in SF from the sf0.1 census (documents 10x per
  decade, embeddings 4x per decade — both match the 0.01→0.1 step);
- lineitem lines-per-order sampled from the sf0.1 empirical histogram;
- l_shipdate independent uniform over [1995-01-02, 2001-11-04] (the
  profiled shape — NOT orderdate-anchored; the join delta spans ±2400d);
- events: ts uniform over Jan 2024, users = customers/10, value
  exponential(mean 50) rounded to cents, props = {"k": 0..99};
- documents: 10..100 words uniform from the same fixed 31-word vocab,
  lang {en .4, de/es/fr/zh .15}, source src0..19, ~0.16% exact-dup
  injection (8 dup pairs per 5k docs at sf0.1);
- embeddings: iid random unit float32[64] vectors (the sf0.1 drop has
  no real cluster structure — mean cosine to label centroid 0.063 ≈
  1/sqrt(n)), labels multinomial over 10.

Values are NOT bit-identical to the driver generator (seed/PRNG
unknown) — this data is for *scaling-curve measurement*, not oracle
replay; oracle parity at generated SFs is a bonus that holds for every
distribution-free query.

Usage: python -m tools.gen_sf --sf 1.0 --out /root/repo/testdata_sf1
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
# lines-per-order empirical pmf from the sf0.1 drop (1..17 lines)
LPO_COUNTS = np.array(
    [11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407, 1959, 818,
     292, 93, 29, 10, 1, 2, 1],
    dtype=np.float64,
)
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _ts_us(base_day: str, day_offsets: np.ndarray) -> pa.Array:
    base = np.datetime64(base_day, "us").astype(np.int64)
    return pa.array(
        base + day_offsets.astype(np.int64) * DAY_US, pa.timestamp("us")
    )


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _zipf_draw(rng: np.random.Generator, n_keys: int, size: int,
               s: float = 0.9) -> np.ndarray:
    """Zipf(s)-distributed key draws over [0, n_keys) — the skewed-key
    mode for relational fact keys (VERDICT_r8 #5: the salted/AQE skew
    paths were only ever exercised on uniform keys)."""
    w = 1.0 / np.arange(1, n_keys + 1, dtype=np.float64) ** s
    cdf = np.cumsum(w / w.sum())
    cdf[-1] = 1.0
    return np.searchsorted(cdf, rng.random(size), side="right")


def generate(
    sf: float, outdir: str, seed: int = 7, vocab_mode: str = "fixed",
    keys_mode: str = "uniform",
) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    # embeddings grow 4x per decade (500 @ sf0.01, 2000 @ sf0.1)
    n_emb = max(1, int(round(2000 * 4 ** (np.log10(sf / 0.1)))))
    n_user = max(1, n_cust // 10)

    _write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    _write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([
            f"{a} {n}" for a, n in zip(
                np.array(ADJ)[rng.integers(0, 8, n_part)],
                np.array(NOUN)[rng.integers(0, 8, n_part)])
        ]),
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 1),
    }))

    # orders: dates are day-granular, uniform 1995-01-01..2001-08-01
    order_days = rng.integers(0, 2405, n_ord)
    _write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(
            _zipf_draw(rng, n_cust, n_ord) if keys_mode == "zipf"
            else rng.integers(0, n_cust, n_ord)),
        "o_orderstatus": pa.array(
            np.array(["F", "O", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _ts_us("1995-01-01", order_days),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    lpo = rng.choice(
        np.arange(1, 18), size=n_ord, p=LPO_COUNTS / LPO_COUNTS.sum())
    n_li = int(lpo.sum())
    l_orderkey = np.repeat(np.arange(n_ord, dtype=np.int64), lpo)
    l_linenumber = (
        np.arange(n_li, dtype=np.int64)
        - np.repeat(np.cumsum(lpo) - lpo, lpo) + 1
    ).astype(np.int32)
    _write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey),
        "l_partkey": pa.array(
            _zipf_draw(rng, n_part, n_li) if keys_mode == "zipf"
            else rng.integers(0, n_part, n_li)),
        "l_suppkey": pa.array(
            _zipf_draw(rng, n_supp, n_li) if keys_mode == "zipf"
            else rng.integers(0, n_supp, n_li)),
        "l_linenumber": pa.array(l_linenumber),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us("1995-01-02", rng.integers(0, 2499, n_li)),
    }))

    evt_us = rng.integers(0, 30 * DAY_US, n_evt)
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    _write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt, dtype=np.int64)),
        "ts": pa.array(base + evt_us, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_user, n_evt)),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_evt)]),
    }))

    nwords = rng.integers(10, 101, n_doc)
    if vocab_mode == "zipf":
        # Realistic-corpus mode: vocabulary GROWS with N (Heaps' law,
        # V = 8·N^0.55) and word frequencies follow a Zipf-Mandelbrot
        # curve — the regime where relative-df cuts and prefix filters
        # behave as designed. The driver drop's fixed 31-word vocab is
        # the worst case for any inverted-index scheme (every shingle's
        # df saturates as N grows); this mode is the other end of the
        # axis, so the dedup/similarity family can be stress-measured
        # on both. Near-dup pairs are INJECTED (~0.3%, 10% of words
        # rewritten) because a growing vocabulary no longer produces
        # natural collisions.
        v_size = int(np.ceil(8 * n_doc ** 0.55))
        ranks = np.arange(1, v_size + 1)
        w = 1.0 / (ranks + 2.7)
        cdf = np.cumsum(w / w.sum())
        # float normalization can leave cdf[-1] fractionally below 1.0;
        # force it so searchsorted(side="right") never returns v_size
        cdf[-1] = 1.0
        vocab = np.array([f"w{r:05d}" for r in ranks])
        texts = [
            " ".join(vocab[np.searchsorted(cdf, rng.random(k), side="right")])
            for k in nwords
        ]
        for i in rng.choice(
            n_doc, size=max(0, int(0.003 * n_doc)), replace=False
        ):
            if i > 0:
                srcw = texts[int(rng.integers(0, i))].split()
                m = max(1, len(srcw) // 10)
                pos = rng.choice(len(srcw), size=m, replace=False)
                ids = np.searchsorted(cdf, rng.random(m), side="right")
                for p_, wid in zip(pos, ids):
                    srcw[p_] = vocab[wid]
                texts[i] = " ".join(srcw)
    else:
        vocab = np.array(VOCAB)
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in nwords
        ]
    # exact-dup injection at the sf0.1 observed rate (~0.16%)
    dup_idx = rng.choice(n_doc, size=max(0, int(0.0016 * n_doc)),
                         replace=False)
    for i in dup_idx:
        if i > 0:
            texts[i] = texts[int(rng.integers(0, i))]
    _write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, size=n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array(
            np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb).astype(np.int32)),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--vocab", choices=("fixed", "zipf"), default="fixed",
        help="documents vocabulary: 'fixed' replays the driver drop's "
        "31-word worst case; 'zipf' grows vocabulary with N (Heaps' "
        "law) with injected near-dups — the realistic-corpus stress "
        "mode for the dedup/similarity family",
    )
    ap.add_argument(
        "--keys", choices=("uniform", "zipf"), default="uniform",
        help="relational fact keys: 'uniform' replays the driver drop; "
        "'zipf' skews o_custkey / l_partkey / l_suppkey (Zipf 0.9) so "
        "the salted-aggregation and AQE-skew-join paths face real hot "
        "keys (VERDICT_r8 #5)",
    )
    ap.add_argument(
        "--arxiv", type=int, default=None, metavar="N_PAPERS",
        help="instead of the TPC-H-ish tables, generate the arXiv-"
        "shaped reference-parity axis (bronze + crossref/s2 lookups "
        "with Zipf author/category skew) at N papers — see "
        "tools/gen_arxiv.py (VERDICT_r8 #2)",
    )
    args = ap.parse_args()
    if args.arxiv is not None:
        from tools.gen_arxiv import generate_arxiv

        print(f"generating arxiv axis n={args.arxiv} -> {args.out}")
        generate_arxiv(args.arxiv, args.out, args.seed)
    else:
        print(
            f"generating sf={args.sf} ({args.vocab} vocab, "
            f"{args.keys} keys) -> {args.out}"
        )
        generate(args.sf, args.out, args.seed, args.vocab, args.keys)
