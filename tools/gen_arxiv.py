"""Deterministic arXiv-shaped axis for the reference-parity chain
(VERDICT_r8 #2).

The driver's testdata has no arxiv table, so the clean→enrich→star→
graph chain (SURVEY §3.1; reference ``src/utils/utils.py:147-176`` +
``databases.py:48-337``) has only ever executed on a 5-row inline
fixture. This tool generates the chain's bronze + lookup tables at an
arbitrary paper count (default 2.5 M, mirroring the Kaggle corpus the
reference downloads in ``download_dataset_stage_1.py:17``) with the
statistical shape that makes the chain's declared skew risks REAL:

- **author skew** (SURVEY §4.3's named risk for the co-authorship
  self-join): author participation is Zipf(0.85) over a pool of
  n_papers/2 authors — the top author lands on ~1.5% of all author
  slots — and a handful of "mega-collaboration" papers carry 500–1200
  DISTINCT authors each (the ATLAS/CMS shape), so the pair fan-out has
  genuine quadratic hot spots (a 1 000-author paper alone contributes
  ~500 k pairs);
- **category skew**: Zipf over 156 real-prefix category tokens
  (``cs.*``, ``math.*``, ``hep-*``, …) so the general-category remap
  (utils.py:53-62) sees both mapped and pass-through tokens at scale;
- **edge rows everywhere** the FIXTURES.md checklist demands: ~8% null
  doi (dropped by the scan predicate, utils.py:27), ~2% malformed GMT
  dates (kept verbatim, databases.py:62-64), null/empty authors,
  duplicate category tokens, null license/journal-ref;
- **enrichment misses**: s2_papers covers ~90% of papers, and 10% of
  the covered rows are reachable ONLY via the doi fallback
  (api.py:199-241) — the J6/J9 paths run for real, not just on the
  3-row pytest frame.

Values are deterministic (seeded numpy PCG64); this data is for
scaling-curve measurement and cross-engine parity on the SAME parquet
(DuckDB twins in tools/arxiv_census.py), not for replaying the Kaggle
corpus bit-for-bit.

Usage:  python -m tools.gen_sf --arxiv 2500000 --out testdata/arxiv25
   (or) python -m tools.gen_arxiv --n 2500000 --out testdata/arxiv25
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# 26 real archive prefixes x 6 subtags = 156 category tokens; the first
# 20 prefixes are the mapped ones in plans/arxiv_clean.ARCHIVE_GROUPS,
# the rest pass through the remap verbatim (utils.py:56).
_ARCHIVES = [
    "cs", "math", "stat", "q-bio", "q-fin", "econ", "eess", "astro-ph",
    "cond-mat", "gr-qc", "hep-ex", "hep-lat", "hep-ph", "hep-th",
    "math-ph", "nlin", "nucl-ex", "nucl-th", "physics", "quant-ph",
    "weird", "oldstyle", "chao-dyn", "alg-geom", "solv-int", "patt-sol",
]
CATEGORIES = np.array(
    [f"{a}.{s}" for a in _ARCHIVES for s in ("AI", "CO", "TH", "EX", "ME", "SY")]
)
PUBLISHERS = np.array([f"Publisher House {i:03d}" for i in range(300)])
VENUES = np.array([f"Conf{i:02d}" for i in range(40)])
LICENSE_URLS = np.array([
    "http://creativecommons.org/licenses/by/4.0/",
    "http://creativecommons.org/licenses/by-nc-sa/4.0/",
    "http://creativecommons.org/licenses/by-sa/4.0/",
    "http://creativecommons.org/publicdomain/zero/1.0/",
    "http://arxiv.org/licenses/nonexclusive-distrib/1.0/",
])
_GMT_FMT = "%a, %d %b %Y %H:%M:%S GMT"
DAY_S = 86_400


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    cdf = np.cumsum(w / w.sum())
    cdf[-1] = 1.0  # guard fp undershoot (same clamp as gen_sf zipf mode)
    return cdf


def _gmt(rng: np.random.Generator, n: int) -> np.ndarray:
    """n GMT strings in the reference's '%a, %d %b %Y %H:%M:%S %Z'
    format (databases.py:56), uniform over 2007–2023."""
    base = np.datetime64("2007-04-01", "s").astype(np.int64)
    secs = base + rng.integers(0, 16 * 365 * DAY_S, n)
    return (
        pd.Series(secs.astype("datetime64[s]")).dt.strftime(_GMT_FMT).to_numpy()
    )


def _pa(values) -> pa.Array:
    """pa.array that always yields a flat Array — conversions of large
    numpy unicode arrays come back CHUNKED, which from_arrays rejects."""
    a = (
        values
        if isinstance(values, (pa.Array, pa.ChunkedArray))
        else pa.array(values)
    )
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return a


def _list_array(offsets: np.ndarray, values) -> pa.ListArray:
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int64()).cast(pa.int32())
        if offsets.dtype != np.int32 else pa.array(offsets, pa.int32()),
        _pa(values),
    )


def _struct(children: list, names: list[str]) -> pa.StructArray:
    return pa.StructArray.from_arrays([_pa(c) for c in children], names)


def _write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows", flush=True)


def generate_arxiv(n: int, outdir: str, seed: int = 7) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_auth = max(100, n // 2)

    # ---- paper -> author assignment (the skew engine) -----------------
    # base papers: 1 + Poisson(2.3) authors (clipped), Zipf-sampled from
    # the pool; mega papers: 500-1200 CONSECUTIVE pool indices (distinct
    # by construction — collaborations are disjoint people, and the
    # quadratic fan-out must not be deduped away).
    n_mega = n // 125_000  # 20 mega papers at the 2.5 M default
    k_base = 1 + np.minimum(rng.poisson(2.3, n - n_mega), 24)
    k_mega = rng.integers(500, 1201, n_mega)
    k = np.concatenate([k_base, k_mega])
    rng.shuffle(k)  # mega papers land at random paper rows
    total = int(k.sum())
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(k[:-1], out=starts[1:])
    paper_row = np.repeat(np.arange(n, dtype=np.int64), k)

    auth_cdf = _zipf_cdf(n_auth, 0.85)
    slot_auth = np.searchsorted(auth_cdf, rng.random(total), side="right")
    is_mega_slot = np.repeat(k >= 500, k)
    mega_starts = rng.integers(0, n_auth, n)  # per-paper team offset
    consec = np.arange(total, dtype=np.int64) - starts[paper_row]
    slot_auth = np.where(
        is_mega_slot,
        (mega_starts[paper_row] + consec) % n_auth,
        slot_auth,
    )
    # within-paper dedup for the Zipf-sampled base rows (a paper lists
    # an author once); mega rows are distinct already
    key = paper_row * np.int64(n_auth) + slot_auth
    keep = np.ones(total, dtype=bool)
    order = np.argsort(key, kind="stable")
    sk = key[order]
    dup = np.zeros(total, dtype=bool)
    dup[1:] = sk[1:] == sk[:-1]
    keep[order[dup]] = False
    paper_row, slot_auth = paper_row[keep], slot_auth[keep]
    total = paper_row.size

    first = np.char.add("F", np.char.zfill((slot_auth % 9973).astype(str), 4))
    last = np.char.add("S", np.char.zfill(slot_auth.astype(str), 7))
    slot_name = np.char.add(np.char.add(first, " "), last)

    # ---- bronze arxiv_raw ---------------------------------------------
    yymm = 704 + (np.arange(n) * 197) % 1609  # 0704..2312 spread
    ids = np.char.add(
        np.char.add(np.char.zfill(yymm.astype(str), 4), "."),
        np.char.zfill(np.arange(n).astype(str), 7),
    )
    has_doi = rng.random(n) >= 0.08  # ~8% dropped by the scan predicate
    dois = np.where(
        has_doi,
        np.char.add(
            np.char.add(
                "10.", (1000 + np.arange(n) % 4999).astype(str)
            ),
            np.char.add("/j.", np.char.zfill(np.arange(n).astype(str), 7)),
        ),
        None,
    )
    # authors string: comma-joined slot names per paper (empty-author and
    # null-author edge rows injected below)
    auth_join = (
        pd.Series(slot_name)
        .groupby(paper_row)
        .agg(", ".join)
        .reindex(np.arange(n))
        .to_numpy()
    )
    null_auth = rng.random(n) < 0.003
    auth_join = np.where(null_auth, None, auth_join)

    cat_cdf = _zipf_cdf(CATEGORIES.size, 1.05)
    n_cats = rng.choice([1, 2, 3], n, p=[0.55, 0.30, 0.15])
    cat1 = CATEGORIES[np.searchsorted(cat_cdf, rng.random(n), side="right")]
    cat2 = CATEGORIES[np.searchsorted(cat_cdf, rng.random(n), side="right")]
    cat3 = CATEGORIES[np.searchsorted(cat_cdf, rng.random(n), side="right")]
    # object dtype: in-place assignment into a fixed-width <U array
    # silently truncates concatenated tokens
    cats = cat1.astype(object)
    m2 = n_cats >= 2
    cats[m2] = cats[m2] + " " + cat2[m2].astype(object)
    m3 = n_cats >= 3
    cats[m3] = cats[m3] + " " + cat3[m3].astype(object)
    # ~5% repeat their first token (P5 dedup must fire at scale)
    mdup = rng.random(n) < 0.05
    cats[mdup] = cats[mdup] + " " + cat1[mdup].astype(object)

    upd = _gmt(rng, n)
    bad_date = rng.random(n) < 0.02
    upd = np.where(bad_date, "not a parseable date", upd)

    comments = np.char.add(
        np.char.add(rng.integers(2, 60, n).astype(str), " pages,\n  "),
        np.char.add(rng.integers(0, 20, n).astype(str), " figures"),
    )
    comments = np.where(rng.random(n) < 0.2, None, comments)
    jref = np.char.add(
        "J. Res. ", np.char.add((np.arange(n) % 97).astype(str), " (2019)")
    )
    jref = np.where(rng.random(n) < 0.6, None, jref)
    lic = LICENSE_URLS[np.arange(n) % 5]
    lic = np.where(rng.random(n) < 0.5, None, lic)

    # versions: 1-3 structs per paper, GMT created strings
    nv = rng.choice([1, 2, 3], n, p=[0.6, 0.3, 0.1])
    v_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nv, out=v_off[1:])
    v_paper = np.repeat(np.arange(n), nv)
    v_idx = np.arange(v_off[-1]) - v_off[v_paper]
    versions = _list_array(
        v_off,
        _struct(
            [
                pa.array(_gmt(rng, int(v_off[-1]))),
                pa.array(np.char.add("v", (v_idx + 1).astype(str))),
            ],
            ["created", "version"],
        ),
    )
    # authors_parsed: [last, first, ""] triples from the same slots
    ap_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(paper_row, minlength=n), out=ap_off[1:])
    inner = _list_array(
        np.arange(0, 3 * total + 1, 3, dtype=np.int64),
        np.stack([last, first, np.full(total, "")], axis=1).ravel(),
    )
    authors_parsed = _list_array(ap_off, inner)

    _write(outdir, "arxiv_raw", pa.table({
        "id": ids,
        "submitter": np.char.add("sub", (np.arange(n) % 50_000).astype(str)),
        "authors": auth_join,
        "title": np.char.add("Paper ", ids),
        "comments": comments,
        "journal-ref": jref,
        "doi": dois,
        "report-no": np.where(
            rng.random(n) < 0.9, None, np.char.add("RPT-", ids)
        ),
        "categories": cats,
        "license": lic,
        "abstract": np.char.add("We study topic ", (np.arange(n) % 1000).astype(str)),
        "versions": versions,
        "update_date": upd,
        "authors_parsed": authors_parsed,
    }))

    # ---- crossref lookup (J5 side; star-schema columns) ----------------
    cr_mask = has_doi & (rng.random(n) < 0.85)
    cr_idx = np.flatnonzero(cr_mask)
    m = cr_idx.size
    pub_cdf = _zipf_cdf(PUBLISHERS.size, 1.0)
    n_issn = rng.choice([0, 1, 2], m, p=[0.3, 0.5, 0.2])
    i_off = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(n_issn, out=i_off[1:])
    issn_vals = np.char.add(
        np.char.zfill((rng.integers(0, 9999, int(i_off[-1]))).astype(str), 4),
        np.char.add("-", np.char.zfill(
            (rng.integers(0, 9999, int(i_off[-1]))).astype(str), 4)),
    )
    issn = _list_array(
        i_off,
        _struct(
            [
                pa.array(issn_vals),
                pa.array(
                    np.where(
                        np.arange(int(i_off[-1])) % 2 == 0, "print",
                        "electronic",
                    )
                ),
            ],
            ["value", "type"],
        ),
    )
    # references: 0-12 per work; cited DOIs Zipf-skewed toward early
    # papers (citations concentrate — the HAS_REFERENCE edge table is
    # skewed on the cited side too)
    n_ref = rng.integers(0, 13, m)
    r_off = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(n_ref, out=r_off[1:])
    nr = int(r_off[-1])
    cited = (rng.pareto(1.2, nr) * 50).astype(np.int64) % n
    refs = _list_array(
        r_off,
        _struct(
            [
                pa.array(
                    np.char.add(
                        np.char.add("10.", (1000 + cited % 4999).astype(str)),
                        np.char.add("/j.", np.char.zfill(cited.astype(str), 7)),
                    )
                ),
                pa.array(np.char.add("ref", np.arange(nr).astype(str))),
                pa.array(
                    np.where(np.arange(nr) % 3 == 0, "crossref", "publisher")
                ),
            ],
            ["DOI", "key", "doi_asserted_by"],
        ),
    )
    dep = pa.array(
        np.datetime64("2020-01-01", "us").astype(np.int64)
        + rng.integers(0, 1000, m) * (DAY_S * 1_000_000),
        pa.timestamp("us"),
    )
    _write(outdir, "crossref", pa.table({
        "doi": dois[cr_idx],
        "publisher": PUBLISHERS[
            np.searchsorted(pub_cdf, rng.random(m), side="right")
        ],
        "type": np.where(rng.random(m) < 0.8, "journal-article", "proceedings"),
        "issue": np.where(
            rng.random(m) < 0.5, None, (1 + cr_idx % 12).astype(str)
        ),
        "score": pa.array(rng.integers(1, 100, m), pa.int32()),
        "license_start": pa.nulls(m, pa.timestamp("us")),
        "license_url": np.where(
            rng.random(m) < 0.5, None, LICENSE_URLS[cr_idx % 5]
        ),
        "license_content_version": np.where(
            rng.random(m) < 0.5, None, np.where(cr_idx % 2 == 0, "vor", "am")
        ),
        "license_delay": pa.array(
            rng.integers(0, 365, m).astype(np.int32), pa.int32()
        ),
        "journal_name": np.char.add(
            "Journal of Topic ", (cr_idx % 5000).astype(str)
        ),
        "article_number": np.where(
            rng.random(m) < 0.7, None, np.char.add("a", cr_idx.astype(str))
        ),
        "language": np.where(rng.random(m) < 0.9, "en", "de"),
        "short_container_title": np.char.add("JT", (cr_idx % 5000).astype(str)),
        "container_title": np.char.add(
            "Journal of Topic ", (cr_idx % 5000).astype(str)
        ),
        "is_referenced_by_count": pa.array(
            (rng.pareto(1.5, m) * 3).astype(np.int32), pa.int32()
        ),
        "deposited": dep,
        "ISSN_type": issn,
        "references": refs,
    }))

    # ---- s2_papers lookup (J6 fallback side) ----------------------------
    # ~90% coverage; 10% of covered rows are doi-fallback-only
    # (arxiv_id null), so the second join in enrich_s2_with_fallback
    # does real work. Rows with no doi can only match by arxiv id.
    s2_mask = rng.random(n) < 0.90
    s2_idx = np.flatnonzero(s2_mask)
    p = s2_idx.size
    fallback_only = (rng.random(p) < 0.10) & has_doi[s2_idx]
    paper_ids = np.char.add("S2", np.char.zfill(s2_idx.astype(str), 8))
    _write(outdir, "s2_papers", pa.table({
        "paperId": paper_ids,
        "arxiv_id": np.where(fallback_only, None, ids[s2_idx]),
        "s2_doi": dois[s2_idx],
        "s2_title": np.char.add("Paper ", ids[s2_idx]),
        "venue": VENUES[s2_idx % VENUES.size],
        "year": pa.array(2007 + (s2_idx % 16).astype(np.int32), pa.int32()),
        "referenceCount": pa.array(
            rng.integers(0, 80, p).astype(np.int32), pa.int32()
        ),
        "citationCount": pa.array(
            (rng.pareto(1.1, p) * 4).astype(np.int32), pa.int32()
        ),
        "influentialCitationCount": pa.array(
            rng.integers(0, 10, p).astype(np.int32), pa.int32()
        ),
        "isOpenAccess": rng.random(p) < 0.6,
        "journal": _struct(
            [
                pa.array(np.char.add("Journal of Topic ",
                                     (s2_idx % 5000).astype(str))),
                pa.array((1 + s2_idx % 90).astype(str)),
                pa.array(np.char.add("1-", (5 + s2_idx % 40).astype(str))),
            ],
            ["name", "volume", "pages"],
        ),
        "publicationDate": np.char.add(
            (2007 + s2_idx % 16).astype(str), "-06-01"
        ),
    }))

    # ---- s2_authors (the skew carrier for the J4 self-join) -------------
    # same paper->author slots as bronze, restricted to s2-covered papers
    s2_set = np.zeros(n, dtype=bool)
    s2_set[s2_idx] = True
    slot_keep = s2_set[paper_row]
    sp, sa = paper_row[slot_keep], slot_name[slot_keep]
    row_to_pid = np.full(n, "", dtype=object)
    row_to_pid[s2_idx] = paper_ids
    n_aff = rng.choice([0, 1, 2], sp.size, p=[0.3, 0.6, 0.1])
    a_off = np.zeros(sp.size + 1, dtype=np.int64)
    np.cumsum(n_aff, out=a_off[1:])
    affs = _list_array(
        a_off,
        pa.array(
            np.char.add(
                "Uni ", (rng.integers(0, 3000, int(a_off[-1]))).astype(str)
            )
        ),
    )
    _write(outdir, "s2_authors", pa.table({
        "paperId": pa.array(row_to_pid[sp].astype(str)),
        "name": sa,
        "affiliations": affs,
    }))

    # ---- s2_citations / s2_references (J7 fan-out sides) ----------------
    for name, lam in (("s2_citations", 1.5), ("s2_references", 2.0)):
        cnt = rng.poisson(lam, p)
        off = np.zeros(p + 1, dtype=np.int64)
        np.cumsum(cnt, out=off[1:])
        src = np.repeat(paper_ids, cnt)
        tgt_rows = s2_idx[
            (rng.pareto(1.3, int(off[-1])) * 40).astype(np.int64) % p
        ]
        _write(outdir, name, pa.table({
            "paperId": src,
            "otherPaperId": np.char.add(
                "S2", np.char.zfill(tgt_rows.astype(str), 8)
            ),
        }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_500_000)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    print(f"generating arxiv axis n={args.n} -> {args.out}", flush=True)
    generate_arxiv(args.n, args.out, args.seed)


if __name__ == "__main__":
    main()
