"""Calib-normalized cross-round bench comparison (VERDICT_r10 #4).

Every round since r6 re-litigated the same question: is the bench
total drift real or host placement? Round 10 settled the mechanism
(`calib_sec`, a pure-codegen probe embedded in every bench doc, plus
same-box A/Bs) but the comparison stayed manual. This tool makes it
one command: read two bench docs, emit raw and calib-normalized totals
and per-query ratios, and flag only normalized ratios above the
threshold as real.

Accepts BOTH bench-doc shapes:

- the canonical full doc `bench.py` writes (``BENCH_LOCAL*.json``):
  top-level ``value`` / ``calib_sec`` / full ``queries`` name→sec map;
- the driver's per-round capture (``BENCH_r{N}.json``): payload under
  ``parsed``, with the per-query map size-truncated to ``queries_cs``
  (prefix-truncated name → centiseconds).

Truncated names are matched as unique prefixes against the other doc's
keys; ambiguous or unmatched prefixes are dropped from the per-query
comparison (counted in the report so silence never reads as coverage).

Normalization: ``calib_sec`` measures the host's single-thread codegen
speed on a fixed workload, so ``sec / calib_sec`` is a box-independent
cost unit. A pair of docs missing calib on either side degrades to
raw-only with an explicit ``calib: n/a`` marker (pre-r10 driver docs).

Usage:
  python -m tools.bench_compare BENCH_r09.json BENCH_r10.json
  python -m tools.bench_compare A.json B.json --threshold 1.25 --json
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def load_doc(path: str) -> dict:
    """Normalize either doc shape to {value, calib, queries: name→sec,
    n_queries, label}."""
    with open(path) as fh:
        raw = json.load(fh)
    d = raw.get("parsed") or raw
    queries: dict[str, float] = {}
    qmap = d.get("queries") or {}
    nq = d.get("n_queries")
    if nq and len(qmap) == nq:
        queries = {k: float(v) for k, v in qmap.items()}
    elif d.get("queries_cs"):
        queries = {k: v / 100.0 for k, v in d["queries_cs"].items()}
    else:
        queries = {k: float(v) for k, v in qmap.items()}
    return {
        "label": path,
        "value": float(d["value"]),
        "calib": d.get("calib_sec"),
        "n_queries": nq or len(queries),
        "queries": queries,
    }


def _match_keys(a: dict[str, float], b: dict[str, float]):
    """Pair keys across docs, treating shorter keys as prefixes. A
    prefix pairs only when it matches exactly one key on the other
    side. Returns (pairs, n_unmatched)."""
    pairs: list[tuple[str, float, float]] = []
    unmatched = 0
    bkeys = list(b)
    for ka, va in a.items():
        if ka in b:
            pairs.append((ka, va, b[ka]))
            continue
        hits = [kb for kb in bkeys if kb.startswith(ka) or ka.startswith(kb)]
        if len(hits) == 1:
            pairs.append((hits[0] if len(hits[0]) > len(ka) else ka, va, b[hits[0]]))
        else:
            unmatched += 1
    return pairs, unmatched


def compare(a: dict, b: dict, threshold: float = 1.25,
            floor_sec: float = 0.5) -> dict:
    raw_ratio = b["value"] / a["value"]
    calib_ratio = norm_ratio = None
    if a["calib"] and b["calib"]:
        calib_ratio = b["calib"] / a["calib"]
        norm_ratio = raw_ratio / calib_ratio
    pairs, unmatched = _match_keys(a["queries"], b["queries"])
    per_query = []
    for name, va, vb in sorted(pairs, key=lambda p: -(p[2] / max(p[1], 1e-9))):
        r = vb / max(va, 1e-9)
        rn = r / calib_ratio if calib_ratio else None
        per_query.append({"query": name, "a_sec": va, "b_sec": vb,
                          "raw_ratio": round(r, 3),
                          "norm_ratio": round(rn, 3) if rn else None})
    flag_key = "norm_ratio" if calib_ratio else "raw_ratio"
    # The same-code cross-box A/B (canonical r10 vs driver r10, NOTES
    # round-11) measured sub-second queries reading up to 4x normalized
    # across boxes — calib corrects single-thread speed, not multi-core
    # contention, and short queries are warm-up-dominated. The floor
    # keeps the flag list to rows where the ratio can be signal.
    flagged = [q for q in per_query
               if q[flag_key] is not None and q[flag_key] > threshold
               and max(q["a_sec"], q["b_sec"]) >= floor_sec]
    gm = None
    rs = [q["raw_ratio"] for q in per_query if q["raw_ratio"] > 0]
    if rs:
        gm = math.exp(sum(math.log(r) for r in rs) / len(rs))
    return {
        "a": a["label"], "b": b["label"],
        "total_a_sec": a["value"], "total_b_sec": b["value"],
        "raw_total_ratio": round(raw_ratio, 3),
        "calib_a": a["calib"], "calib_b": b["calib"],
        "calib_ratio": round(calib_ratio, 3) if calib_ratio else None,
        "norm_total_ratio": round(norm_ratio, 3) if norm_ratio else None,
        "geomean_raw_ratio": round(gm, 3) if gm else None,
        "geomean_norm_ratio": (round(gm / calib_ratio, 3)
                               if gm and calib_ratio else None),
        "n_compared": len(per_query), "n_unmatched": unmatched,
        "threshold": threshold, "flag_basis": flag_key,
        "flagged": flagged[:20],
        "n_flagged": len(flagged),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("doc_a")
    ap.add_argument("doc_b")
    ap.add_argument("--threshold", type=float, default=1.25)
    ap.add_argument("--floor", type=float, default=0.5,
                    help="ignore queries under this many sec on both sides")
    ap.add_argument("--json", action="store_true",
                    help="emit the full report as one JSON line")
    args = ap.parse_args()
    rep = compare(load_doc(args.doc_a), load_doc(args.doc_b),
                  args.threshold, args.floor)
    if args.json:
        print(json.dumps(rep))
        return
    c = rep
    print(f"A: {c['a']}  total {c['total_a_sec']:.1f}s  calib {c['calib_a']}")
    print(f"B: {c['b']}  total {c['total_b_sec']:.1f}s  calib {c['calib_b']}")
    print(f"raw total ratio B/A: {c['raw_total_ratio']}"
          f"   geomean per-query: {c['geomean_raw_ratio']}")
    if c["norm_total_ratio"] is not None:
        print(f"calib ratio (host speed B/A): {c['calib_ratio']}")
        print(f"NORMALIZED total ratio: {c['norm_total_ratio']}"
              f"   normalized geomean: {c['geomean_norm_ratio']}")
    else:
        print("calib: n/a on one side — raw-only comparison")
    print(f"compared {c['n_compared']} queries ({c['n_unmatched']} unmatched)")
    basis = c["flag_basis"]
    if c["n_flagged"]:
        print(f"{c['n_flagged']} queries over {c['threshold']}x ({basis}):")
        for q in c["flagged"]:
            print(f"  {q['query']:<34} {q['a_sec']:.2f}s -> {q['b_sec']:.2f}s"
                  f"  raw {q['raw_ratio']}  norm {q['norm_ratio']}")
    else:
        print(f"no queries over {c['threshold']}x ({basis}) — drift not real")


if __name__ == "__main__":
    main()
    sys.exit(0)
