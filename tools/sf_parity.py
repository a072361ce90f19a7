"""Oracle-parity census at an arbitrary (self-generated) scale factor.

The driver's CORRECTNESS gate runs at sf0.01 and the local pytest twin
sweeps sf0.01/sf0.1 — both on the driver's own parquet drop. This tool
extends the same value-exact compare to the scale-stress data from
``tools/gen_sf.py`` (sf1 = 10× the largest driver SF), turning the
scaling CURVE measurement (BENCH_LOCAL_sf1.json) into a scaling
CORRECTNESS measurement: every distribution-free oracled query must
still match DuckDB bit-for-bit on 10× data, or the mismatch names the
operator whose semantics silently drift with scale.

Known structural exclusions (each recorded in the output, not hidden):

- ``ivf_topk/pq_codes/pq_topk/ivfpq_topk``: oracle SQL embeds centroids
  and codebooks TRAINED on the sf0.01 fixture — exact there, meaningless
  elsewhere (same skip the pytest SF-sweep applies).
- oracles that are deliberately NAIVE quadratic spellings (the
  completeness proofs: all-pairs similarity, NOT-EXISTS dominance) get a
  DuckDB wall-clock budget; a timeout is recorded as ``oracle_timeout``
  — the ENGINE side still ran, so the row certifies execution, just not
  value parity at this SF.

Usage:
    python -m tools.sf_parity --sf /root/repo/testdata/sf1 \
        --out CORRECTNESS_LOCAL_sf1.json [--duck-timeout 180]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.parity import duck_con  # noqa: E402
from tools.driver_sim import _canon, _cell_key, _hashable_probe  # noqa: E402

# oracle constants trained on the sf0.01 fixture (see pytest sweep).
# For SFs with regenerated constants (tools/gen_ann_fixtures.py ->
# plans/ann_fixtures.py) the per-SF oracle is built instead of skipped.
SF001_PINNED = {"ivf_topk", "pq_codes", "pq_topk", "ivfpq_topk"}

# Per-query oracle budget raises (VERDICT_r9 #4): the deliberately
# NAIVE all-pairs doc_cosine_pairs twin (the completeness proof the
# capped twin's parity is measured against) exceeds the default 180 s
# at sf1z while the engine side completes — which left the flagship
# Zipf census with a permanently-unverifiable row. The naive spelling
# stays naive (that is its point); it just gets the wall-clock its
# O(n²) honesty costs at this one SF.
ORACLE_BUDGET_RAISE = {
    "doc_cosine_pairs": 2400.0,
    # The capped-containment twin is not naive — it replays the full
    # rarest-R + df-band postings policy — but DuckDB evaluates its
    # two window ranks over the complete shingle stream; at sf1's
    # 500 k-doc fixed-vocab corpus that pass needs more than the
    # default 180 s on a loaded box (round 10: 180.7 s under census
    # contention, engine side 19.4 s). Same one-row raise discipline
    # as doc_cosine_pairs.
    "containment_pairs_capped": 2400.0,
}


def per_sf_ann_oracle(name: str, sf_dir: str) -> str | None:
    """Value-exact oracle SQL for the four codebook-pinned ANN queries
    at a non-sf0.01 SF, from the regenerated per-SF constants; None if
    no constants exist for this SF (caller records pinned_skip)."""
    from data_engineering_course_project_2023_spark.plans import (
        ivf_fixture,
        pq_fixture,
    )

    try:
        from data_engineering_course_project_2023_spark.plans.ann_fixtures import (
            ANN_FIXTURES,
        )
    except ImportError:
        return None
    base = os.path.basename(os.path.normpath(sf_dir))
    if base == "sf0.01":
        # the driver SF — the registered static oracle IS this SF's twin
        from data_engineering_course_project_2023_spark.plans import registry

        return registry.REGISTRY[name].oracle
    fx = ANN_FIXTURES.get(base)
    if fx is None:
        return None
    if name == "ivf_topk":
        return ivf_fixture.ivf_topk_sql(cents=fx["ivf"])
    if name == "pq_codes":
        return pq_fixture.pq_codes_oracle_sql(codebook=fx["pq"])
    if name == "pq_topk":
        return pq_fixture.pq_topk_oracle_sql(codebook=fx["pq"])
    if name == "ivfpq_topk":
        return ivf_fixture.ivfpq_topk_oracle_sql(
            cents=fx["ivf"], codebook=fx["ivfpq"]
        )
    return None


def compare_frames(sp, du) -> list[str]:
    problems: list[str] = []
    if sorted(sp.columns) != sorted(du.columns):
        return [f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"]
    if len(sp) != len(du):
        problems.append(f"rows: spark={len(sp)} duckdb={len(du)}")
    for c in sorted(sp.columns):
        fam = lambda k: "i" if k in "iu" else k  # noqa: E731
        if len(sp) and len(du) and fam(sp[c].dtype.kind) != fam(du[c].dtype.kind):
            problems.append(f"dtype {c}: spark={sp[c].dtype} duckdb={du[c].dtype}")
    csp, cdu = _canon(sp), _canon(du)
    if len(csp) == len(cdu):
        sp_rows = [tuple(map(_cell_key, r)) for r in csp.itertuples(index=False)]
        du_rows = [tuple(map(_cell_key, r)) for r in cdu.itertuples(index=False)]
        if sp_rows != du_rows and sorted(sp_rows) != sorted(du_rows):
            k = next(
                i for i, (a, b) in enumerate(zip(sp_rows, du_rows)) if a != b
            )
            problems.append(
                f"values differ at canon row {k}: {sp_rows[k]} vs {du_rows[k]}"
            )
    return problems


def run_duck_with_budget(sql: str, sf_dir: str, budget_s: float):
    """Run the oracle with a watchdog that interrupts DuckDB if the
    (deliberately naive) spelling exceeds its wall budget."""
    con = duck_con(sf_dir)
    timed_out = threading.Event()

    def _kill():
        timed_out.set()
        con.interrupt()

    timer = threading.Timer(budget_s, _kill)
    timer.start()
    try:
        df = con.execute(sql).df()
        return df, False
    except Exception:
        if timed_out.is_set():
            return None, True
        raise
    finally:
        timer.cancel()
        con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/repo/testdata/sf1")
    ap.add_argument("--out", default="CORRECTNESS_LOCAL_sf1.json")
    ap.add_argument("--duck-timeout", type=float, default=180.0)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from data_engineering_course_project_2023_spark.plans import registry
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="sf_parity")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    counts = {"match": 0, "mismatch": 0, "oracle_timeout": 0,
              "rows_only": 0, "pinned_skip": 0, "error": 0}
    names = args.only or list(registry.REGISTRY)
    for name in names:
        q = registry.REGISTRY[name]
        rec: dict = {}
        try:
            t0 = time.monotonic()
            sp = registry.run_query(name, spark, args.sf).toPandas()
            rec["spark_s"] = round(time.monotonic() - t0, 2)
            rec["rows"] = len(sp)
            bad = _hashable_probe(sp)
            if bad:
                rec["status"] = "mismatch"
                rec["detail"] = f"unhashable spark columns {bad}"
            elif name in SF001_PINNED and (
                per_sf := per_sf_ann_oracle(name, args.sf)
            ) is not None:
                t0 = time.monotonic()
                du, timed_out = run_duck_with_budget(
                    per_sf, args.sf, args.duck_timeout
                )
                rec["duck_s"] = round(time.monotonic() - t0, 2)
                if timed_out:
                    rec["status"] = "oracle_timeout"
                else:
                    problems = compare_frames(sp, du)
                    rec["status"] = "match" if not problems else "mismatch"
                    rec["detail"] = "per-SF regenerated codebook oracle" + (
                        "" if not problems else "; " + "; ".join(problems)[:380]
                    )
            elif name in SF001_PINNED:
                rec["status"] = "pinned_skip"
                rec["detail"] = "oracle constants trained on sf0.01 fixture"
            elif q.oracle is None:
                _canon(sp)  # the driver's rows-only path must not crash
                rec["status"] = "rows_only"
            else:
                budget = max(
                    args.duck_timeout, ORACLE_BUDGET_RAISE.get(name, 0.0)
                )
                t0 = time.monotonic()
                du, timed_out = run_duck_with_budget(
                    q.oracle, args.sf, budget
                )
                rec["duck_s"] = round(time.monotonic() - t0, 2)
                if timed_out:
                    rec["status"] = "oracle_timeout"
                    rec["detail"] = (
                        f"naive oracle spelling exceeded {budget}s"
                    )
                else:
                    problems = compare_frames(sp, du)
                    rec["status"] = "match" if not problems else "mismatch"
                    if problems:
                        rec["detail"] = "; ".join(problems)[:400]
        except Exception as ex:  # pragma: no cover - census robustness
            rec["status"] = "error"
            rec["detail"] = f"{type(ex).__name__}: {str(ex)[:300]}"
        counts[rec["status"]] += 1
        results[name] = rec
        flag = "" if rec["status"] == "match" else f"  <-- {rec['status']}"
        print(f"{name:32s} {rec['status']}{flag}", flush=True)

    out = {
        "sf_dir": args.sf,
        "n": len(results),
        "summary": counts,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"\n{counts}")
    return 1 if counts["mismatch"] or counts["error"] else 0


if __name__ == "__main__":
    sys.exit(main())
