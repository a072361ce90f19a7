"""One-shot recall + timing measurement: doc_cosine_pairs_capped vs the
exact doc_cosine_pairs on the sf1z Zipf corpus (VERDICT_r7 #1 'done'
criteria: capped sf1z < 30 s, recall >= 1-1e-5). Writes a JSON record
consumed by NOTES.md / SCALE.md; the always-on pytest pin runs at
sf0.1z where exact is cheap.

Usage: python -m tools.cosine_recall_sf1z [sf_dir] [out_json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata/sf1z"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cosine_recall_sf1z.json"
    from data_engineering_course_project_2023_spark.plans import registry
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="cosine_recall_sf1z")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.monotonic()
    capped = {
        (r.doc_a, r.doc_b)
        for r in registry.run_query(
            "doc_cosine_pairs_capped", spark, sf_dir
        ).collect()
    }
    t_capped = time.monotonic() - t0

    t0 = time.monotonic()
    exact = {
        (r.doc_a, r.doc_b)
        for r in registry.run_query("doc_cosine_pairs", spark, sf_dir).collect()
    }
    t_exact = time.monotonic() - t0

    missed = exact - capped
    spurious = capped - exact  # must be empty: scoring is exact
    rec = {
        "sf_dir": sf_dir,
        "capped_s": round(t_capped, 1),
        "exact_s": round(t_exact, 1),
        "n_exact": len(exact),
        "n_capped": len(capped),
        "n_missed": len(missed),
        "n_spurious": len(spurious),
        "recall": 1.0 if not exact else 1.0 - len(missed) / len(exact),
        "missed_sample": sorted(missed)[:10],
    }
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
