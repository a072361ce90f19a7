"""Per-query scaling exponents from two bench censuses.

    python -m tools.scale_exponents [--lo BENCH_LOCAL.json --hi BENCH_LOCAL_sf1.json]

exponent = log(t_hi / t_lo) / log(sf_hi / sf_lo) — 1.0 is perfectly
linear in data size, <1 means fixed overhead still dominates at the
higher SF, >1 is superlinear growth (the scale-regression signal; at
local scale anything ≤ ~1.15 is noise given per-round scheduling
floors). Prints a markdown table sorted by exponent desc.
"""

from __future__ import annotations

import argparse
import json
import math
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", default=os.path.join(HERE, "BENCH_LOCAL.json"))
    ap.add_argument("--hi", default=os.path.join(HERE, "BENCH_LOCAL_sf1.json"))
    ap.add_argument("--floor", type=float, default=0.25,
                    help="ignore queries faster than this at the LOW sf "
                         "(scheduling noise dominates)")
    args = ap.parse_args()
    lo = json.load(open(args.lo))
    hi = json.load(open(args.hi))
    ratio = math.log(float(hi["sf"]) / float(lo["sf"]))
    rows = []
    for name, t_lo in lo["queries"].items():
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            continue
        if t_lo < args.floor:
            continue
        exp = math.log(t_hi / t_lo) / ratio
        rows.append((exp, name, t_lo, t_hi))
    rows.sort(reverse=True)
    print(f"| query | t_sf{lo['sf']} | t_sf{hi['sf']} | exponent |")
    print("| --- | --- | --- | --- |")
    for exp, name, t_lo, t_hi in rows:
        print(f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {exp:.2f} |")
    print()
    print(f"totals: {lo['value']:.1f} s -> {hi['value']:.1f} s "
          f"(exponent {math.log(hi['value'] / lo['value']) / ratio:.2f}); "
          f"{len(rows)} queries above the {args.floor}s floor")


if __name__ == "__main__":
    main()
