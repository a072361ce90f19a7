"""JDBC sink write-scaling A/B (VERDICT_r10 #5).

`BENCH_ARXIV.json`'s DWH leg lands 34.1 M rows in embedded Derby with
`dim_references` (10.56 M rows / 470 s) as the long pole — a
4-connection write whose ceiling was asserted ("embedded Derby
serializes page latches anyway") but never measured. This tool
measures it: a references-shaped synthetic frame (two string keys, one
of them a ~40-char id — the dim_references schema shape) is written
into a scratch Derby through the SAME ``writers.write_jdbc`` path
under a grid of (num_partitions × batchsize), recording rows/s per
cell. The verdict the numbers support goes to NOTES; if Derby
serializes writers, the flat partition curve IS the documented sink
limit (a real Postgres/warehouse target is where the knob pays).

Usage:
  python -m tools.jdbc_load_ab [--rows 2000000] [--out /tmp/jdbc_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--work", default="/tmp/jdbc_ab_derby")
    ap.add_argument("--out", default="/tmp/jdbc_ab.json")
    ap.add_argument("--grid", default="1x20000,2x20000,4x20000,8x20000,"
                                      "4x5000,4x50000")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.session import get_spark
    from data_engineering_course_project_2023_spark.sources.writers import (
        write_jdbc,
    )

    spark = get_spark(app_name="jdbc_ab", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # references-shaped frame: (pub_id ~ 'arxiv:NNNNNNN', ref ~ 40-char
    # free text) — the dim_references column shape and row width.
    frame = (
        spark.range(args.rows)
        .select(
            F.concat(F.lit("2301."), F.lpad(F.col("id") % 99_999, 5, "0"))
            .alias("pub_id"),
            F.concat(
                F.lit("ref-"),
                F.sha2(F.col("id").cast("string"), 256).substr(1, 36),
            ).alias("reference"),
        )
        .localCheckpoint()  # freeze: the write measures the sink, not codegen
    )

    results = []
    for cell in args.grid.split(","):
        nparts, bs = (int(x) for x in cell.split("x"))
        derby = f"{args.work}_{nparts}x{bs}"
        if os.path.exists(derby):
            shutil.rmtree(derby)
        url = f"jdbc:derby:{derby};create=true"
        props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
        t0 = time.monotonic()
        write_jdbc(frame, "refs", url, mode="overwrite",
                   batchsize=bs, num_partitions=nparts, properties=props)
        dt = time.monotonic() - t0
        rps = round(args.rows / dt)
        results.append({"num_partitions": nparts, "batchsize": bs,
                        "sec": round(dt, 1), "rows_per_sec": rps})
        print(f"partitions={nparts:2d} batchsize={bs:6d} "
              f"{dt:7.1f}s {rps:8d} rows/s", flush=True)
        shutil.rmtree(derby, ignore_errors=True)

    doc = {"rows": args.rows, "cells": results}
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc))
    spark.stop()


if __name__ == "__main__":
    main()
