"""At-scale census for the reference-parity arXiv chain (VERDICT_r8 #2).

The clean→enrich→star→graph chain (SURVEY §3.1) has driver-green
oracle rows and pytest semantics coverage, but until round 9 it only
ever *executed* on a 5-row inline fixture. This census runs it
end-to-end on the generated arXiv axis (tools/gen_arxiv.py, ~2.5 M
papers with Zipf author/category skew and real mega-collaboration
papers), through the repo's own orchestration layer:

- **per-stage timing** via incremental :func:`orchestrate.run_stages`
  calls — each call builds exactly one new stage (earlier stages skip
  on their atomic _SUCCESS markers), so the deltas are honest stage
  wall-times including the parquet materialization the reference's
  Airflow DAG boundaries imply;
- **scheduler-leg timing** via :func:`orchestrate.run_scheduled` — a
  second logical run date builds the whole DAG cold under its own
  ``run=<date>`` subtree (chain end-to-end, one number), then the same
  trigger re-fires to pin the idempotent skip path;
- **cross-engine value checks**: chain invariants recomputed by DuckDB
  twins on the SAME parquet — silver survivorship (scan predicate,
  utils.py:27), malformed-GMT passthrough (databases.py:62-64),
  category dedup (utils.py:45-46), enrichment fallback survivorship
  (api.py:199-241), AUTHORED_BY edge cardinality, and the
  co-authorship pair-weight multiset (count / Σweight / max weight /
  heavy-pair count) under the mega-collab skew — the J4 self-join's
  canonical-pair semantics checked at 20 M+ pairs, not 2.

Artifacts: BENCH_ARXIV.json (stage + scheduler timings, rows, skew
witnesses) and CORRECTNESS_ARXIV.json (named check → match).

Usage:
  python -m tools.arxiv_census --data testdata/arxiv25 \
      --root /tmp/arxiv_runs --out-bench BENCH_ARXIV.json \
      --out-correct CORRECTNESS_ARXIV.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ANCHOR = "2023-01-02"  # weekly anchor, mirrors download_dataset_stage_1.py:24

TABLES = (
    "arxiv_raw", "crossref", "s2_papers", "s2_authors",
    "s2_citations", "s2_references",
)

# ---------------------------------------------------------------------------
# DuckDB twins. `hits` replays the fallback-join survivorship
# (enrich_s2_with_fallback): primary lookup by arxiv id, miss retried by
# doi, both-miss dropped; lookup keys are unique so the left joins do
# not fan out. `ab` is the distinct (paper, author) edge set AUTHORED_BY
# materializes (keyed by the surrogate id engine-side — 1:1 with the
# raw id, so cardinalities and pair weights are representation-free).
# ---------------------------------------------------------------------------
_HITS_CTE = """
WITH kept AS (
  SELECT id, doi, update_date, categories FROM arxiv_raw
  WHERE doi IS NOT NULL AND id IS NOT NULL
),
hits AS (
  SELECT k.id AS arxiv, COALESCE(p1.paperId, p2.paperId) AS pid
  FROM kept k
  LEFT JOIN s2_papers p1 ON k.id = p1.arxiv_id
  LEFT JOIN s2_papers p2 ON k.doi = p2.s2_doi
  WHERE COALESCE(p1.paperId, p2.paperId) IS NOT NULL
),
ab AS (
  SELECT DISTINCT h.pid, a.name
  FROM hits h JOIN s2_authors a ON a.paperId = h.pid
)
"""


def duckdb_checks(data: str) -> dict[str, object]:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{data}/{t}.parquet'"
        )
    out: dict[str, object] = {}
    out["silver_rows"] = con.execute(
        "SELECT count(*) FROM arxiv_raw"
        " WHERE doi IS NOT NULL AND id IS NOT NULL"
    ).fetchone()[0]
    out["malformed_dates_kept"] = con.execute(
        "SELECT count(*) FROM arxiv_raw"
        " WHERE doi IS NOT NULL AND id IS NOT NULL"
        " AND update_date NOT SIMILAR TO '[A-Za-z]{3}, .*GMT'"
    ).fetchone()[0]
    out["category_token_sum"] = con.execute(
        "SELECT sum(nd) FROM (SELECT count(DISTINCT tok) AS nd"
        " FROM (SELECT id, unnest(string_split(categories, ' ')) AS tok"
        "       FROM arxiv_raw WHERE doi IS NOT NULL AND id IS NOT NULL)"
        " GROUP BY id)"
    ).fetchone()[0]
    out["enriched_rows"] = con.execute(
        _HITS_CTE + "SELECT count(*) FROM hits"
    ).fetchone()[0]
    out["authored_by_edges"] = con.execute(
        _HITS_CTE + "SELECT count(*) FROM ab"
    ).fetchone()[0]
    cnt, s, mx, heavy = con.execute(
        _HITS_CTE
        + """, pairs AS (
  SELECT x.name AS n1, y.name AS n2, count(*) AS c
  FROM ab x JOIN ab y ON x.pid = y.pid AND x.name < y.name
  GROUP BY 1, 2
)
SELECT count(*), sum(c), max(c),
       count(*) FILTER (WHERE c >= 2) FROM pairs"""
    ).fetchone()
    out["collab_pairs"] = cnt
    out["collab_weight_sum"] = s
    out["collab_weight_max"] = mx
    out["collab_heavy_pairs"] = heavy
    # skew witnesses for SCALE.md (not compared — descriptive)
    out["_max_authors_per_paper"] = con.execute(
        "SELECT max(c) FROM (SELECT paperId, count(*) c"
        " FROM s2_authors GROUP BY 1)"
    ).fetchone()[0]
    out["_top_author_papers"] = con.execute(
        "SELECT max(c) FROM (SELECT name, count(DISTINCT paperId) c"
        " FROM s2_authors GROUP BY 1)"
    ).fetchone()[0]
    con.close()
    return out


def build_stages():
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.plans import (
        arxiv_clean,
        arxiv_enrich,
        arxiv_graph,
        arxiv_star,
    )
    from data_engineering_course_project_2023_spark.plans.orchestrate import Stage

    def silver(up):
        return arxiv_clean.clean_publications(up["arxiv_raw"])

    def enriched(up):
        return arxiv_enrich.full_enrichment(
            up["silver"], up["crossref"], up["s2_papers"],
            up["s2_authors"], up["s2_citations"], up["s2_references"],
        )

    def star_fact(up):
        return arxiv_star.build_star(up["enriched"])["publication_fact"]

    def dim_authors(up):
        return arxiv_star.build_star(up["enriched"])["dim_authors"]

    def authored_by(up):
        e = up["enriched"]
        nodes = arxiv_graph.build_nodes(e)
        return arxiv_graph.build_edges(e, nodes)["AUTHORED_BY"]

    def collab(up):
        return arxiv_graph.collaboration_graph(up["authored_by"])

    lookups = ("crossref", "s2_papers", "s2_authors",
               "s2_citations", "s2_references")
    return [
        Stage("silver", silver, inputs=("arxiv_raw",)),
        Stage("enriched", enriched, inputs=("silver",) + lookups),
        Stage("star_fact", star_fact, inputs=("enriched",)),
        Stage("dim_authors", dim_authors, inputs=("enriched",)),
        Stage("authored_by", authored_by, inputs=("enriched",)),
        Stage("collab", collab, inputs=("authored_by",)),
    ]


def dwh_load(spark, run_root: str, derby_dir: str,
             land: bool = True) -> dict:
    """VERDICT_r9 #2: land the gold layer in the serving sink AT SCALE.

    The reference exists to populate a DWH + graph DB
    (populate_DWH.py:25-51 — one INSERT loop per star table;
    databases.py:148-333 — MERGE nodes then CREATE relationships); the
    repo's frames were value-checked at 2.5 M papers in round 9 but the
    JDBC leg had only ever seen pytest fixtures. This leg pushes the
    FULL star schema (fact + 8 dims), the AUTHORED_BY edge frame, and
    its two endpoint node tables through ``writers.write_jdbc`` into
    embedded Derby (the in-container stand-in for Postgres/Neo4j — the
    same JDBC writer path, a real transactional store, durable on
    disk), then audits the LANDED tables read back over JDBC:

    - row-count parity (written == read back) per table;
    - zero-orphan referential audit on the landed data: every
      authored_by endpoint resolves in its landed node table, every
      snowflaked pid (publish_sn / references / pub_version) resolves
      in landed dim_publication, fact↔dim_publication ids 1:1, and
      every non-null author affiliation key resolves in
      dim_author_affiliation.

    Derby has no ARRAY type, so array columns are serialized
    comma-joined (the same convention the driver-facing queries use
    for array outputs — lossless for the audit keys, which are
    scalars)."""
    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.plans import (
        arxiv_graph,
        arxiv_star,
    )
    from data_engineering_course_project_2023_spark.sources.writers import (
        write_jdbc,
    )

    enriched = spark.read.parquet(os.path.join(run_root, "enriched"))
    star = arxiv_star.build_star(enriched)
    nodes = arxiv_graph.build_nodes(enriched)
    edges = arxiv_graph.build_edges(enriched, nodes)
    to_land = {
        **star,
        "graph_author": nodes["Author"],
        "graph_paper": nodes["Paper"],
        "authored_by": edges["AUTHORED_BY"],
    }
    url = f"jdbc:derby:{derby_dir};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    load_secs: dict[str, float] = {}
    written: dict[str, int] = {}
    t_all = time.monotonic()
    for name, frame in to_land.items():
        for fld in frame.schema.fields:
            if fld.dataType.simpleString().startswith("array"):
                frame = frame.withColumn(
                    fld.name, F.concat_ws(",", F.col(fld.name))
                )
        if land:
            t0 = time.monotonic()
            # 4 connections: embedded Derby serializes page latches
            # anyway; against a real warehouse this is the
            # connection-cap knob.
            write_jdbc(frame, name, url, mode="overwrite",
                       batchsize=20_000, num_partitions=4,
                       properties=props)
            load_secs[name] = round(time.monotonic() - t0, 3)
        written[name] = frame.count()
        print(f"  dwh {name}: {written[name]} rows"
              + (f" in {load_secs[name]} s" if land else " (audit-only)"),
              flush=True)
    total = round(time.monotonic() - t_all, 3)

    def rb(table: str):
        # pushDownPredicate=false: the audits are full-scan anti-joins
        # and counts; letting Spark push string-equality filters into
        # Derby trips ERROR 42818 (CLOB vs CHAR comparison — Derby maps
        # StringType columns to CLOB, and pushed literals arrive CHAR).
        return spark.read.format("jdbc").options(
            url=url, dbtable=table, pushDownPredicate="false", **props
        ).load()

    parity = {
        name: {"written": written[name], "read_back": rb(name).count()}
        for name in to_land
    }
    for name, p in parity.items():
        p["match"] = p["written"] == p["read_back"]

    ab = rb("authored_by")
    fact = rb("publication_fact")
    dpub = rb("dim_publication")
    empty_hash = F.sha2(F.lit(""), 256)
    orphans = {
        "authored_by_paper": ab.join(
            rb("graph_paper").select(F.col("id").alias("paper_id")),
            "paper_id", "left_anti").count(),
        "authored_by_author": ab.join(
            rb("graph_author").select("author_id"),
            "author_id", "left_anti").count(),
        "publish_sn_pid": rb("dim_publish_sn").join(
            dpub.select("pid"), "pid", "left_anti").count(),
        "references_pid": rb("dim_references").join(
            dpub.select("pid"), "pid", "left_anti").count(),
        "pub_version_pid": rb("dim_pub_version").join(
            dpub.select("pid"), "pid", "left_anti").count(),
        "fact_vs_dim_publication": fact.select("id").join(
            dpub.select("id"), "id", "left_anti").count(),
        "dim_publication_vs_fact": dpub.select("id").join(
            fact.select("id"), "id", "left_anti").count(),
        # null affiliation hashes to sha2('') by construction — not a
        # dim row; audit only real affiliation keys
        "authors_affiliation": rb("dim_authors")
        .filter(F.col("aff_id") != empty_hash)
        .join(rb("dim_author_affiliation").select("aff_id"),
              "aff_id", "left_anti").count(),
    }
    return {
        "dwh_load_total_sec": total,
        "dwh_load_secs": load_secs,
        "dwh_rows_landed": int(sum(written.values())),
        "dwh_count_parity": parity,
        "dwh_orphans": {k: int(v) for k, v in orphans.items()},
        "dwh_zero_orphans": all(v == 0 for v in orphans.values()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--root", default="/tmp/arxiv_census_runs")
    ap.add_argument("--out-bench", default="BENCH_ARXIV.json")
    ap.add_argument("--out-correct", default="CORRECTNESS_ARXIV.json")
    ap.add_argument("--keep-root", action="store_true")
    ap.add_argument(
        "--dwh", action="store_true",
        help="VERDICT_r9 #2: after the chain census, land fact + 8 "
        "dims + AUTHORED_BY (+ endpoint node tables) through the JDBC "
        "sink into embedded Derby and run the zero-orphan audit "
        "against the landed tables",
    )
    ap.add_argument("--derby-dir", default="/tmp/arxiv_dwh_derby")
    ap.add_argument(
        "--dwh-audit-only", action="store_true",
        help="audit an ALREADY-LANDED derby dir (rerun after an "
        "audit-phase failure without re-inserting 34M rows); written "
        "counts recomputed from the run-tree frames",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_engineering_course_project_2023_spark.plans import orchestrate
    from data_engineering_course_project_2023_spark.session import get_spark

    spark = get_spark(app_name="arxiv_census")
    spark.sparkContext.setLogLevel("ERROR")

    if not args.keep_root and os.path.exists(args.root):
        shutil.rmtree(args.root)

    sources = {
        t: spark.read.parquet(os.path.join(args.data, f"{t}.parquet"))
        for t in TABLES
    }
    n_papers = sources["arxiv_raw"].count()
    stages = build_stages()

    # ---- per-stage timing: each incremental call builds ONE new stage
    run_root = os.path.join(args.root, f"run={ANCHOR}")
    stage_secs: dict[str, float] = {}
    for i in range(1, len(stages) + 1):
        t0 = time.monotonic()
        orchestrate.run_stages(spark, stages[:i], run_root, sources)
        stage_secs[stages[i - 1].name] = round(time.monotonic() - t0, 3)
        print(f"  stage {stages[i-1].name}: {stage_secs[stages[i-1].name]} s",
              flush=True)

    # ---- scheduler leg: second due run builds cold under its own root
    now = "2023-01-17"  # two weekly runs due; first is pre-built above
    t0 = time.monotonic()
    rep = orchestrate.run_scheduled(
        spark, stages, args.root, ANCHOR, 7, now, lambda _d: sources
    )
    cold = round(time.monotonic() - t0, 3)
    assert rep[ANCHOR]["status"] == "run-skipped", rep[ANCHOR]
    t0 = time.monotonic()
    rep2 = orchestrate.run_scheduled(
        spark, stages, args.root, ANCHOR, 7, now, lambda _d: sources
    )
    skip = round(time.monotonic() - t0, 3)
    assert all(v["status"] == "run-skipped" for v in rep2.values()), rep2

    # ---- Spark-side invariants from the materialized run tree
    rd = lambda st: spark.read.parquet(os.path.join(run_root, st))  # noqa: E731
    silver = rd("silver")
    got: dict[str, object] = {}
    got["silver_rows"] = silver.count()
    got["malformed_dates_kept"] = silver.filter(
        ~F.col("update_date").rlike(r"^\d{4}-")
    ).count()
    got["category_token_sum"] = silver.select(
        F.sum(F.size(F.split("categories", " "))).alias("s")
    ).first()["s"]
    got["enriched_rows"] = rd("enriched").count()
    got["authored_by_edges"] = rd("authored_by").count()
    coll = rd("collab")
    agg = coll.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("collab_count").alias("s"),
        F.max("collab_count").alias("mx"),
        F.sum((F.col("collab_count") >= 2).cast("long")).alias("heavy"),
    ).first()
    got["collab_pairs"] = agg["cnt"]
    got["collab_weight_sum"] = agg["s"]
    got["collab_weight_max"] = agg["mx"]
    got["collab_heavy_pairs"] = agg["heavy"]

    dwh = None
    if args.dwh or args.dwh_audit_only:
        land = not args.dwh_audit_only
        print("landing gold layer in Derby (DWH leg)..." if land
              else "auditing landed Derby DWH...", flush=True)
        if land and os.path.exists(args.derby_dir):
            shutil.rmtree(args.derby_dir)
        dwh = dwh_load(spark, run_root, args.derby_dir, land=land)
        print(json.dumps({k: dwh[k] for k in
                          ("dwh_load_total_sec", "dwh_rows_landed",
                           "dwh_zero_orphans")}), flush=True)

    print("running DuckDB twins...", flush=True)
    t0 = time.monotonic()
    exp = duckdb_checks(args.data)
    duck_secs = round(time.monotonic() - t0, 3)

    correct = {}
    for k in got:
        correct[k] = {
            "spark": int(got[k]),
            "oracle": int(exp[k]),
            "match": int(got[k]) == int(exp[k]),
        }
    with open(args.out_correct, "w") as f:
        json.dump(correct, f, indent=2)

    bench = {
        "metric": "arxiv_chain_total",
        "value": round(sum(stage_secs.values()), 3),
        "unit": "sec",
        "stages": stage_secs,
        "run_scheduled_cold": cold,
        "run_scheduled_skip": skip,
        "duckdb_twin_secs": duck_secs,
        "n_papers": int(n_papers),
        "rows": {k: int(v["spark"]) for k, v in correct.items()},
        "skew": {
            "max_authors_per_paper": int(exp["_max_authors_per_paper"]),
            "top_author_papers": int(exp["_top_author_papers"]),
        },
        "data": args.data,
    }
    if dwh is not None:
        bench["dwh"] = dwh
    with open(args.out_bench, "w") as f:
        json.dump(bench, f, indent=2)
    print(json.dumps(bench))
    bad = [k for k, v in correct.items() if not v["match"]]
    if dwh is not None:
        if not dwh["dwh_zero_orphans"]:
            bad.append("dwh_orphans")
        bad.extend(
            f"dwh_parity_{n}" for n, p in dwh["dwh_count_parity"].items()
            if not p["match"]
        )
    print("MISMATCHES:" if bad else "all checks match:", bad or len(correct))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
