"""PySpark-native analytics engine with the query and data-processing
capabilities of ``injardav/data_engineering_course_project_2023``.

The reference is a batch ETL + analytics pipeline (arXiv publications →
clean → enrich → star-schema DWH + property graph + log analytics); see
SURVEY.md. This package re-expresses every capability Spark-first:

- ``session``    — SparkSession factory tuned for both local[32] tests and
                   large-cluster deployment (AQE, adaptive shuffle, Arrow).
- ``schemas``    — explicit StructTypes per layer (no inference in prod).
- ``sources``    — scan/sink operators (SURVEY §2.1 S1–S13).
- ``operators``  — projections/filters (P1–P14), joins (J1–J9), nested
                   ops (N1–N6), plus extension ops: dedup, similarity,
                   text analysis, multimodal plumbing.
- ``plans``      — end-to-end pipelines: silver cleaning, enrichment,
                   gold star schema, graph build, analytics (A1–A9).
- ``functions``  — reusable Column expressions shared across plans.
- ``streaming``  — Structured Streaming log analytics (S13) with a batch
                   twin so correctness is oracle-checkable.
"""

__version__ = "0.1.0"
