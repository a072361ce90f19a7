"""Every registered query must match its DuckDB oracle exactly
(the local twin of the driver's t2 gate). Runs at sf0.01 — the same
scale the driver uses."""

from __future__ import annotations

import pytest

from data_engineering_course_project_2023_spark.plans import registry

from .conftest import SF_CORRECT
from .parity import compare


# Oracles whose SQL embeds constants TRAINED on the sf0.01 fixture
# (IVF centroids / PQ codebooks — data-dependent by nature; see
# plans/pq_fixture.py, plans/ivf_fixture.py). They are exact at the
# driver's gate SF and meaningless at any other; the SF-sweep skips
# them loudly instead of failing on a known-pinned artifact.
_SF001_PINNED = {"ivf_topk", "pq_codes", "pq_topk", "ivfpq_topk"}


@pytest.mark.parametrize(
    "name",
    [n for n, q in registry.REGISTRY.items() if q.oracle is not None],
)
def test_query_matches_oracle(spark, name):
    if name in _SF001_PINNED and not SF_CORRECT.rstrip("/").endswith("sf0.01"):
        pytest.skip(f"{name}: oracle codebook pinned to the sf0.01 fixture")
    q = registry.REGISTRY[name]
    df = registry.run_query(name, spark, SF_CORRECT)
    problems = compare(df, q.oracle, SF_CORRECT)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.queries()) >= set(e.oracle_sql())


def test_no_registry_query_emits_complex_typed_columns(spark):
    """Permanent guard for the r2 driver-err class: the driver's pandas
    canonicalizer (sorted-column sort_values + row hash) cannot hash
    array/map/struct cells, so EVERY registry output — oracled or
    rows-only — must be primitive-typed. Flatten to csv strings or
    exploded rows instead (embedding_quantize / vocab_encode precedent).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    offenders = {}
    for name in registry.REGISTRY:
        df = registry.run_query(name, spark, "/root/testdata/sf0.001")
        bad = [
            f"{f.name}: {f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders
