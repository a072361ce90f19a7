from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_course_project_2023_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
# Overridable so the parity suite can sweep a bigger SF than the
# driver's gate (e.g. SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1
# python -m pytest tests/test_oracle_parity.py) — catches tie-break /
# scale-dependent nondeterminism the small SF can't expose.
SF_CORRECT = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()
