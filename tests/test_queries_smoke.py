"""Smoke: every catalog query runs at sf0.001 and returns a stable
schema. The full DuckDB-oracle value comparison lives in
tools/check_correctness.py (and the driver's gate at sf0.01)."""

from __future__ import annotations

import os

import pytest

from mousedatapipeline_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")


@_needs_data
@pytest.mark.parametrize("name", sorted(catalog.all_queries()))
def test_query_runs_and_has_rows(spark, name):
    spec = catalog.all_queries()[name]
    df = spec.spark(spark, SF_DIR)
    assert df.columns, "query must project at least one column"
    assert df.count() >= 0
