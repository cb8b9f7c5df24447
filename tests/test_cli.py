"""The CLI face: canonical programs, explicit step lists, both sinks."""

from __future__ import annotations

import os

import pytest

from mousedatapipeline_spark.__main__ import PROGRAMS, run

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")


@_needs_data
def test_full_program_writes_parquet(spark, tmp_path):
    out = str(tmp_path / "stacked")
    df = run(["--sf-dir", SF_DIR, "--program", "full",
              "--output", out], spark=spark)
    back = spark.read.parquet(out)
    assert back.count() == df.count() > 0
    assert "t_mean" in back.columns  # stacked stats present


@_needs_data
def test_explicit_steps_match_nostack_program(spark):
    df_steps = run(["--sf-dir", SF_DIR, "--steps",
                    *PROGRAMS["nostack"]], spark=spark)
    df_prog = run(["--sf-dir", SF_DIR, "--program", "nostack"],
                  spark=spark)
    assert sorted(df_steps.columns) == sorted(df_prog.columns)
    assert df_steps.count() == df_prog.count()
    # nostack keeps per-repetition rows (no stacker)
    assert "repetition" in df_steps.columns


@_needs_data
def test_csv_sink(spark, tmp_path):
    out = str(tmp_path / "table")
    run(["--sf-dir", SF_DIR, "--program", "full",
         "--output", out, "--format", "csv"], spark=spark)
    back = (spark.read.option("header", True).csv(out))
    assert back.count() > 0
