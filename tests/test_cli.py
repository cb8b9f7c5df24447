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


def test_cli_ymd_batch_selection(spark):
    """--ymd/--batch restrict the manifest like the reference CLI
    (directory_processor.py:154-156)."""
    from mousedatapipeline_spark.__main__ import run
    from mousedatapipeline_spark.plans.mouse_queries import pipeline_inputs
    m, _ = pipeline_inputs(spark, "/root/testdata/sf0.001")
    key = m.select("ymd", "batch").first()
    out = run(["--sf-dir", "/root/testdata/sf0.001", "--program", "nostack",
               "--ymd", str(key.ymd), "--batch", str(key.batch)],
              spark=spark)
    rows = out.collect()
    assert rows and all(
        r.ymd == key.ymd and r.batch == key.batch for r in rows)


def test_cli_batch_range_selection(spark):
    """--min-batch/--max-batch cover the multibatch driver scripts'
    range iteration as ONE plan."""
    from mousedatapipeline_spark.__main__ import run
    out = run(["--sf-dir", "/root/testdata/sf0.001", "--program",
               "nostack", "--min-batch", "200", "--max-batch", "205"],
              spark=spark)
    batches = {r.batch for r in out.collect()}
    assert batches and all(200 <= b <= 205 for b in batches)


@_needs_data
def test_cli_query_escape_hatch(spark, tmp_path):
    out = str(tmp_path / "q01")
    df = run(["--sf-dir", SF_DIR, "--query", "q01_pricing_summary",
              "--output", out], spark=spark)
    back = spark.read.parquet(out)
    assert back.count() == df.count() > 0
    assert "sum_qty" in back.columns


def test_cli_query_list_needs_no_session(capsys):
    assert run(["--query", "list"]) is None
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) >= 100
    assert any(line.startswith("q01_pricing_summary\t") for line in lines)


def test_cli_unknown_query_errors():
    with pytest.raises(SystemExit):
        run(["--query", "no_such_query"])
