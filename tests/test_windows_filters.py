"""Window propagation, top-1 gates, sessionization, and validation
filters."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.filters import (
    completeness_check,
    split_valid,
    valid_pixels,
)
from mousedatapipeline_spark.operators.windows import (
    lowest_repetition_gate,
    propagate_group_max,
    sessionize,
    top1_per_group,
)


def test_propagate_group_max(spark):
    df = spark.createDataFrame(
        [("b1", 1.0), ("b1", 3.0), ("b2", 2.0)], "batch string, tcf double")
    out = propagate_group_max(df, ["batch"], {"tcf": "largest"}).collect()
    got = {(r["batch"], r["tcf"]): r["largest"] for r in out}
    assert got[("b1", 1.0)] == 3.0 and got[("b1", 3.0)] == 3.0
    assert got[("b2", 2.0)] == 2.0


def test_lowest_repetition_gate(spark):
    df = spark.createDataFrame(
        [("b", 2), ("b", 1), ("c", 5)], "batch string, repetition int")
    rows = {(r["batch"], r["repetition"])
            for r in lowest_repetition_gate(df, ["batch"]).collect()}
    assert rows == {("b", 1), ("c", 5)}


def test_top1_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 1, "b")], "k string, score int, id string")
    row = top1_per_group(
        df, ["k"], [F.col("score").desc(), F.col("id").asc()]).collect()[0]
    assert row["id"] == "a"


def test_sessionize_gap_splits(spark):
    t = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    big = lambda m: datetime(2024, 1, 1, m, 0, 0)  # noqa: E731
    df = spark.createDataFrame(
        [(1, t(0), "a"), (1, t(10), "b"), (1, big(2), "c"), (2, t(0), "d")],
        "user_id int, ts timestamp, eid string")
    out = {r["eid"]: r["session_seq"]
           for r in sessionize(df, "user_id", "ts", 1800, "eid").collect()}
    assert out["a"] == 1 and out["b"] == 1   # 10 s gap: same session
    assert out["c"] == 2                     # 2 h gap: new session
    assert out["d"] == 1                     # separate user restarts at 1


def test_completeness_check_missing_list(spark):
    df = spark.createDataFrame([("d1", 2, 1), ("d2", 1, 1)],
                               "dir string, n_master int, n_craw int")
    out = {r["dir"]: r for r in completeness_check(
        df, {"n_master": 2, "n_craw": 1}).collect()}
    assert out["d1"]["is_complete"] is True and out["d1"]["missing"] == []
    assert out["d2"]["is_complete"] is False
    assert out["d2"]["missing"] == ["n_master!=2"]


def test_split_valid_quarantine(spark):
    df = spark.createDataFrame([(1, 5.0), (2, None)], "id int, flux double")
    ok, bad = split_valid(df, F.col("flux").isNotNull(),
                          reason=F.lit("missing flux"))
    assert [r["id"] for r in ok.collect()] == [1]
    rej = bad.collect()
    assert [r["id"] for r in rej] == [2]
    assert rej[0]["reject_reason"] == "missing flux"


def test_valid_pixels_zeroes_out_of_range(spark):
    df = spark.createDataFrame([([1.0, -5.0, 3.0e7, 100.0],)],
                               "px array<double>")
    row = df.select(valid_pixels(F.col("px")).alias("v")).collect()[0]
    assert row["v"] == [1.0, 0.0, 0.0, 100.0]


def test_json_schema_on_read_permissive_nulls(spark):
    """Malformed / missing-key JSON degrades to NULL (counted, never
    fatal) — the e05 parse contract."""
    df = spark.createDataFrame(
        [('{"k": 5}',), ('{"k": "not-a-number"}',), ("not json",),
         ('{"other": 1}',), (None,)], ["props"])
    out = df.select(
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k")
    ).collect()
    assert [r.k for r in out] == [5, None, None, None, None]
