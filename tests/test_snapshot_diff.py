"""snapshot_diff semantics: action classification, unchanged-row
elision, NULL-safe value compare, composite keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.joins import snapshot_diff


def test_actions_and_unchanged_elision(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    new = spark.createDataFrame(
        [(2, 21.0), (3, 30.0), (4, 40.0)], ["k", "v"])
    got = {r.k: (r.action, r.old_v, r.new_v)
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: ("delete", 10.0, None),
                   2: ("update", 20.0, 21.0),
                   4: ("insert", None, 40.0)}  # 3 unchanged -> dropped


def test_null_safe_value_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None), (3, 5.0)],
                                "k: bigint, v: double")
    new = spark.createDataFrame([(1, None), (2, 2.0), (3, None)],
                                "k: bigint, v: double")
    got = {r.k: r.action
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL is "unchanged" under eqNullSafe; NULL vs value is update
    assert got == {2: "update", 3: "update"}


def test_composite_keys(spark):
    old = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")],
                                ["g", "i", "v"])
    new = spark.createDataFrame([("a", 1, "x"), ("b", 1, "z")],
                                ["g", "i", "v"])
    out = snapshot_diff(old, new, ["g", "i"], ["v"]) \
        .orderBy("g", "i").collect()
    assert [(r.g, r.i, r.action) for r in out] == \
        [("a", 2, "delete"), ("b", 1, "insert")]


def test_column_pruning_reaches_scan(spark, tmp_path):
    """Only keys + compare columns may be read from the source."""
    p = str(tmp_path / "snap")
    spark.range(10).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v"),
        F.lit("wide-unused-payload").alias("payload")).write.parquet(p)
    df = spark.read.parquet(p)
    plan = snapshot_diff(df, df, ["k"], ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("payload" not in ln for ln in reads)


def test_incremental_agg_merge_matches_direct_and_retires_groups(spark):
    from mousedatapipeline_spark.operators.aggregates import (
        incremental_agg_merge,
    )
    # groups: g1 updated, g2 fully deleted (retired), g3 unchanged,
    # g4 newly inserted
    old = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 5.0), (3, "g2", 7.0), (4, "g3", 1.0)],
        ["k", "g", "v"])
    new = spark.createDataFrame(
        [(1, "g1", 12.5), (2, "g1", 5.0), (4, "g3", 1.0), (5, "g4", 9.0)],
        ["k", "g", "v"])
    got = {r.g: (r.n_rows, float(r.sum_value))
           for r in incremental_agg_merge(old, new, "k", "g", "v")
           .collect()}
    direct = {r.g: (r.n, float(r.s)) for r in
              new.groupBy("g").agg(
                  F.count("*").alias("n"),
                  F.sum(F.col("v").cast("decimal(30,10)")).alias("s"))
              .collect()}
    assert got == direct
    assert "g2" not in got  # count reached zero -> retired


def test_incremental_agg_merge_handles_group_migration(spark):
    """A row whose group key changes must retract from the old group
    and insert into the new one (caught by the property test)."""
    from mousedatapipeline_spark.operators.aggregates import (
        incremental_agg_merge,
    )
    old = spark.createDataFrame([(1, "a", 10.0), (2, "a", 3.0)],
                                ["k", "g", "v"])
    new = spark.createDataFrame([(1, "b", 10.0), (2, "a", 3.0)],
                                ["k", "g", "v"])
    got = {r.g: (r.n_rows, float(r.sum_value))
           for r in incremental_agg_merge(old, new, "k", "g", "v")
           .collect()}
    assert got == {"a": (1, 3.0), "b": (1, 10.0)}
