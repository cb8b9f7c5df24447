"""Layout pinning (round 10): pin_partitioned / pin_keyed / pin_layout.

The contract under test is PHYSICAL, not logical: a pinned frame's
checkpoint must carry its hash-partitioning (and sort order) into
consumer plans so same-key joins/aggregations skip their Exchange —
and none of that may change any result. The scale path (pin engaged,
broadcast off => per-round sort-merge joins over the pinned layout) is
forced locally with a tiny autoBroadcastJoinThreshold, which is
exactly the regime a 100 TB label table puts the loop in.
"""

from __future__ import annotations

from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.graph import connected_components
from mousedatapipeline_spark.tables import pin_keyed, pin_partitioned


@contextmanager
def _conf(spark, key, value):
    prev = spark.conf.get(key)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_pin_partitioned_claims_layout(spark):
    df = spark.range(1000).select(F.col("id").alias("v"),
                                  (F.col("id") % 7).alias("x"))
    ck = pin_partitioned(df, ["v"])
    plan = _formatted(ck)
    assert "hashpartitioning(v" in plan
    assert "v#" in plan and "ASC NULLS FIRST" in plan  # sorted claim
    # plain checkpoint loses it (the behavior pin exists to fix):
    # with an exchange in the subtree the compile is AQE-wrapped, and
    # an AdaptiveSparkPlan leaf reports UnknownPartitioning at
    # checkpoint time even though the data IS hash-distributed
    plain = df.repartition(4, "v").localCheckpoint(eager=True)
    assert "UnknownPartitioning" in _formatted(plain)


def test_pinned_side_joins_without_exchange(spark):
    df = spark.range(5000).select(F.col("id").alias("v"),
                                  (F.col("id") % 3).alias("x"))
    other = spark.range(2000).select(F.col("id").alias("v"),
                                     F.lit(1).alias("y"))
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        pinned = pin_partitioned(df, ["v"])
        plan = _formatted(pinned.join(other, "v"))
    # exactly ONE exchange: the unpinned side. The pinned side must
    # contribute neither an Exchange nor a Sort (tree markers — the
    # detail list would also match ") Sort" inside "SortMergeJoin").
    assert plan.count("- Exchange") == 1, plan
    assert plan.count("- Sort (") == 1, plan


def test_pin_keyed_gate(spark):
    df = spark.range(200).select(F.col("id").alias("v"))
    # tiny table under the default threshold: identity (plain ckpt,
    # no re-pin => no hashpartitioning-by-key claim)
    small = pin_keyed(df, ["v"])
    assert "hashpartitioning(v" not in _formatted(small)
    # force the scale regime: threshold below the table size => pinned
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "1"):
        big = pin_keyed(df, ["v"])
    assert "hashpartitioning(v" in _formatted(big)
    # threshold -1 (auto-broadcast disabled) must also pin: there is
    # no broadcast regime to be identity for
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        off = pin_keyed(df, ["v"])
    assert "hashpartitioning(v" in _formatted(off)


def test_pin_keyed_rows_identical(spark):
    df = spark.range(300).select((F.col("id") % 41).alias("v"),
                                 F.col("id").alias("x"))
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "1"):
        pinned = pin_keyed(df, ["v"])
    assert sorted(map(tuple, pinned.collect())) == \
        sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("edges,expect", [
    ([(i, i + 1) for i in range(1, 8)], {i: 1 for i in range(1, 9)}),
    ([(2, 1), (2, 3), (7, 8)],
     {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 4: 4, 5: 5, 6: 6}),
])
def test_cc_identical_under_forced_pin(spark, edges, expect):
    """connected_components under the forced-scale regime (pin engaged,
    broadcast off, SMJ rounds over the pinned layout) must equal the
    local regime's answer."""
    nodes = sorted(expect)
    ndf = spark.createDataFrame([(n,) for n in nodes], ["id"])
    edf = spark.createDataFrame(edges, "a: bigint, b: bigint")

    local = {r.id: r.component_id
             for r in connected_components(ndf, edf, "id", "a", "b")
             .collect()}
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "1"):
        forced = {r.id: r.component_id
                  for r in connected_components(ndf, edf, "id", "a", "b")
                  .collect()}
    assert local == expect
    assert forced == expect
