"""Partition-count invariance: the engine claims its float aggregates
are partition-independent (decimal accumulation / fixed-order row-local
folds / stable_round), i.e. results are bit-identical under AQE
re-planning at any scale. Run representative float-heavy queries under
two very different shuffle-partition settings and require EXACT
equality — any drift here would also break the driver's value hash
nondeterministically.
"""

from __future__ import annotations

import math
import os

import pytest

from mousedatapipeline_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")

# Float-aggregating queries across the operator families: stacked stats,
# corpus dashboard means, decimal revenue sums, centroid distances,
# sketch estimate, surprisal means.
_QUERIES = ["m01_stacked_summary", "t13_source_dashboard",
            "q17_rollup_revenue", "s20_centroid_outliers",
            "k02_hll_distinct", "t14_unigram_surprisal",
            # round-3 float surfaces: substring-removal reconstruction,
            # DSIR log-ratio means, PQ distance folds, HLL set algebra
            "t26_substring_removal", "t28_dsir_importance",
            "s36_product_quantization", "k03_hll_set_ops"]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # folds -0.0
    return v


def _run(spark, name, n_parts):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        df = catalog.all_queries()[name].spark(spark, SF_DIR)
        rows = sorted(tuple(_norm(c) for c in r) for r in df.collect())
        return rows
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", _QUERIES)
def test_result_is_partition_count_invariant(spark, name):
    a = _run(spark, name, 2)
    b = _run(spark, name, 17)
    assert a == b, f"{name}: results differ between 2 and 17 partitions"
