"""Catalog / driver-contract integrity and cross-engine rounding."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from mousedatapipeline_spark.plans import catalog


def test_every_query_has_matching_oracle_or_none():
    qs = catalog.all_queries()
    assert len(qs) >= 29
    for name, spec in qs.items():
        assert spec.name == name
        assert callable(spec.spark)
        assert spec.oracle is None or "SELECT" in spec.oracle.upper()


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert "q01_pricing_summary" in qs


@pytest.mark.parametrize("x", [
    1.0341375, -1.0341375, 0.0000005, 123456.9999995, 0.1 + 0.2, 2.5e-7,
    1e15 / 7, -0.3333333333,
])
def test_stable_round_agrees_with_duckdb(spark, x):
    s = spark.range(1).select(
        stable_round(F.lit(x)).alias("v")).collect()[0]["v"]
    d = duckdb.sql(f"SELECT {stable_round_sql(repr(x))} AS v").fetchone()[0]
    assert s == d or (math.isnan(s) and math.isnan(d))


def test_stable_round_is_close_to_true_round(spark):
    vals = [0.123456789, 7.5, -3.00000049, 42.0]
    for x in vals:
        got = spark.range(1).select(
            stable_round(F.lit(x)).alias("v")).collect()[0]["v"]
        assert abs(got - round(x, 6)) <= 1.1e-6


def test_registration_order_is_verification_policy():
    """The catalog prefix is evidence policy: every query WITHOUT a
    green driver row must register before every proven one (the driver
    samples a ~50-query prefix per round), with rows-only checks last
    within the unproven block."""
    from mousedatapipeline_spark.plans.catalog import (
        _PROVEN,
        all_queries,
    )
    qs = all_queries()
    names = list(qs)
    first_proven = next(i for i, n in enumerate(names) if n in _PROVEN)
    # no unproven query after the first proven one
    for n in names[first_proven:]:
        assert n in _PROVEN, (
            f"unproven query {n!r} ranked after proven block")
    # rows-only checks yield the prefix to hash-gated ones: within the
    # unproven block no oracled query may rank after a rows-only one
    unproven = names[:first_proven]
    seen_rows_only = False
    for n in unproven:
        if qs[n].oracle is None:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracled {n!r} ranked after a rows-only query")
    # every _PROVEN name actually exists (typo guard for the rotation)
    assert _PROVEN <= set(names)


def test_proven_query_never_composes_unproven_one():
    """Staleness must propagate through composition: if query X's plan
    function is called by query Y, an edit that stales X stales Y's
    results too, so Y may not stay in _PROVEN while X is out (the r06
    review caught exactly this: s27 composes s02, whose shingle hash
    changed, but only s02 was staled).  Edges are detected as direct
    ``<registered_name>(`` call sites in the composer's source — shared
    non-query helpers (e.g. lsh_verified_edges) can't be tracked
    statically and still need the grep-for-callers discipline."""
    import inspect
    import re

    from mousedatapipeline_spark.plans.catalog import _PROVEN, all_queries

    qs = all_queries()
    calls: dict[str, set[str]] = {}
    for name, spec in qs.items():
        src = inspect.getsource(spec.spark)
        calls[name] = {other for other in qs
                       if other != name
                       and re.search(rf"\b{other}\s*\(", src)}
    # transitive closure
    changed = True
    while changed:
        changed = False
        for name, callees in calls.items():
            extra = set().union(*(calls[c] for c in callees)) - callees
            if extra:
                callees |= extra
                changed = True
    composed = {n: c for n, c in calls.items() if c}
    assert composed, "expected at least one composing query (s14->s02)"
    for name, callees in composed.items():
        if name in _PROVEN:
            # Rows-only queries (oracle=None: u01, m15) can never be
            # driver-proven BY DESIGN — their oracled contract twins
            # (u02, m18) are the proof mechanism, so a twin composing
            # its rows-only subject is the intended shape, not a leak.
            leaked = {c for c in callees
                      if c not in _PROVEN and qs[c].oracle is not None}
            assert not leaked, (
                f"{name!r} is driver-proven but composes unproven "
                f"{sorted(leaked)} — stale the composer too "
                f"(plans/catalog.py _STALE_PROOF)")
