"""Property-based tests (hypothesis): the guard/sentinel semantics and
cross-engine determinism hold over the whole input domain, not just
hand-picked cases. Spark expressions are exercised through a single
cached session; each property batches its examples into ONE DataFrame
so hypothesis's many examples cost one Spark job."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mousedatapipeline_spark.functions import physics
from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)

finite = st.floats(allow_nan=False, allow_infinity=False,
                   min_value=-1e12, max_value=1e12)
small = st.floats(allow_nan=False, allow_infinity=False,
                  min_value=-1e6, max_value=1e6)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(finite, min_size=1, max_size=30))
def test_stable_round_cross_engine(spark, xs):
    rows = spark.createDataFrame([(x,) for x in xs], "v double").select(
        stable_round(F.col("v")).alias("r")).collect()
    con = duckdb.connect()
    sql = stable_round_sql("?::DOUBLE")
    n_params = sql.count("?")
    for x, row in zip(xs, rows):
        d = con.execute(f"SELECT {sql}", [x] * n_params).fetchone()[0]
        s = row["r"]
        assert s == d or (math.isnan(s) and math.isnan(d)), (x, s, d)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(small, small), min_size=1, max_size=30))
def test_thickness_guard_domain(spark, pairs):
    """P8: invalid inputs give EXACTLY the -1.0 sentinel; valid inputs
    give the closed form t = -sign(a)·ln(1-|a|)/mu — including the
    reference's own overflow behavior (subnormal mu -> +inf passes the
    mu > 0 guard there too; defensive PARITY, not extra safety)
    (src/processstep_thickness_from_absorption.py:36-52)."""
    df = spark.createDataFrame(pairs, "a double, mu double")
    rows = df.select(
        "a", "mu",
        physics.thickness_from_absorption(F.col("a"), F.col("mu"))
        .alias("t")).collect()
    for r in rows:
        t, a, mu = r["t"], r["a"], r["mu"]
        valid = mu > 0 and 0 < abs(a) <= 1
        if not valid:
            assert t == -1.0, (a, mu, t)
        else:
            expect = -math.copysign(1.0, a) * math.log(1.0 - abs(a)) / mu
            if math.isfinite(expect):
                assert t == pytest.approx(expect, rel=1e-9), (a, mu, t)
            else:
                assert t == expect, (a, mu, t)  # inf parity


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(small, st.one_of(st.none(), small)),
                min_size=1, max_size=30))
def test_apply_tcf_gate(spark, pairs):
    """P13: transmission changes iff tcf > 1; NULL tcf is a no-op."""
    df = spark.createDataFrame(pairs, "t double, tcf double")
    rows = df.select(
        "t", "tcf",
        physics.apply_tcf(F.col("t"), F.col("tcf")).alias("out")).collect()
    for r in rows:
        if r["tcf"] is not None and r["tcf"] > 1:
            assert r["out"] == pytest.approx(r["t"] * r["tcf"])
        else:
            assert r["out"] == r["t"]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False), min_size=2, max_size=50))
def test_stack_stats_matches_numpy_property(spark, vals):
    import numpy as np

    from mousedatapipeline_spark.operators.aggregates import stack_stats

    df = spark.createDataFrame([("k", v) for v in vals], "k string, v double")
    row = stack_stats(df, ["k"], "v").collect()[0]
    assert row["count"] == len(vals)
    assert row["mean"] == pytest.approx(float(np.mean(vals)), rel=1e-9,
                                        abs=1e-9)
    expected_std = float(np.std(vals, ddof=1))
    assert row["std"] == pytest.approx(expected_std, rel=1e-6, abs=1e-6)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=10), min_size=1,
                max_size=40),
       st.integers(min_value=1, max_value=5))
def test_sessionize_session_count_invariant(spark, gaps, gap_limit):
    """Session count == 1 + number of gaps exceeding the limit,
    regardless of partitioning."""
    from datetime import datetime, timedelta

    from mousedatapipeline_spark.operators.windows import sessionize

    ts, times = datetime(2024, 1, 1), []
    for g in gaps:
        ts += timedelta(seconds=g)
        times.append(ts)
    df = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(times)],
        "user_id int, ts timestamp, eid int").repartition(3)
    out = sessionize(df, "user_id", "ts", gap_seconds=gap_limit,
                     tiebreak="eid")
    n_sessions = out.groupBy("user_id").agg(
        F.max("session_seq").alias("n")).collect()[0]["n"]
    expected = 1 + sum(1 for g in gaps[1:] if g > gap_limit)
    assert n_sessions == expected


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 24), st.integers(0, 24)),
                min_size=0, max_size=40))
def test_connected_components_matches_union_find(spark, edges):
    """Distributed CC == a driver-side union-find on the same graph."""
    from mousedatapipeline_spark.operators.graph import (
        connected_components,
    )
    nodes = list(range(25))
    parent = list(nodes)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(n) for n in nodes}

    ndf = spark.createDataFrame([(n,) for n in nodes], "id: bigint")
    edf = spark.createDataFrame(edges or [(0, 0)], "a: bigint, b: bigint")
    if not edges:
        edf = edf.filter(F.lit(False))
    got = {r.id: r.component_id
           for r in connected_components(ndf, edf, "id", "a", "b")
           .collect()}
    assert got == expect


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 4),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=0, max_size=40, unique_by=lambda t: t[0]),
       st.lists(st.tuples(st.integers(0, 30), st.integers(0, 4),
                          st.floats(-100, 100, allow_nan=False)),
                min_size=0, max_size=40, unique_by=lambda t: t[0]))
def test_incremental_agg_merge_equals_direct(spark, old_rows, new_rows):
    """old_agg (+) cdc_delta == direct aggregation of the new snapshot,
    for arbitrary keyed snapshots (incl. empty ones)."""
    from mousedatapipeline_spark.operators.aggregates import (
        incremental_agg_merge,
    )
    schema = "k: bigint, g: bigint, v: double"
    old = spark.createDataFrame(old_rows or [(0, 0, 0.0)], schema)
    new = spark.createDataFrame(new_rows or [(0, 0, 0.0)], schema)
    if not old_rows:
        old = old.filter(F.lit(False))
    if not new_rows:
        new = new.filter(F.lit(False))
    got = {r.g: (r.n_rows, float(r.sum_value)) for r in
           incremental_agg_merge(old, new, "k", "g", "v").collect()}
    direct = {r.g: (r.n, float(r.s)) for r in
              new.groupBy("g").agg(
                  F.count("*").alias("n"),
                  F.sum(F.col("v").cast("decimal(30,10)")).alias("s"))
              .collect()}
    assert got == direct


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=-10**12, max_value=10**12),
                min_size=1, max_size=120),
       st.lists(st.floats(min_value=0.01, max_value=1.0,
                          allow_nan=False), min_size=1, max_size=4),
       st.sampled_from([2, 7, 64]))
def test_bucketed_exact_quantiles_property(spark, vals, qs, n_buckets):
    """For any int multiset, any quantile set, any bucket granularity:
    the bucketed two-pass must equal nearest-rank selection on the
    sorted list (ties, negatives, huge spans, n < n_buckets included).
    """
    from mousedatapipeline_spark.operators.aggregates import (
        bucketed_exact_quantiles,
    )
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    pairs = [(q, f"p{i}") for i, q in enumerate(qs)]
    row = bucketed_exact_quantiles(df, "v", pairs,
                                   n_buckets=n_buckets).collect()[0]
    s = sorted(vals)
    assert row["n"] == len(vals)
    for q, a in pairs:
        expect = s[max(min(math.ceil(q * len(s)), len(s)), 1) - 1]
        assert row[a] == expect, (q, n_buckets, row[a], expect)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=0, max_size=24), min_size=1, max_size=6))
def test_hashed_shingle_docs_equals_string_path_property(spark, texts):
    """For arbitrary printable-ascii docs, the hash-at-position scan
    equals hashing the distinct string shingle set (up to hash
    collisions, which array_distinct on hashes and on strings see
    identically iff the hash is injective on the doc's shingles —
    asserted here as set equality of the hash MULTISETS, the exact
    quantity every consumer uses)."""
    from mousedatapipeline_spark.operators import similarity as S

    df = spark.createDataFrame(
        [(i, "en", t) for i, t in enumerate(texts)],
        "doc_id long, lang string, text string")
    got = {r["doc_id"]: sorted(r["hs"])
           for r in S.hashed_shingle_docs(df).collect()}
    want = {}
    for r in (df.filter(F.length("text") >= 3)
              .select("doc_id",
                      S.shingle_set_col(F.col("text")).alias("ss"))
              .select("doc_id",
                      F.array_distinct(
                          F.transform("ss", S.shingle_hash)).alias("hs"))
              .collect()):
        want[r["doc_id"]] = sorted(r["hs"])
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0,
                            max_value=9_223_372_036_854_775_807),
                min_size=1, max_size=8))
def test_e22_weights_col_equals_scalar_property(spark, ids):
    """The staged bootstrap-weight array equals the per-replica scalar
    form for arbitrary non-negative event ids, including ids that
    would wrap the naive (unreduced) hash."""
    from mousedatapipeline_spark.plans.events_queries import (
        _E22_B, _e22_weight, _e22_weights_col)

    df = spark.createDataFrame([(i,) for i in set(ids)],
                               "event_id: bigint")
    arr = {r["event_id"]: r["wts"] for r in
           df.select("event_id",
                     _e22_weights_col().alias("wts")).collect()}
    scalar = {r["event_id"]: r["wts"] for r in
              df.select("event_id", F.array(
                  *[_e22_weight(k) for k in range(_E22_B)])
                  .alias("wts")).collect()}
    assert arr == scalar


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=1, max_value=60_000)),
                min_size=1, max_size=24),
       st.lists(st.integers(min_value=0, max_value=23),
                min_size=0, max_size=3))
def test_w15_carry_forward_pack_equals_single_shot(
        spark, tmp_path_factory, sizes, raw_cuts):
    """The streaming carry-forward merge over ANY split of a manifest
    into ordered batches equals the single-shot c05 pack: same bins,
    same per-bin aggregates (greedy running-sum packing is
    prefix-decomposable). Random manifests include files larger than
    the 16384-byte target (bin-skipping) and random batch boundaries
    (including empty batches via duplicate cuts)."""
    from pathlib import Path

    from mousedatapipeline_spark.plans.curation_queries import _C05_TARGET
    from mousedatapipeline_spark.plans.streaming_queries import (
        _W15_BIN_SCHEMA,
        _w15_compaction_merge,
    )

    manifest = [(src, i + 1, sz)
                for i, (src, sz) in enumerate(sizes)]
    cuts = sorted({min(c, len(manifest)) for c in raw_cuts})
    bounds = [0] + cuts + [len(manifest)]
    state = Path(tmp_path_factory.mktemp("w15prop"))
    (state / "closed").mkdir()
    (state / "open").mkdir()
    schema = "source string, file_id long, sz long"
    for bi, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        chunk = manifest[lo:hi] or None
        b = (spark.createDataFrame(chunk, schema) if chunk
             else spark.createDataFrame([], schema))
        _w15_compaction_merge(b, bi, state)
    closed = spark.read.schema(_W15_BIN_SCHEMA).parquet(
        *[str(p) for p in sorted((state / "closed").glob("v*"))])
    open_df = spark.read.parquet(
        str(sorted((state / "open").glob("v*"))[-1])).select(
        "source", "bin", "n", "tot", "mn", "mx")
    got = {(r.source, r.bin): (r.n, r.tot, r.mn, r.mx)
           for r in closed.unionByName(open_df).collect()}

    expect, cum = {}, {}
    for src, fid, sz in sorted(manifest):
        c = cum.get(src, 0)
        b = c // _C05_TARGET
        n, tot, mn, mx = expect.get((src, b), (0, 0, fid, fid))
        expect[(src, b)] = (n + 1, tot + sz, min(mn, fid), max(mx, fid))
        cum[src] = c + sz
    assert got == expect
