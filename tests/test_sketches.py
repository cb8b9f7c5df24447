"""Count-min / HLL sketch operators: deterministic-hash golden values,
the CMS over-estimate guarantee, HLL accuracy bounds, and plan shapes
(broadcast probe, no cartesian)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mousedatapipeline_spark.operators import sketches as K
from mousedatapipeline_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")


def _py_string_hash(s: str) -> int:
    acc = 7
    for ch in s:
        acc = (acc * 131 + ord(ch)) % K.MOD
    return acc


def test_string_hash_matches_reference_fold(spark):
    words = ["hello", "", "a", "x", "the quick brown fox", "ÿ"]
    df = spark.createDataFrame([(w,) for w in words], ["s"])
    got = {r["s"]: r["h"]
           for r in df.select("s", K.string_hash(F.col("s")).alias("h"))
                      .collect()}
    for w in words:
        if all(ord(c) < 128 for c in w):
            assert got[w] == _py_string_hash(w), w
    assert got[""] == 7  # seed passthrough, NOT sequence(1,0) descent


def test_rho_trailing_zero_rank(spark):
    cases = [(0, 26), (1, 1), (2, 2), (3, 1), (4, 3), (6, 2), (8, 4),
             (12, 3), (1 << 24, 25), ((1 << 24) + (1 << 5), 6)]
    df = spark.createDataFrame([(v,) for v, _ in cases], ["v"])
    got = {r["v"]: r["rho"]
           for r in df.select("v", K.rho(F.col("v").cast("bigint"))
                              .alias("rho")).collect()}
    for v, want in cases:
        assert got[v] == want, (v, got[v], want)


def test_cms_estimate_never_underestimates(spark):
    import random
    rng = random.Random(7)
    rows = [(f"t{i % 40}",) for i in range(2000)] + \
           [(f"rare{rng.randrange(500)}",) for _ in range(500)]
    df = spark.createDataFrame(rows, ["term"])
    cnt = df.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    hashed = cnt.select("term", "c", K.string_hash(F.col("term")).alias("th"))
    grid = K.cms_build(hashed, "th", "c")
    # grid never exceeds d*w cells and total mass is d * stream length
    g = grid.collect()
    assert len(g) <= K.CMS_D * K.CMS_W
    assert sum(r["cnt"] for r in g) == K.CMS_D * 2500
    est = K.cms_estimate(hashed.select("term", "c", "th"), grid, "th",
                         ["term", "c"]).collect()
    assert len(est) == hashed.count()
    for r in est:
        assert r["cms_est"] >= r["c"], r  # the CMS guarantee


def test_hll_estimate_within_tolerance(spark):
    # 64 registers => relative std error ~= 1.04/sqrt(64) = 13%; assert
    # a loose 3-sigma band on a 5k-distinct stream with duplicates.
    rows = [(f"w{i}",) for i in range(5000)] * 2
    df = spark.createDataFrame(rows, ["term"])
    h = df.select(K.string_hash(F.col("term")).alias("th"))
    reg = K.hll_registers(h, "th", [])
    est = K.hll_estimate(reg, []).collect()[0]["hll_est_raw"]
    assert 5000 * 0.6 < est < 5000 * 1.4, est
    # duplicates must not move the registers at all
    h1 = df.distinct().select(K.string_hash(F.col("term")).alias("th"))
    est1 = K.hll_estimate(K.hll_registers(h1, "th", []), []) \
        .collect()[0]["hll_est_raw"]
    assert est == est1


@_needs_data
def test_k01_probe_join_is_broadcast(spark):
    df = catalog.all_queries()["k01_cms_heavy_hitters"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


@_needs_data
def test_k02_register_agg_is_partial(spark):
    """The register groupBy must plan as partial+final HashAggregate
    (map-side combine) — the O(m)-state property the sketch exists for."""
    df = catalog.all_queries()["k02_hll_distinct"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_max" in plan or "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cms_linearity_merge_property(spark):
    """sketch(A) + sketch(B) element-wise == sketch(A union B): the
    linearity that makes per-partition build + sum-merge exact."""
    a = spark.createDataFrame([(f"x{i%7}",) for i in range(300)], ["t"])
    b = spark.createDataFrame([(f"y{i%11}",) for i in range(500)], ["t"])
    u = a.union(b)

    def grid(df):
        cnt = df.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
        hashed = cnt.select("c", K.string_hash(F.col("t")).alias("th"))
        g = K.cms_build(hashed, "th", "c")
        return {(r["j"], r["bucket"]): r["cnt"] for r in g.collect()}

    ga, gb, gu = grid(a), grid(b), grid(u)
    merged = {}
    for g in (ga, gb):
        for k, v in g.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == gu


def test_hll_max_merge_property(spark):
    """max(reg(A), reg(B)) element-wise == reg(A union B): the monoid
    w06's streaming foreachBatch maintenance relies on."""
    a = spark.createDataFrame([(f"u{i}",) for i in range(400)], ["t"])
    b = spark.createDataFrame([(f"v{i}",) for i in range(250)], ["t"])
    u = a.union(b)

    def regs(df):
        h = df.select(K.string_hash(F.col("t")).alias("th"))
        return {r["reg"]: r["max_rho"]
                for r in K.hll_registers(h, "th", []).collect()}

    ra, rb, ru = regs(a), regs(b), regs(u)
    merged = {}
    for r in (ra, rb):
        for k, v in r.items():
            merged[k] = max(merged.get(k, 0), v)
    assert merged == ru


@_needs_data
def test_q33_approx_percentiles_within_rank_error(spark):
    """approx_percentile (GK-style sketch) must land within the
    documented rank error of the exact two-pass answer (q31), and its
    plan must not carry the exact percentile's whole-group buffers."""
    qs = catalog.all_queries()
    approx = qs["q33_approx_percentiles"].spark(spark, SF_DIR)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "percentile(" not in plan.lower().replace(
        "percentile_approx", ""), plan
    rows = approx.collect()
    # 3 quantiles per return flag, every one inside the GK rank window
    # (the query emits its own exact-rank-span check; the oracle pins
    # the same all-ones shape).
    assert len(rows) == 3 * len({r["l_returnflag"] for r in rows})
    for r in rows:
        assert r["within_bound"] == 1, r


def test_cms_estimate_unseen_key_returns_zero(spark):
    """A candidate key absent from the build stream must come back with
    est=0 (empty grid cells mean count 0), not vanish from the output."""
    built = spark.createDataFrame([("a", 5), ("b", 3)], ["term", "c"])
    hashed = built.select(
        "term", "c", K.string_hash(F.col("term")).alias("th"))
    grid = K.cms_build(hashed, "th", "c")
    probe = spark.createDataFrame(
        [("zzz-never-seen",)], ["term"]).select(
        "term", K.string_hash(F.col("term")).alias("th"))
    est = K.cms_estimate(probe, grid, "th", ["term"]).collect()
    assert len(est) == 1
    # collisions with a/b's cells may lift individual cells, but with
    # 4 independent rows at w=512 at least one probe bucket is empty
    assert est[0]["cms_est"] == 0, est


def test_k05_sliding_hll_merge_equals_union_sketch(spark):
    """Mergeability invariant at sf0.001: the trailing-window estimate
    for each day equals the HLL estimate computed DIRECTLY on the union
    of that window's hashes (register max-merge is lossless), and
    n_exact matches a plain-Python trailing distinct count."""
    from datetime import timedelta

    from mousedatapipeline_spark.operators import sketches as K
    from mousedatapipeline_spark.plans.sketch_queries import (
        k05_sliding_hll)
    from mousedatapipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rows = (load(spark, sf, "events")
            .selectExpr("CAST(ts AS DATE) AS day", "user_id").collect())
    by_day = {}
    for r in rows:
        by_day.setdefault(r.day, set()).add(r.user_id)
    got = {r.day: r for r in k05_sliding_hll(spark, sf).collect()}
    assert set(got) == {d.strftime("%Y-%m-%d") for d in by_day}
    m, alpha = K.HLL_M, K.HLL_ALPHA

    def est(users):
        regs = {}
        for u in users:
            h = (u * 2654435761) % K.MOD
            reg, v = h % m, h // m
            rho = 26 if v == 0 else (v & -v).bit_length()
            regs[reg] = max(regs.get(reg, 0), rho)
        inv = sum(1.0 / (1 << r) for r in regs.values()) \
            + float(m - len(regs))
        return alpha * m * m / inv

    for day, users_today in by_day.items():
        window = set()
        for k in range(7):
            window |= by_day.get(day - timedelta(days=k), set())
        r = got[day.strftime("%Y-%m-%d")]
        assert r.n_exact == len(window), day
        assert abs(r.hll_est - est(window)) < 5.1e-7, day


def test_cms_grid_and_estimates_match_pure_python(spark):
    """Exact (not bound-only) triangulation of the count-min grid and
    its point estimates against an independent dict-based build — the
    existing CMS tests check the over-estimate GUARANTEE, this one
    checks the numbers, catching a bucket-arithmetic bug the Spark plan
    and its SQL oracle could share."""
    import random
    from collections import Counter, defaultdict

    rng = random.Random(7)
    agg = Counter()
    for _ in range(300):
        agg[rng.randrange(1, 5000)] += rng.randrange(1, 40)

    def h_of(u: int) -> int:
        return ((u % K.MOD) * K.KNUTH_RED) % K.MOD

    df = spark.createDataFrame(
        [(u, h_of(u), c) for u, c in agg.items()],
        "key bigint, h bigint, cnt bigint")
    grid: dict[tuple[int, int], int] = defaultdict(int)
    for u, c in agg.items():
        for j in range(K.CMS_D):
            grid[(j, ((K.CMS_A[j] * h_of(u) + K.CMS_B[j]) % K.MOD)
                  % K.CMS_W)] += c

    sketch = K.cms_build(df, "h", "cnt")
    got_grid = {(r["j"], r["bucket"]): r["cnt"] for r in sketch.collect()}
    assert got_grid == dict(grid)

    exp_est = {
        u: min(grid.get((j, ((K.CMS_A[j] * h_of(u) + K.CMS_B[j]) % K.MOD)
                        % K.CMS_W), 0)
               for j in range(K.CMS_D))
        for u in agg}
    got_est = {r["key"]: r["cms_est"]
               for r in K.cms_estimate(df.select("key", "h"), sketch,
                                       "h", ["key"]).collect()}
    assert got_est == exp_est
    # and the guarantee holds exactly on this fixture too
    assert all(got_est[u] >= c for u, c in agg.items())
