"""Sketch query catalog: count-min heavy hitters and HLL-style distinct
estimation over the ``documents`` token stream (beyond-reference: the
fixed-state scale path for corpus statistics a 100-TB curation pipeline
needs — see operators/sketches.py for the mergeability argument).

Both queries deliberately compute the EXACT statistic next to the sketch
estimate: the pair is what the driver's oracle hash gates, and the
sketch-vs-exact gap is the quality signal a user reads. At 100 TB the
exact column is dropped and only the O(d*w) / O(m) sketch state flows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from mousedatapipeline_spark.operators import sketches as K
from mousedatapipeline_spark.operators import text as T
from mousedatapipeline_spark.plans.catalog import register
from mousedatapipeline_spark.tables import load

_SQL_TOKENS = "list_filter(string_split(lower(text), ' '), t -> t <> '')"

# Heavy hitter = term with >= 1/1000 of all token occurrences. The
# comparison is kept in integer form (cnt * 1000 >= total) — no
# division, no float threshold ambiguity.
_HH_DENOM = 1000


def _cms_union_sql(src: str, cols: str) -> str:
    """UNION ALL of the d per-row bucket projections of ``src``."""
    return " UNION ALL ".join(
        f"SELECT {j} AS j, {K.cms_bucket_sql('th', j)} AS bucket, "
        f"{cols} FROM {src}"
        for j in range(K.CMS_D))


@register(
    "k01_cms_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT t AS term FROM documents, UNNEST({_SQL_TOKENS}) AS u(t)
    ),
    cnt AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
      FROM tok GROUP BY term
    ),
    hashed AS (
      SELECT term, exact_cnt, {K.string_hash_sql('term')} AS th FROM cnt
    ),
    total AS (SELECT SUM(exact_cnt) AS tot FROM cnt),
    grid AS (
      SELECT j, bucket, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
      FROM ({_cms_union_sql('hashed', 'exact_cnt')})
      GROUP BY j, bucket
    ),
    cand AS (
      SELECT term, exact_cnt, th FROM hashed
      WHERE exact_cnt * {_HH_DENOM} >= (SELECT tot FROM total)
    ),
    probe AS ({_cms_union_sql('cand', 'term, exact_cnt')})
    SELECT probe.term, probe.exact_cnt,
           CAST(MIN(grid.cnt) AS BIGINT) AS cms_est
    FROM probe JOIN grid USING (j, bucket)
    GROUP BY 1, 2
    """,
    doc="Count-min sketch heavy hitters: 4x512 counter grid over the "
        "whole token stream, point-estimates for terms holding >=0.1% "
        "of all occurrences, next to their exact counts. The grid is "
        "built from the exact per-term counts (CMS is linear, so this "
        "equals the raw-stream sketch) and the estimate >= exact "
        "invariant is pytest-asserted.",
)
def k01_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # One shuffle: exact per-term counts (also the sketch's input by
    # linearity — the grid agg and the candidate filter both reuse it).
    cnt = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt")))
    hashed = cnt.select(
        "term", "exact_cnt", K.string_hash(F.col("term")).alias("th"))
    hashed = hashed.localCheckpoint(eager=True)  # grid + candidates +
    # total all read this subtree IN ONE JOB; Spark does not reliably
    # reuse it under differing pushed projections (same rationale as
    # s03; r09 A/B 0.78 -> 0.71 s eager).
    grid = K.cms_build(hashed, "th", "exact_cnt")
    total = hashed.agg(F.sum("exact_cnt").alias("tot"))
    cand = (
        hashed.join(F.broadcast(total))  # 1-row broadcast, scan-stage
        .filter(F.col("exact_cnt") * _HH_DENOM >= F.col("tot"))
        .select("term", "exact_cnt", "th"))
    est = K.cms_estimate(cand, grid, "th", ["term", "exact_cnt"])
    return est.select("term", "exact_cnt",
                      F.col("cms_est").cast("bigint").alias("cms_est"))


def _hll_oracle_sql() -> str:
    reg_expr, rho_expr = K.hll_registers_sql("th")
    return f"""
    WITH tok AS (
      SELECT lang, t AS term FROM documents, UNNEST({_SQL_TOKENS}) AS u(t)
    ),
    h AS (
      SELECT lang, {K.string_hash_sql('term')} AS th FROM tok
    ),
    reg AS (
      SELECT lang, {reg_expr} AS reg, MAX({rho_expr}) AS max_rho
      FROM h GROUP BY 1, 2
    ),
    est AS (
      SELECT lang, {K.HLL_EST_SQL} AS hll_est_raw FROM reg GROUP BY lang
    ),
    ex AS (
      SELECT lang, CAST(COUNT(DISTINCT term) AS BIGINT) AS n_exact
      FROM tok GROUP BY lang
    )
    SELECT ex.lang, ex.n_exact,
           {stable_round_sql('est.hll_est_raw')} AS hll_est
    FROM ex JOIN est ON ex.lang = est.lang
    """


@register(
    "k02_hll_distinct",
    oracle=_hll_oracle_sql(),
    doc="HLL-style distinct-token estimate per language: 64 trailing-"
        "zero-rank registers (max-merged, so the groupBy partial-"
        "aggregates to <=64 rows per group map-side — O(m) state vs the "
        "exact COUNT DISTINCT's per-term state), next to the exact "
        "count. Raw estimator, no libm correction term (cross-engine "
        "determinism; see operators/sketches.py).",
)
def k02_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok = d.select("lang", F.explode(T.tokens(F.col("text"))).alias("term"))
    h = tok.select("lang", K.string_hash(F.col("term")).alias("th"))
    reg = K.hll_registers(h, "th", ["lang"])
    est = K.hll_estimate(reg, ["lang"])
    exact = tok.groupBy("lang").agg(
        F.count_distinct(F.col("term")).cast("bigint").alias("n_exact"))
    # est is <= n_langs rows: broadcast side of the final join.
    return (
        exact.join(F.broadcast(est), "lang")
        .select("lang", "n_exact",
                stable_round(F.col("hll_est_raw")).alias("hll_est")))


def _k03_oracle_sql() -> str:
    reg_expr, rho_expr = K.hll_registers_sql("uh")
    return f"""
    WITH ev AS (SELECT event_type, user_id FROM events),
    h AS (
      SELECT event_type,
             {K.user_hash_sql('user_id')} AS uh
      FROM ev
    ),
    ty AS (SELECT DISTINCT event_type FROM ev),
    pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM ty a JOIN ty b ON a.event_type < b.event_type
    ),
    stream AS (
      SELECT p.ta, p.tb, h.uh FROM h JOIN pairs p ON h.event_type = p.ta
      UNION ALL
      SELECT p.ta, p.tb, h.uh FROM h JOIN pairs p ON h.event_type = p.tb
    ),
    reg1 AS (
      SELECT event_type, {reg_expr} AS reg, MAX({rho_expr}) AS max_rho
      FROM h GROUP BY 1, 2
    ),
    est1 AS (
      SELECT event_type, {K.HLL_EST_SQL} AS e FROM reg1
      GROUP BY event_type
    ),
    regu AS (
      SELECT ta, tb, {reg_expr} AS reg, MAX({rho_expr}) AS max_rho
      FROM stream GROUP BY 1, 2, 3
    ),
    estu AS (
      SELECT ta, tb, {K.HLL_EST_SQL} AS eu FROM regu GROUP BY ta, tb
    ),
    dp AS (SELECT DISTINCT event_type, user_id FROM ev),
    ex AS (
      SELECT a.event_type AS ta, b.event_type AS tb,
             CAST(COUNT(*) AS BIGINT) AS n_exact_both
      FROM dp a JOIN dp b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT u.ta, u.tb,
           COALESCE(ex.n_exact_both, 0) AS n_exact_both,
           {stable_round_sql('ea.e')} AS est_a,
           {stable_round_sql('eb.e')} AS est_b,
           {stable_round_sql('u.eu')} AS est_union,
           {stable_round_sql('ea.e + eb.e - u.eu')} AS est_intersect
    FROM estu u
    JOIN est1 ea ON ea.event_type = u.ta
    JOIN est1 eb ON eb.event_type = u.tb
    LEFT JOIN ex ON ex.ta = u.ta AND ex.tb = u.tb
    """


@register(
    "k03_hll_set_ops",
    oracle=_k03_oracle_sql(),
    doc="HLL set algebra — the mergeability that makes sketches worth "
        "keeping: per event-type pair, distinct-user estimates for "
        "each side, their UNION (register-wise max over one fanned-out "
        "stream — never a distinct over the union of raw streams), "
        "and the inclusion-exclusion INTERSECTION estimate, next to "
        "the exact both-types count. All register arithmetic is the "
        "k02 integer rho chain + exactly-representable power-of-two "
        "sums, so the oracle reproduces the estimates bit-for-bit. "
        "The |types|^2 pair spine is broadcast; shuffles carry <= 64 "
        "register rows per (pair, partition) map-side.",
)
def k03_hll_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")
    h = (ev.select(
        "event_type",
        K.user_hash(F.col("user_id")).alias("uh"))
        .localCheckpoint(eager=False))  # per-type regs + two pair fans
    ty = h.select("event_type").distinct()
    pairs = (ty.select(F.col("event_type").alias("ta"))
             .join(ty.select(F.col("event_type").alias("tb")))
             .filter(F.col("ta") < F.col("tb")))
    est1 = K.hll_estimate(
        K.hll_registers(h, "uh", ["event_type"]), ["event_type"])
    # ONE pass over the corpus-sized h: melt the tiny pair spine so a
    # single broadcast equi-join fans each event row into every pair
    # either of its roles touches — the previous union of two joins
    # read (and at first materialization, computed) h once per branch.
    # Roles are disjoint (ta < tb), so the fanned multiset is
    # identical to the two-join union.
    melted = (pairs.select(F.explode(F.array(
        F.struct("ta", "tb", F.col("ta").alias("key")),
        F.struct("ta", "tb", F.col("tb").alias("key"))))
        .alias("p"))
        .select("p.ta", "p.tb", "p.key"))
    stream = (h.join(F.broadcast(melted), h.event_type == melted.key)
              .select("ta", "tb", "uh"))
    estu = (K.hll_estimate(
        K.hll_registers(stream, "uh", ["ta", "tb"]), ["ta", "tb"])
        .withColumnRenamed("hll_est_raw", "eu"))
    dp = ev.distinct()
    ex = (dp.select(F.col("event_type").alias("ta"),
                    F.col("user_id").alias("u1"))
          .join(dp.select(F.col("event_type").alias("tb"),
                          F.col("user_id").alias("u1")), "u1")
          .filter(F.col("ta") < F.col("tb"))
          .groupBy("ta", "tb")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_both")))
    ea = est1.select(F.col("event_type").alias("ta"),
                     F.col("hll_est_raw").alias("e_a"))
    eb = est1.select(F.col("event_type").alias("tb"),
                     F.col("hll_est_raw").alias("e_b"))
    return (estu
            .join(F.broadcast(ea), "ta")
            .join(F.broadcast(eb), "tb")
            .join(ex, ["ta", "tb"], "left")
            .select(
                "ta", "tb",
                F.coalesce("n_exact_both", F.lit(0)).cast("bigint")
                .alias("n_exact_both"),
                stable_round(F.col("e_a")).alias("est_a"),
                stable_round(F.col("e_b")).alias("est_b"),
                stable_round(F.col("eu")).alias("est_union"),
                stable_round(F.col("e_a") + F.col("e_b") - F.col("eu"))
                .alias("est_intersect")))


def _k04_side_sql(etype: str) -> str:
    """Per-user counts + user-key hash for one join side."""
    return (f"SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt, "
            f"{K.string_hash_sql('CAST(user_id AS VARCHAR)')} AS th "
            f"FROM events WHERE event_type = '{etype}' GROUP BY user_id")


@register(
    "k04_join_size_estimate",
    oracle=f"""
    WITH a AS ({_k04_side_sql('click')}),
    b AS ({_k04_side_sql('purchase')}),
    ga AS (
      SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM ({_cms_union_sql('a', 'cnt')}) GROUP BY j, bucket
    ),
    gb AS (
      SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM ({_cms_union_sql('b', 'cnt')}) GROUP BY j, bucket
    ),
    ip AS (
      SELECT ga.j, CAST(SUM(ga.cnt * gb.cnt) AS BIGINT) AS est
      FROM ga JOIN gb ON ga.j = gb.j AND ga.bucket = gb.bucket
      GROUP BY ga.j
    ),
    ex AS (
      SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS exact_size,
             CAST(COUNT(*) AS BIGINT) AS n_shared_keys
      FROM a JOIN b ON a.user_id = b.user_id
    )
    SELECT ex.n_shared_keys, ex.exact_size,
           (SELECT CAST(MIN(est) AS BIGINT) FROM ip) AS cms_estimate
    FROM ex
    """,
    doc="Join-size estimation via count-min inner product — the "
        "optimizer-statistics capability: |A JOIN B| on user_id for "
        "the clicks x purchases join, estimated as min over sketch "
        "rows of the CMS(A)·CMS(B) dot product (the AMS/CMS estimate, "
        "upward-biased, exact-side shown next to it). Each side's "
        "sketch is O(d*w) integers built from its per-key counts; the "
        "inner product is a 2048-cell join — the estimate costs "
        "nothing at ANY scale while the exact answer needs the real "
        "key join. All-integer arithmetic, so the oracle reproduces "
        "the sketch bit-for-bit.",
)
def k04_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "user_id")

    def side(etype: str) -> DataFrame:
        return (ev.filter(F.col("event_type") == etype)
                .groupBy("user_id")
                .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
                .withColumn("th", K.string_hash(
                    F.col("user_id").cast("string"))))

    a = side("click").localCheckpoint(eager=False)    # grid + exact
    b = side("purchase").localCheckpoint(eager=False)
    ga = K.cms_build(a, "th", "cnt")
    gb = K.cms_build(b, "th", "cnt")
    ip = (ga.join(gb.withColumnRenamed("cnt", "cnt_b"), ["j", "bucket"])
          .groupBy("j")
          .agg(F.sum(F.col("cnt") * F.col("cnt_b")).cast("bigint")
               .alias("est")))
    est = ip.agg(F.min("est").cast("bigint").alias("cms_estimate"))
    ex = (a.select("user_id", F.col("cnt").alias("ca"))
          .join(b.select("user_id", F.col("cnt").alias("cb")), "user_id")
          .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint")
               .alias("exact_size"),
               F.count(F.lit(1)).cast("bigint").alias("n_shared_keys")))
    return (ex.join(F.broadcast(est))
            .select("n_shared_keys", "exact_size", "cms_estimate"))


def _k05_oracle_sql() -> str:
    reg_expr, rho_expr = K.hll_registers_sql("uh")
    return f"""
    WITH ev AS (
      SELECT CAST(ts AS DATE) AS day, user_id,
             {K.user_hash_sql('user_id')} AS uh
      FROM events
    ),
    spine AS (SELECT DISTINCT day FROM ev),
    daily AS (
      SELECT day, {reg_expr} AS reg, MAX({rho_expr}) AS max_rho
      FROM ev GROUP BY 1, 2
    ),
    fan AS (
      SELECT daily.day + CAST(i AS INT) AS day, reg, max_rho
      FROM daily, UNNEST(generate_series(0, 6)) AS g(i)
    ),
    win AS (
      SELECT f.day, f.reg, MAX(f.max_rho) AS max_rho
      FROM fan f JOIN spine s ON f.day = s.day
      GROUP BY 1, 2
    ),
    est AS (
      SELECT day, {K.HLL_EST_SQL} AS hll_est_raw FROM win GROUP BY day
    ),
    du AS (SELECT DISTINCT day, user_id FROM ev),
    dfan AS (
      SELECT du.day + CAST(i AS INT) AS day, user_id
      FROM du, UNNEST(generate_series(0, 6)) AS g(i)
    ),
    ex AS (
      SELECT f.day, CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS n_exact
      FROM dfan f JOIN spine s ON f.day = s.day
      GROUP BY 1
    )
    SELECT strftime(ex.day, '%Y-%m-%d') AS day, ex.n_exact,
           {stable_round_sql('est.hll_est_raw')} AS hll_est,
           {stable_round_sql(
               '(est.hll_est_raw - CAST(ex.n_exact AS DOUBLE))'
               ' / CAST(ex.n_exact AS DOUBLE)')} AS rel_err
    FROM ex JOIN est ON ex.day = est.day
    """


@register(
    "k05_sliding_hll",
    oracle=_k05_oracle_sql(),
    doc="Trailing-7-day distinct users per day via sliding HLL merge — "
        "the pre-aggregated-sketch pattern that replaces COUNT(DISTINCT) "
        "over windows at 100 TB: each day keeps 64 max-merged registers "
        "(O(m) state), and the trailing window is a register-wise MAX "
        "across 7 daily sketches. The fan-out is a scan-stage explode "
        "of <= 7 day offsets on the DAILY REGISTER table (never the "
        "event stream), so window depth multiplies sketch rows, not "
        "data. Exact trailing distinct and the relative error ride "
        "along — the accuracy audit for choosing m.",
)
def k05_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id",
        K.user_hash(F.col("user_id")).alias("uh"))
    spine = ev.select("day").distinct()
    daily = K.hll_registers(ev, "uh", ["day"])
    offsets = F.explode(F.array(*[F.lit(i) for i in range(7)])).alias("i")
    fan = daily.select("reg", "max_rho", "day", offsets).select(
        F.date_add("day", F.col("i")).alias("day"), "reg", "max_rho")
    win = (fan.join(F.broadcast(spine), "day")
           .groupBy("day", "reg").agg(F.max("max_rho").alias("max_rho")))
    est = K.hll_estimate(win, ["day"])
    du = ev.select("day", "user_id").distinct()
    dfan = du.select("user_id", "day", offsets).select(
        F.date_add("day", F.col("i")).alias("day"), "user_id")
    exact = (dfan.join(F.broadcast(spine), "day")
             .groupBy("day")
             .agg(F.count_distinct("user_id").cast("bigint")
                  .alias("n_exact")))
    return (exact.join(est, "day")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    "n_exact",
                    stable_round(F.col("hll_est_raw")).alias("hll_est"),
                    stable_round((F.col("hll_est_raw")
                                  - F.col("n_exact").cast("double"))
                                 / F.col("n_exact").cast("double"))
                    .alias("rel_err")))
