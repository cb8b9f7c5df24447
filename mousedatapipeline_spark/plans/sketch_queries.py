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
    hashed = hashed.localCheckpoint(eager=False)  # grid + candidates +
    # total all read this subtree; Spark does not reliably reuse it
    # under differing pushed projections (same rationale as s03).
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
