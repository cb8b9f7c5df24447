"""MOUSE-domain query catalog: the reference pipeline's semantics
(flux/transmission physics, TCF propagation, background correction,
stacking) exercised end-to-end on the driver's star schema, with DuckDB
oracles.

The star schema maps onto the MOUSE data model (FIXTURES.md §4):
lineitem rows play repetitions, (l_orderkey, l_linenumber, l_suppkey%3)
play (batch, repetition, configuration), and scalar physics inputs are
derived deterministically from lineitem columns. The *semantics* under
test are the reference's:

  P5  transmission ratios        calc_beam_flux_and_transmissions.py:216-218
  A4  batch-max propagation      transmission_correction_factor_propagator.py:54-81
  P13 TCF applied only when >1   apply_transmission_correction_factor.py:59-62
  P8  thickness w/ -1 sentinel   thickness_from_absorption.py:36-52
  P10 thickness selection        thickness_from_absorption.py:167-202
  P9/J3 background correction    thickness_from_absorption.py:90-108
  A1/A2 stacking + statistics    post_translation_operation_hdf5_stacker.py:120-189
  F1  completeness check         checkers.py:19-46
  S12 metrics table              transmission_thickness_flux_table.py:59-89
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mousedatapipeline_spark.functions import physics
from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from mousedatapipeline_spark.operators import joins, windows
from mousedatapipeline_spark.operators.aggregates import dsum, stack_stats
from mousedatapipeline_spark.operators.filters import completeness_check
from mousedatapipeline_spark.operators.aggregates import census
from mousedatapipeline_spark.plans.catalog import register
from mousedatapipeline_spark.tables import load

# Deterministic star-schema -> measurement mapping, kept identical in the
# SQL oracles below (the "_measurements" CTE).
_MEASUREMENT_SQL_CTE = """
      SELECT l_orderkey AS batch,
             l_linenumber AS repetition,
             CAST(l_orderkey % 3 AS INT) AS configuration,
             strftime(l_shipdate, '%Y%m%d') AS ymd,
             l_extendedprice / 100.0 AS direct_flux,
             1.0 - l_discount AS transmission,
             0.95 + l_tax * 2.0 AS tcf,
             l_discount * 5.0 AS absorption,
             2.0 + l_tax * 10.0 AS mu,
             CASE WHEN l_quantity >= 40.0 THEN l_quantity / 100.0
                  ELSE -1.0 END AS samplethickness,
             l_discount AS scattering_prob,
             l_quantity / 50.0 AS wavelength_nm
      FROM lineitem
"""


def measurements(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measurements fact: one row per repetition (README.md:27-40
    shape), derived deterministically from lineitem."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("batch"),
        F.col("l_linenumber").alias("repetition"),
        (F.col("l_orderkey") % 3).cast("int").alias("configuration"),
        F.date_format("l_shipdate", "yyyyMMdd").alias("ymd"),
        (F.col("l_extendedprice") / 100.0).alias("direct_flux"),
        (F.lit(1.0) - F.col("l_discount")).alias("transmission"),
        (F.lit(0.95) + F.col("l_tax") * 2.0).alias("tcf"),
        (F.col("l_discount") * 5.0).alias("absorption"),
        (F.lit(2.0) + F.col("l_tax") * 10.0).alias("mu"),
        F.when(F.col("l_quantity") >= 40.0, F.col("l_quantity") / 100.0)
        .otherwise(F.lit(-1.0)).alias("samplethickness"),
        F.col("l_discount").alias("scattering_prob"),
        (F.col("l_quantity") / 50.0).alias("wavelength_nm"),
    )


# --------------------------------------------------------------------------
# Flagship: the minimum end-to-end slice of SURVEY §7.2.2 — expressions ->
# window propagation -> gated correction -> grouped stack statistics.
# One window shuffle on batch, one agg shuffle on (batch, configuration);
# at scale both are map-side-combined and AQE-coalesced.
# --------------------------------------------------------------------------
@register(
    "m01_stacked_summary",
    oracle=f"""
    WITH m AS ({_MEASUREMENT_SQL_CTE}),
    prop AS (
      SELECT *,
             MAX(tcf) OVER (PARTITION BY batch) AS largest_tcf,
             MAX(scattering_prob) OVER (PARTITION BY batch) AS max_scatter_prob
      FROM m
    ), corr AS (
      SELECT *,
             CASE WHEN largest_tcf > 1.0 THEN transmission * largest_tcf
                  ELSE transmission END AS transmission_corrected
      FROM prop
    ), s AS (
      SELECT batch, configuration,
             CAST(SUM(CAST(transmission_corrected AS DECIMAL(30,10))) AS DOUBLE) AS su,
             CAST(SUM(CAST(transmission_corrected * transmission_corrected
                           AS DECIMAL(30,10))) AS DOUBLE) AS sq,
             CAST(COUNT(*) AS BIGINT) AS t_count,
             MAX(transmission_corrected) AS t_max,
             MIN(transmission_corrected) AS t_min,
             CAST(SUM(CAST(direct_flux AS DECIMAL(30,10))) AS DOUBLE) AS flux_sum,
             MAX(max_scatter_prob) AS max_scatter_prob
      FROM corr GROUP BY batch, configuration
    )
    SELECT batch, configuration, t_count, t_max, t_min, max_scatter_prob,
           {stable_round_sql('su / CAST(t_count AS DOUBLE)')} AS t_mean,
           CASE WHEN t_count > 1 THEN {stable_round_sql('''
                   SQRT(GREATEST((sq - (su * su) / CAST(t_count AS DOUBLE))
                        / (CAST(t_count AS DOUBLE) - 1.0), 0.0))''')}
                END AS t_std,
           CASE WHEN t_count > 1 THEN {stable_round_sql('''
                   SQRT(GREATEST((sq - (su * su) / CAST(t_count AS DOUBLE))
                        / (CAST(t_count AS DOUBLE) - 1.0), 0.0))
                   / SQRT(CAST(t_count AS DOUBLE))''')}
                END AS t_sem,
           {stable_round_sql('flux_sum')} AS flux_sum
    FROM s
    """,
    doc="Flagship A1/A2+A4+P13 slice: propagate batch-max TCF, apply when >1, "
        "stack per (batch, configuration) with mean/std(ddof=1)/sem stats.",
)
def m01_stacked_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = measurements(spark, sf_dir)
    prop = windows.propagate_group_max(
        m, ["batch"],
        {"tcf": "largest_tcf", "scattering_prob": "max_scatter_prob"})
    corr = prop.withColumn(
        "transmission_corrected",
        physics.apply_tcf(F.col("transmission"), F.col("largest_tcf")))
    # One shuffle: the flux sum and propagated max ride on the same
    # groupBy as the stack statistics (no second aggregation, no join).
    out = stack_stats(
        corr, ["batch", "configuration"], "transmission_corrected",
        prefix="t_",
        extra_aggs={
            "flux_sum": stable_round(dsum("direct_flux")),
            "max_scatter_prob": F.max("max_scatter_prob"),
        })
    return out.select(
        "batch", "configuration", "t_count", "t_max", "t_min",
        "max_scatter_prob",
        stable_round(F.col("t_mean")).alias("t_mean"),
        stable_round(F.col("t_std")).alias("t_std"),
        stable_round(F.col("t_sem")).alias("t_sem"),
        "flux_sum",
    )


# --------------------------------------------------------------------------
# J3/P9/P8/P10: background self-join with same-batch guard, then the full
# thickness chain on the corrected absorption.
# --------------------------------------------------------------------------
@register(
    "m02_background_thickness",
    oracle=f"""
    WITH m AS ({_MEASUREMENT_SQL_CTE}),
    bg AS (
      SELECT batch AS bg_batch,
             CAST(SUM(CAST(transmission AS DECIMAL(30,10))) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS transmission_bg
      FROM m GROUP BY batch
    ), j AS (
      SELECT m.*,
             CAST(FLOOR(m.batch / 10.0) AS BIGINT) * 10 AS bg_key,
             b.transmission_bg,
             (CAST(FLOOR(m.batch / 10.0) AS BIGINT) * 10 = m.batch) AS same_as_bg
      FROM m LEFT JOIN bg b ON CAST(FLOOR(m.batch / 10.0) AS BIGINT) * 10 = b.bg_batch
    ), a AS (
      SELECT *,
             CASE WHEN transmission_bg IS NOT NULL AND transmission_bg <> 0.0
                       AND NOT same_as_bg
                  THEN 1.0 - transmission / transmission_bg
                  ELSE 1.0 - transmission END AS absorption_corrected
      FROM j
    )
    SELECT batch, repetition, configuration,
           CAST(same_as_bg AS INT) AS same_as_bg,
           ROUND(absorption_corrected, 6) AS absorption_corrected,
           ROUND(CASE WHEN samplethickness >= 0.0 THEN samplethickness
                      WHEN mu > 0.0 AND ABS(absorption_corrected) > 0.0
                           AND ABS(absorption_corrected) <= 1.0
                      THEN -SIGN(absorption_corrected)
                           * LN(1.0 - ABS(absorption_corrected)) / mu
                      ELSE -1.0 END, 6) AS thickness
    FROM a
    """,
    doc="J3/P9: background self-join keyed batch->batch//10*10 with same-batch "
        "guard (thickness_from_absorption.py:90-108), P8/P10 thickness chain.",
)
def m02_background_thickness(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = measurements(spark, sf_dir)
    # Per-batch mean transmission plays the stacked background value.
    bg = m.groupBy(F.col("batch").alias("bg_batch")).agg(
        (dsum("transmission") / F.count(F.lit(1)).cast("double"))
        .alias("transmission_bg"))
    withkey = m.withColumn(
        "bg_key", (F.col("batch").cast("bigint") / 10).cast("bigint") * 10)
    j = withkey.join(F.broadcast(bg),
                     withkey.bg_key == bg.bg_batch, "left")
    j = j.withColumn("same_as_bg", F.col("bg_key") == F.col("batch"))
    a = j.withColumn(
        "absorption_corrected",
        physics.background_corrected_absorption(
            F.col("transmission"), F.col("transmission_bg"),
            F.col("same_as_bg")))
    derived = physics.thickness_from_absorption(
        F.col("absorption_corrected"), F.col("mu"))
    thickness = physics.select_thickness(
        F.when(F.col("samplethickness") >= 0.0, F.col("samplethickness")),
        derived)
    return a.select(
        "batch", "repetition", "configuration",
        F.col("same_as_bg").cast("int").alias("same_as_bg"),
        F.round("absorption_corrected", 6).alias("absorption_corrected"),
        F.round(thickness, 6).alias("thickness"),
    )


# --------------------------------------------------------------------------
# S12: the per-repetition metrics table (the reference's appended CSV).
# --------------------------------------------------------------------------
@register(
    "m03_flux_thickness_table",
    oracle=f"""
    WITH m AS ({_MEASUREMENT_SQL_CTE})
    SELECT ymd, batch, repetition, configuration,
           ROUND(direct_flux, 6) AS direct_flux,
           ROUND(direct_flux * transmission, 6) AS sample_flux,
           ROUND(transmission, 6) AS transmission,
           ROUND(CASE WHEN wavelength_nm <= 0.0 THEN 0.0
                      ELSE 1.2398419843320026 / wavelength_nm END, 6) AS energy_kev,
           ROUND(samplethickness, 6) AS samplethickness,
           ROUND(scattering_prob, 6) AS scattering_prob
    FROM m
    """,
    doc="S12: per-repetition flux/thickness/transmission metrics row "
        "(transmission_thickness_flux_table.py:59-89); CSV sink tested in tests/.",
)
def m03_flux_thickness_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = measurements(spark, sf_dir)
    return m.select(
        "ymd", "batch", "repetition", "configuration",
        F.round("direct_flux", 6).alias("direct_flux"),
        F.round(F.col("direct_flux") * F.col("transmission"), 6)
        .alias("sample_flux"),
        F.round("transmission", 6).alias("transmission"),
        F.round(physics.energy_kev(F.col("wavelength_nm")), 6)
        .alias("energy_kev"),
        F.round("samplethickness", 6).alias("samplethickness"),
        F.round("scattering_prob", 6).alias("scattering_prob"),
    )


# --------------------------------------------------------------------------
# F1: completeness check with missing-pattern list.
# --------------------------------------------------------------------------
@register(
    "m04_completeness",
    oracle="""
    WITH c AS (
      SELECT l_orderkey AS batch,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS n_normal
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT batch, n_lines, n_normal,
           concat_ws(',',
             CASE WHEN n_lines <> 4 THEN 'n_lines!=4' END,
             CASE WHEN n_normal <> 2 THEN 'n_normal!=2' END) AS missing,
           CAST(n_lines = 4 AND n_normal = 2 AS INT) AS is_complete
    FROM c
    """,
    doc="F1: processing_possible census + missing-pattern list "
        "(checkers.py:19-46).",
)
def m04_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    c = census(li.withColumnRenamed("l_orderkey", "batch"), ["batch"], {
        "n_lines": F.lit(True),
        "n_normal": F.col("l_returnflag") == "N",
    })
    out = completeness_check(c, {"n_lines": 4, "n_normal": 2})
    return out.select(
        "batch", "n_lines", "n_normal",
        F.array_join("missing", ",").alias("missing"),
        F.col("is_complete").cast("int").alias("is_complete"),
    )
