"""Pipeline composition semantics — above all the order-sensitive
transmission contract (SURVEY.md §7.3 hard-point 1): thickness consumes
the CORRECTED transmission because thickness_from_absorption runs after
apply_transmission_correction_factor in the nostack ordering."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mousedatapipeline_spark import pipeline as P
from mousedatapipeline_spark.operators.aggregates import latest_mtime


def _measurements(spark):
    # One batch, two repetitions; TCF max 1.25 (> 1 -> applied);
    # background points at itself (same-batch guard -> no correction).
    rows = [
        # ymd, batch, rep, cfg, wavelength, dflux, trans, tcf, scat,
        # mu, samplethickness, bg_ymd, bg_batch
        ("20240101", 1, 1, 0, 0.154, 100.0, 0.5, 1.25, 0.1,
         2.0, -1.0, "20240101", 1),
        ("20240101", 1, 2, 0, 0.154, 110.0, 0.6, 1.10, 0.3,
         2.0, -1.0, "20240101", 1),
    ]
    return spark.createDataFrame(rows, (
        "ymd string, batch int, repetition int, configuration int, "
        "wavelength_nm double, direct_flux double, transmission double, "
        "tcf double, scattering_prob double, mu double, "
        "samplethickness double, bg_ymd string, bg_batch int"))


def _logbook(spark):
    return spark.createDataFrame(
        [("20240101", 1, "sample-A")], "ymd string, batch int, sample_name string")


def test_nostack_thickness_consumes_corrected_transmission(spark):
    out = {r["repetition"]: r for r in P.nostack_program(
        _logbook(spark))(_measurements(spark)).collect()}
    r1 = out[1]
    # TCF propagation: batch max = 1.25, applied to every repetition
    assert r1["largest_tcf"] == 1.25
    assert r1["transmission_corrected"] == 0.5 * 1.25
    assert out[2]["transmission_corrected"] == 0.6 * 1.25
    # Same-batch background -> no correction: a = 1 - T_corrected
    assert r1["same_as_bg_bg"] is True
    a1 = 1.0 - 0.5 * 1.25
    assert math.isclose(r1["absorption_corrected"], a1, rel_tol=1e-12)
    # Thickness from the CORRECTED absorption (the ordering contract)
    expect_t = -math.copysign(1, a1) * math.log(1 - abs(a1)) / 2.0
    assert math.isclose(r1["thickness"], expect_t, rel_tol=1e-12)
    # Logbook metadata and energy rode along
    assert r1["sample_name"] == "sample-A"
    assert math.isclose(r1["energy_kev"], 8.0509219761818, rel_tol=1e-9)


def test_full_program_stacks_per_configuration(spark):
    out = P.full_program(_logbook(spark))(_measurements(spark)).collect()
    assert len(out) == 1
    row = out[0]
    assert row["t_count"] == 2
    tc = [0.5 * 1.25, 0.6 * 1.25]
    assert math.isclose(row["t_mean"], sum(tc) / 2, rel_tol=1e-9)
    assert row["max_scatter_prob"] == 0.3
    assert math.isclose(row["flux_sum"], 210.0, rel_tol=1e-12)


def test_compose_order(spark):
    df = spark.range(1)
    step_a = lambda d: d.withColumn("x", F.lit(1))          # noqa: E731
    step_b = lambda d: d.withColumn("x", F.col("x") + 1)    # noqa: E731
    assert P.compose(step_a, step_b)(df).collect()[0]["x"] == 2


def test_latest_mtime_freshness(spark):
    from datetime import datetime
    df = spark.createDataFrame(
        [("b", datetime(2024, 1, 1)), ("b", datetime(2024, 2, 1))],
        "k string, modificationTime timestamp")
    row = latest_mtime(df, ["k"]).collect()[0]
    assert row["latest_mtime"] == datetime(2024, 2, 1)


def test_logbook_csv_roundtrip(tmp_path, spark):
    from mousedatapipeline_spark.sources.logbook import load_logbook

    p = tmp_path / "logbook.csv"
    p.write_text(
        "ymd,batch,sample_name,project,samplethickness,bg_ymd,bg_batch\n"
        "20240101,1,sampleA,projX,0.1,None,\n"
        "20240101,1,dupe-ignored,projX,0.2,,\n"
        "20240102,2,sampleB,projY,-1.0,20240101,1\n")
    lb = load_logbook(spark, str(p))
    rows = {(r["ymd"], r["batch"]): r for r in lb.collect()}
    assert len(rows) == 2                      # first-match dedupe
    assert rows[("20240101", 1)]["bg_ymd"] is None   # 'None' -> real NULL
    assert rows[("20240102", 2)]["samplethickness"] == -1.0


def test_logbook_use_flag_gates_entries(spark, tmp_path):
    """Only use=True entries are searched (MOUSE_settings.yaml:14);
    logbooks without the column keep every row."""
    from mousedatapipeline_spark.sources.logbook import load_logbook
    p = tmp_path / "lb_use.csv"
    p.write_text(
        "ymd,batch,sample_name,use\n"
        "20240101,1,S1,True\n"
        "20240101,2,S2,False\n"
        "20240102,3,S3,true\n"
        "20240102,4,S4,\n")  # blank -> NULL -> kept
    got = {r.batch for r in load_logbook(spark, str(p)).collect()}
    assert got == {1, 3, 4}
    q = tmp_path / "lb_noflag.csv"
    q.write_text("ymd,batch,sample_name\n20240101,1,S1\n20240101,2,S2\n")
    assert load_logbook(spark, str(q)).count() == 2
