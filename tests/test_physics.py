"""Physics expression guards — the reference's sentinel semantics
(SURVEY.md §5 golden invariants), plus a closed-form round trip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mousedatapipeline_spark.functions import physics


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_energy_from_wavelength_closed_form(spark):
    # Cu K-alpha: lambda = 0.154 nm -> E ~ 8.05 keV
    e = _one(spark, physics.energy_kev(F.lit(0.154)))
    assert math.isclose(e, 8.0509219761818, rel_tol=1e-10)


def test_energy_nonpositive_degrades_to_zero(spark):
    assert _one(spark, physics.energy_kev(F.lit(-1.0))) == 0.0
    assert _one(spark, physics.energy_kev(F.lit(0.0))) == 0.0
    assert _one(spark, physics.energy_kev(F.lit(None).cast("double"))) == 0.0


def test_thickness_round_trip(spark):
    # a = 1 - exp(-mu * t)  =>  thickness_from_absorption(a, mu) == t
    mu, t = 2.5, 0.4
    a = 1.0 - math.exp(-mu * t)
    got = _one(spark, physics.thickness_from_absorption(F.lit(a), F.lit(mu)))
    assert math.isclose(got, t, rel_tol=1e-12)


def test_thickness_sentinels(spark):
    # invalid mu or a outside (0, 1] -> -1.0
    # (src/processstep_thickness_from_absorption.py:36-52)
    cases = [(0.5, 0.0), (0.5, -2.0), (0.0, 3.0), (1.5, 3.0), (-1.5, 3.0)]
    for a, mu in cases:
        assert _one(spark, physics.thickness_from_absorption(
            F.lit(a), F.lit(mu))) == -1.0
    # |a| = 1 is valid boundary -> +inf from ln(0); reference lets it
    # through the guard, so we only assert it is not the sentinel
    assert _one(spark, physics.thickness_from_absorption(
        F.lit(0.999), F.lit(3.0))) != -1.0


def test_select_thickness_prefers_nonnegative_logbook(spark):
    sel = physics.select_thickness
    assert _one(spark, sel(F.lit(0.3), F.lit(9.9))) == 0.3
    assert _one(spark, sel(F.lit(-1.0), F.lit(9.9))) == 9.9
    assert _one(spark, sel(F.lit(None).cast("double"), F.lit(9.9))) == 9.9


def test_apply_tcf_only_when_greater_than_one(spark):
    # (src/processstep_apply_transmission_correction_factor.py:59-62)
    assert _one(spark, physics.apply_tcf(F.lit(0.5), F.lit(1.2))) == 0.6
    assert _one(spark, physics.apply_tcf(F.lit(0.5), F.lit(1.0))) == 0.5
    assert _one(spark, physics.apply_tcf(F.lit(0.5), F.lit(0.8))) == 0.5
    assert _one(spark, physics.apply_tcf(
        F.lit(0.5), F.lit(None).cast("double"))) == 0.5


def test_background_correction_same_batch_skips(spark):
    # (src/processstep_thickness_from_absorption.py:95-108)
    f = physics.background_corrected_absorption
    corrected = _one(spark, f(F.lit(0.8), F.lit(0.9), F.lit(False)))
    assert math.isclose(corrected, 1.0 - 0.8 / 0.9, rel_tol=1e-12)
    same = _one(spark, f(F.lit(0.8), F.lit(0.9), F.lit(True)))
    assert math.isclose(same, 1.0 - 0.8, rel_tol=1e-12)
    missing = _one(spark, f(F.lit(0.8), F.lit(None).cast("double"),
                            F.lit(False)))
    assert math.isclose(missing, 0.2, rel_tol=1e-12)


def test_transmission_zero_direct_flux_is_null(spark):
    assert _one(spark, physics.transmission(F.lit(1.0), F.lit(0.0))) is None


def test_mask_diameter_reference_scaling(spark):
    # P11 (processstep_make_beam_mask.py:19-24): 600 px at the 2 m
    # reference distance, scaled linearly.
    assert _one(spark, physics.mask_diameter_px(
        F.lit(2.0), F.lit(0.0))) == 600.0
    assert _one(spark, physics.mask_diameter_px(
        F.lit(1.0), F.lit(0.0))) == 300.0
    # mm->m conversion at the callsite: det at 1257 mm, sample at 57 mm
    got = _one(spark, physics.mask_diameter_px(
        F.lit(1257.0 / 1000.0), F.lit(57.0 / 1000.0)))
    assert math.isclose(got, 600.0 * 1.2 / 2.0, rel_tol=1e-12)


def test_mask_diameter_invalid_distance_degrades_to_null(spark):
    # processstep_make_beam_mask.py:85-92 asserts finite and > 0; the
    # engine degrades those rows to NULL instead of aborting.
    assert _one(spark, physics.mask_diameter_px(
        F.lit(0.5), F.lit(0.5))) is None          # zero distance
    assert _one(spark, physics.mask_diameter_px(
        F.lit(-1.0), F.lit(0.0))) is None         # negative
    assert _one(spark, physics.mask_diameter_px(
        F.lit(float("nan")), F.lit(0.0))) is None  # non-finite
    assert _one(spark, physics.mask_diameter_px(
        F.lit(None).cast("double"), F.lit(0.0))) is None
