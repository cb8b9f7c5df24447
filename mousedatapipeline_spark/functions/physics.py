"""Physics expression builders — the reference's pint-based scalar math
as pure Catalyst Column expressions (JVM-side, codegen'd; no UDFs).

Reference semantics (cited file:line into /root/reference/):
- energy from wavelength  E = hc/lambda        src/processstep_metadata_update.py:51-87
- thickness from absorption t = -sign(a)*ln(1-|a|)/mu
                                               src/processstep_thickness_from_absorption.py:36-52
- transmission ratios / TCF                    src/processstep_calc_beam_flux_and_transmissions.py:208-218
- TCF applied only when factor > 1             src/processstep_apply_transmission_correction_factor.py:59-62
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# hc in keV*nm (CODATA 2018): E[keV] = HC_KEV_NM / lambda[nm]
HC_KEV_NM = 1.2398419843320026


def energy_kev(wavelength_nm: Column) -> Column:
    """E = hc/lambda in keV; non-positive/NULL wavelength degrades to 0.0.

    Mirrors the defensive reader semantics of
    src/processstep_metadata_update.py:74-84 (<=0 -> 0.0 sentinel).
    """
    return (
        F.when(wavelength_nm.isNull() | (wavelength_nm <= 0), F.lit(0.0))
        .otherwise(F.lit(HC_KEV_NM) / wavelength_nm)
    )


def thickness_from_absorption(absorption: Column, mu: Column) -> Column:
    """t = -sign(a) * ln(1 - |a|) / mu; invalid inputs -> -1.0 sentinel.

    Invalid: mu <= 0 or NULL, or |a| not in (0, 1]
    (src/processstep_thickness_from_absorption.py:36-52). The -1 sentinel
    is load-bearing downstream (thickness selection P10), so it is kept.
    """
    a, m = absorption, mu
    valid = m.isNotNull() & (m > 0) & a.isNotNull() & (F.abs(a) > 0) & (F.abs(a) <= 1)
    t = -F.signum(a) * F.log(F.lit(1.0) - F.abs(a)) / m
    return F.when(valid, t).otherwise(F.lit(-1.0))


def select_thickness(logbook_thickness: Column, derived_thickness: Column) -> Column:
    """thickness = logbook value if >= 0 else absorption-derived value
    (src/processstep_thickness_from_absorption.py:167-202)."""
    return (
        F.when(logbook_thickness.isNotNull() & (logbook_thickness >= 0),
               logbook_thickness)
        .otherwise(derived_thickness)
    )


def transmission(sample_flux: Column, direct_flux: Column) -> Column:
    """Transmission = SampleFlux / DirectFlux
    (src/processstep_calc_beam_flux_and_transmissions.py:217)."""
    return F.when(direct_flux.isNotNull() & (direct_flux != 0),
                  sample_flux / direct_flux)


def apply_tcf(transmission_col: Column, tcf: Column) -> Column:
    """Corrected transmission: multiply by TCF only when TCF > 1.

    Pure-column version of the reference's in-place overwrite
    (src/processstep_apply_transmission_correction_factor.py:46-76):
    the uncorrected value stays available as its own column instead of a
    `transmission_beam` backup dataset.
    """
    return F.when(tcf.isNotNull() & (tcf > 1), transmission_col * tcf).otherwise(
        transmission_col
    )


def mask_diameter_px(det_x_m: Column, sample_x_m: Column,
                     reference_distance_m: float = 2.0,
                     reference_diameter_px: float = 600.0) -> Column:
    """Beam-mask diameter in px from the sample-detector distance (P11).

    src/processstep_make_beam_mask.py:19-24: the reference diameter
    (600 px at 2 m) scales linearly with distance so solid-angle coverage
    stays constant across detector positions. Inputs are positions along
    the beam axis already converted to meters (the reference uses pint
    `.to('m')`; callers here convert units with plain column arithmetic,
    e.g. mm / 1000).

    src/processstep_make_beam_mask.py:85-92 asserts the distance is
    finite and > 0 and aborts the step otherwise; the engine-wide
    degrade-to-NULL convention applies, so invalid distances yield NULL
    (catchable by the error-sideband filter) instead of killing the job.
    """
    distance = det_x_m - sample_x_m
    valid = (distance.isNotNull() & ~F.isnan(distance)
             & (distance > 0.0))
    diameter = F.lit(reference_diameter_px) * distance / F.lit(
        reference_distance_m)
    return F.when(valid, diameter)


def background_corrected_absorption(transmission_col: Column,
                                    bg_transmission: Column,
                                    same_batch: Column) -> Column:
    """a_sample = 1 - T/T_bg, except same-batch background -> 1 - T.

    src/processstep_thickness_from_absorption.py:90-108: if the
    background is the *same* (ymd, batch) as the sample, no correction is
    applied (a = 1 - T); a missing background also means no correction.
    """
    corrected = F.lit(1.0) - transmission_col / bg_transmission
    uncorrected = F.lit(1.0) - transmission_col
    usable_bg = bg_transmission.isNotNull() & (bg_transmission != 0) & ~same_batch
    return F.when(usable_bg, corrected).otherwise(uncorrected)
