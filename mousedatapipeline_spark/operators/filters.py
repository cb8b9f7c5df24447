"""Filter/validation operators: repetition completeness (F1), stacking
validation with quarantine (F4/S13), pixel validity (F5).

Reference parity notes cited per function (file:line into
/root/reference/).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def completeness_check(census_df: DataFrame,
                       expected: dict[str, int]) -> DataFrame:
    """F1 — `processing_possible`: a repetition is complete iff every
    counted pattern matches its expected count; incomplete rows carry the
    list of missing patterns.

    Reference: exactly 2 sub-dir master files, 2 sub-dir im_craw, 1 of
    each at top level; the checker returns the missing-pattern list
    (src/checkers.py:19-46). Input is a census DataFrame (one count
    column per pattern, see aggregates.census).
    """
    missing = F.array_compact(F.array(*[
        F.when(F.col(c) != F.lit(n), F.lit(f"{c}!={n}"))
        for c, n in expected.items()
    ]))
    return (census_df
            .withColumn("missing", missing)
            .withColumn("is_complete", F.size("missing") == 0))


def split_valid(df: DataFrame, condition: Column,
                reason: Column | None = None) -> tuple[DataFrame, DataFrame]:
    """F4/S13 — canStack validation with quarantine: returns
    (valid_rows, rejected_rows). Rejections carry a reason column instead
    of the reference's `.stacking_error_list` sideband file
    (src/post_translation_operation_hdf5_stacker.py:26-78, 104-108).

    Both outputs derive from one scan; Catalyst pushes the predicate to
    the source for each branch.
    """
    valid = df.filter(condition)
    rejected = df.filter(~F.coalesce(condition, F.lit(False)))
    if reason is not None:
        rejected = rejected.withColumn("reject_reason", reason)
    return valid, rejected


def valid_pixels(arr: Column, lo: float = 0.0, hi: float = 2.0e7) -> Column:
    """F5 — Eiger pixel validity: values outside [lo, hi] are zeroed
    (masked/pegged pixels; src/utilities.py:122-126). Pure higher-order
    array expression — JVM-side, no UDF.
    """
    return F.transform(arr, lambda x: F.when((x >= lo) & (x <= hi), x)
                       .otherwise(F.lit(0.0)))


def can_stack(df: DataFrame, required: Sequence[str],
              mask_ok: Column | None = None) -> Column:
    """F4 — canStack: all required value columns present (non-null) and
    the referenced mask exists (pre-joined boolean instead of a
    filesystem check; src/post_translation_operation_hdf5_stacker.py:38-57).
    """
    cond = F.lit(True)
    for c in required:
        cond = cond & F.col(c).isNotNull()
    if mask_ok is not None:
        cond = cond & mask_ok
    return cond
