"""Window operators: batch-max propagation (A4), top-1 per group
(O2/F6), lowest-repetition gate (F6), sessionization (streaming
extension).

Reference parity notes cited per function (file:line into
/root/reference/).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def propagate_group_max(df: DataFrame, keys: Sequence[str],
                        cols: dict[str, str]) -> DataFrame:
    """A4 — write the group-wide max of each value column onto every row.

    Reference: the propagator computes max(transmission_correction_factor)
    and max(scattering_probability_estimate) over all repetitions of a
    batch and writes them into every file
    (src/processstep_transmission_correction_factor_propagator.py:54-81).

    One window (= one shuffle on ``keys``) serves all columns; no
    self-join. At scale this is the minimal data movement for the
    semantics — every row genuinely needs the group value.
    """
    w = Window.partitionBy(*keys)
    out = df
    for src, dst in cols.items():
        out = out.withColumn(dst, F.max(src).over(w))
    return out


def top1_per_group(df: DataFrame, keys: Sequence[str],
                   order_by: Sequence[Column]) -> DataFrame:
    """O2 — deterministic top-1 per group via row_number.

    Reference: nearest-dated mask = argmin of day difference per
    configuration (src/processstep_add_mask_file.py:63-73). Callers must
    pass a total order (include a unique tiebreaker column) for
    deterministic output.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def lowest_repetition_gate(df: DataFrame, keys: Sequence[str],
                           repetition: str = "repetition") -> DataFrame:
    """F6 — keep only the lowest-repetition row of each batch.

    Reference: batch-level steps run once, gated on min(repetition)
    (src/processstep_transmission_correction_factor_propagator.py:25-39).
    In a DataFrame engine a plain groupBy usually replaces this gate; it
    is kept for parity where row-shaped output is needed.
    """
    return top1_per_group(df, keys, [F.col(repetition).asc()])


def sessionize(df: DataFrame, user_col: str, ts_col: str,
               gap_seconds: int = 1800,
               tiebreak: str | None = None) -> DataFrame:
    """Training-data extension — assign session ids per user: a new
    session starts when the gap to the previous event exceeds
    ``gap_seconds``. Two windows over the same (user, ts) partitioning —
    Spark reuses the single sort/shuffle for both. Pass ``tiebreak`` (a
    unique column) to make lag() deterministic at equal timestamps.
    """
    order = [ts_col] + ([tiebreak] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    gap = F.col(ts_col).cast("long") - prev_ts.cast("long")
    is_new = F.when(prev_ts.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0))
    return (df.withColumn("__new", is_new)
            .withColumn("session_seq", F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .drop("__new"))


def funnel_stage(df: DataFrame, user_col: str, ts_col: str,
                 type_col: str, chain: Sequence[str],
                 max_gap: str | None = None) -> DataFrame:
    """Training-data extension — greedy ordered-sequence matching: one
    row per user with the deepest funnel stage reached by walking the
    user's time-sorted events through ``chain`` (each later stage must
    be STRICTLY later than the previous stage's match, and within
    ``max_gap`` — a SQL interval string — when given).

    One shuffle (groupBy user) + a JVM ``aggregate()`` fold over each
    user's sorted (ts, type) sequence: no self-joins, no Python UDF,
    per-user state is one small struct. Strict-inequality comparisons
    make the result independent of intra-timestamp tie order.
    """
    seqs = df.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))))
        .alias("seq"))

    def step(acc, x):
        out = acc
        # Chain built from the last stage down so the lowest matching
        # stage wins, mirroring a single greedy pass.
        for i in reversed(range(len(chain))):
            gate = (acc.stage == i) & (x.et == chain[i])
            if i > 0:
                gate = gate & (x.ts > acc.t)
                if max_gap is not None:
                    gate = gate & (
                        x.ts <= acc.t + F.expr(f"INTERVAL {max_gap}"))
            out = F.when(gate, F.struct(
                F.lit(i + 1).alias("stage"), x.ts.alias("t"))).otherwise(out)
        return out

    init = F.struct(F.lit(0).alias("stage"),
                    F.lit(None).cast("timestamp").alias("t"))
    return seqs.select(
        F.col(user_col),
        F.aggregate("seq", init, step).getField("stage")
        .alias("funnel_stage"))
