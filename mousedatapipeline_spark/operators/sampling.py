"""Deterministic sampling / splitting / packing operators for
training-data curation (beyond-reference mandate).

Everything here is *hash-deterministic*: membership is a pure function
of the row key, never of partitioning, task order, or an RNG seed
lookup. That is the property that matters at 100 TB — a re-run, a
late-arriving partition, or a different executor count must produce the
same sample, and the decision predicate must be a plain column
expression so it is evaluated in the scan stage (no shuffle at all;
filter pushdown keeps the I/O proportional to the *kept* fraction only
when the layout is clustered by the stratum).

Parity design (see plans/catalog.py): both engines compute
``substr(md5(key), 1, 8)`` and compare the lowercase-hex string against
a precomputed 8-hex-digit threshold ``floor(rate * 2^32)``.
Lexicographic order on fixed-width lowercase hex == numeric order, so
no cross-engine hex->int conversion is needed (DuckDB lacks a clean
one). Rate 1.0 short-circuits to TRUE.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket_hex",
    "keep_predicate",
    "keep_predicate_sql",
    "stratified_sample",
    "dataset_split",
    "split_sql_case",
    "pack_sequences",
]


def _threshold_hex(rate: float) -> str:
    """8-hex-digit lowercase threshold for ``P(keep) = rate``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(int(rate * 2**32), "08x")


def hash_bucket_hex(key: Column) -> Column:
    """First 8 hex chars of md5(key) — a uniform 32-bit bucket."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


def keep_predicate(key: Column, rate: float) -> Column:
    """Deterministic Bernoulli(rate) keep decision from a row key."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return hash_bucket_hex(key) < F.lit(_threshold_hex(rate))


def keep_predicate_sql(key_sql: str, rate: float) -> str:
    """DuckDB rendering of :func:`keep_predicate` (same md5 bytes)."""
    if rate >= 1.0:
        return "TRUE"
    if rate <= 0.0:
        return "FALSE"
    return (f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8)"
            f" < '{_threshold_hex(rate)}'")


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates: Mapping[str, float],
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum deterministic downsampling with inverse-rate weights.

    The training-data 'mixing' primitive: rebalance sources/languages by
    keeping stratum ``s`` at ``rates[s]`` and attaching
    ``weight = 1/rate`` so downstream statistics stay unbiased.

    Scale: the predicate is a scan-stage filter — zero shuffles, and at
    100 TB the only cost is the scan itself (or less, with stratum-
    clustered layout + partition pruning).
    """
    keep = F.lit(False)
    weight = F.lit(None).cast("double")
    bucket = hash_bucket_hex(F.col(key))
    for s, rate in rates.items():
        in_s = F.col(stratum) == s
        if rate >= 1.0:
            k = F.lit(True)
        elif rate <= 0.0:
            k = F.lit(False)
        else:
            k = bucket < F.lit(_threshold_hex(rate))
        keep = F.when(in_s, k).otherwise(keep)
        weight = F.when(in_s, F.lit(1.0 / rate if rate > 0 else None)
                        .cast("double")).otherwise(weight)
    if default_rate > 0.0:
        known = F.col(stratum).isin(*rates.keys())
        keep = F.when(~known, keep_predicate(F.col(key), default_rate)) \
            .otherwise(keep)
        weight = F.when(~known, F.lit(1.0 / default_rate).cast("double")) \
            .otherwise(weight)
    return df.filter(keep).withColumn("weight", weight)


# ---------------------------------------------------------------------------
# Train/val/test split: consecutive hash-bucket ranges.
# ---------------------------------------------------------------------------

def _split_bounds(fractions: Mapping[str, float]) -> list[tuple[str, str, str]]:
    """[(name, lo_hex, hi_hex)] cumulative bucket ranges, order-stable."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for i, name in enumerate(names):
        lo = _threshold_hex(acc)
        acc = min(acc + fractions[name], 1.0)
        # last split absorbs rounding: open upper bound
        hi = "g" if i == len(names) - 1 else _threshold_hex(acc)
        out.append((name, lo, hi))
    return out


def dataset_split(df: DataFrame, key: str,
                  fractions: Mapping[str, float]) -> DataFrame:
    """Assign every row to exactly one named split, deterministically.

    ``fractions`` is ordered (e.g. ``{'train': .8, 'val': .1,
    'test': .1}``); buckets are consecutive md5 ranges so adding a new
    row never moves an existing one between splits.
    """
    bucket = hash_bucket_hex(F.col(key))
    expr = None
    for name, lo, hi in _split_bounds(fractions):
        cond = (bucket >= F.lit(lo)) & (bucket < F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def split_sql_case(key_sql: str, fractions: Mapping[str, float]) -> str:
    """DuckDB CASE expression mirroring :func:`dataset_split`."""
    h = f"substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8)"
    arms = [f"WHEN {h} >= '{lo}' AND {h} < '{hi}' THEN '{name}'"
            for name, lo, hi in _split_bounds(fractions)]
    return "CASE " + " ".join(arms) + " END"


# ---------------------------------------------------------------------------
# Sequence packing: concat-then-chunk context-window assignment.
# ---------------------------------------------------------------------------

def pack_sequences(df: DataFrame, group: Sequence[str], order: str,
                   tokens: str, budget: int) -> DataFrame:
    """Assign documents to fixed-size context windows (concat-then-chunk).

    Documents are laid out end-to-end per ``group`` in ``order``; a
    document belongs to the chunk its FIRST token falls in:
    ``chunk_id = floor((cumsum - tokens) / budget)``. This is the
    packing strategy of GPT-style pretraining loaders (concatenate,
    then slice fixed windows) — unlike greedy first-fit bin packing it
    is a pure window expression: one shuffle on the group key, no
    sequential driver loop, identical result at any parallelism.

    Returns the input plus ``chunk_id`` (bigint) and ``tok_start``
    (bigint, 0-based offset of the doc inside its group's token tape).
    """
    w = (Window.partitionBy(*group).orderBy(order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(tokens)).over(w)
    start = (cum - F.col(tokens)).cast("bigint")
    return (df.withColumn("tok_start", start)
            .withColumn("chunk_id",
                        F.floor(F.col("tok_start") / budget).cast("bigint")))


def exact_k_per_stratum(df: DataFrame, key: str, stratum: str,
                        k: int) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, deterministically.

    Rows are ranked inside each stratum by md5(key) — a uniform random
    order that is a pure function of the data — and the first k kept.
    Unlike rate-based sampling (:func:`stratified_sample`) the output
    size is exact, and unlike reservoir sampling it needs no stateful
    pass: one window shuffle on the stratum key. Ties are impossible
    on the full 32-hex digest unless keys collide md5, so membership
    is stable across partitionings and engines.
    """
    w = Window.partitionBy(stratum) \
        .orderBy(F.md5(F.col(key).cast("string")), F.col(key))
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .drop("_rk"))
