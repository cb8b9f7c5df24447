"""Mergeable frequency/cardinality sketches as pure column arithmetic.

Beyond-reference (SURVEY §2 extension): a 100-TB curation pipeline needs
corpus-wide term statistics — heavy hitters, distinct counts — without
carrying per-term state through a shuffle. Both sketches here are the
classic fixed-size mergeable summaries:

- **Count-min sketch** (Cormode & Muthukrishnan 2005): a ``d x w``
  counter grid; ``est(x) = min_j grid[j][h_j(x)]``, always >= the true
  count. The grid is LINEAR in the input stream (counts add), so a
  sketch built from pre-aggregated (term, count) rows is bit-identical
  to one built from the raw token stream — and per-partition sketches
  merge by element-wise sum. State is O(d*w), independent of corpus
  size.
- **HLL-style register estimator** (Flajolet-Martin / HyperLogLog): m
  registers, each the max trailing-zero rank of hashes landing in it;
  ``est = alpha_m * m^2 / sum_j 2^(-M_j)``. ``max`` is idempotent and
  commutative, so registers partial-aggregate map-side and merge by
  element-wise max. State is O(m) per group.

Everything is deterministic modular-integer arithmetic + IEEE
primitives, expressible identically in Spark and the DuckDB oracles
(the ``*_sql`` twins), so the driver's value hash can gate them.
The only float steps — ``2^(-M_j)`` sums and one multiply/divide — are
exact or order-insensitive: the register terms are powers of two in
``[2^-26, 1]`` whose partial sums stay within 53 significand bits, so
reassociation cannot change the result.

No counterpart in the reference (it has no sketch layer); cited as the
scale path the reference's exact-pandas aggregations
(``/root/reference/src/processstep_stacker.py``) cannot take.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31 - 1, shared with operators.similarity

# Knuth multiplicative constant, pre-reduced so the hash below is
# modulo-FIRST: ((u % MOD) * KNUTH_RED + off) % MOD has largest
# intermediate (MOD-1)*KNUTH_RED < 2^60 — overflow-proof for EVERY
# bigint user_id.  The naive ``u * 2654435761 % MOD`` silently wraps
# in Spark (ANSI off) past u ~ 3.5e9 while the DuckDB oracle raises —
# the same divergence class packed_occurrence_key guards loudly
# (ADVICE r05).  Mathematically identical: (u*K) % m == ((u%m)*(K%m)) % m.
KNUTH_RED = 2_654_435_761 % MOD  # = 506_952_114


def user_hash(col: Column, offset: int = 0) -> Column:
    """Knuth multiplicative user hash into [0, MOD), modulo-first."""
    return ((col % MOD) * F.lit(KNUTH_RED) + F.lit(offset)) % MOD


def user_hash_sql(expr: str, offset: int = 0) -> str:
    """DuckDB twin of :func:`user_hash` (same modulo-first form)."""
    return f"((({expr}) % {MOD}) * {KNUTH_RED} + {offset}) % {MOD}"

# --- count-min parameters (d rows x w buckets) -------------------------
CMS_D = 4
CMS_W = 512
CMS_A = tuple((2 * j + 3) * 1_103_515_245 % MOD for j in range(CMS_D))
CMS_B = tuple((j * 54_321 + 987) * 2_654_435_761 % MOD for j in range(CMS_D))

# --- HLL parameters ----------------------------------------------------
HLL_M = 64            # registers
HLL_ALPHA = 0.709     # alpha_64 (Flajolet et al. 2007, m = 64)
# hash residue after the register index is peeled off: h DIV m < 2^25,
# so trailing-zero rank is in [1, 25]; rank 26 marks residue == 0.
_HLL_MAX_RHO = 26


def string_hash(col: Column) -> Column:
    """Full-string modular hash: left fold ``acc -> (acc*131 + cp) % MOD``
    over the codepoints, seeded 7. Pure integer arithmetic — bit-identical
    in Spark and DuckDB (:func:`string_hash_sql`)."""
    folded = F.aggregate(
        F.sequence(F.lit(1), F.length(col)),
        F.lit(7).cast("bigint"),
        lambda acc, i: (acc * 131 + F.ascii(F.substring(col, i, 1))) % MOD)
    # Spark's sequence(1, 0) DESCENDS ([1, 0]) instead of being empty;
    # guard zero-length inputs so '' folds to the seed like DuckDB's
    # empty range does.
    return F.when(F.length(col) > 0, folded).otherwise(F.lit(7).cast("bigint"))


def string_hash_sql(expr: str) -> str:
    """DuckDB twin of :func:`string_hash` (list_reduce over codepoints,
    seeded by list_prepend so empty strings still fold to 7)."""
    return (f"list_reduce(list_prepend(7::BIGINT, "
            f"[(ascii(substr({expr}, i, 1)))::BIGINT "
            f"for i in range(1, len({expr}) + 1)]), "
            f"(acc, x) -> (acc * 131 + x) % {MOD})")


def cms_bucket(h: Column, j: int) -> Column:
    """Row-j bucket of hash ``h``: ``((a_j*h + b_j) % MOD) % W``."""
    return ((F.lit(CMS_A[j]) * h + F.lit(CMS_B[j])) % F.lit(MOD)) % F.lit(CMS_W)


def cms_bucket_sql(h_expr: str, j: int) -> str:
    return f"(({CMS_A[j]}::BIGINT * {h_expr} + {CMS_B[j]}) % {MOD}) % {CMS_W}"


def cms_build(counts: DataFrame, hash_col: str, count_col: str) -> DataFrame:
    """(j, bucket, cnt): the count-min grid from (hash, count) rows.

    Accepts PRE-AGGREGATED counts — by linearity this equals the sketch
    of the raw stream, and the input shuffle is the caller's exact
    groupBy (already paid). The explode is x CMS_D over the *distinct*
    key set only; the grid agg partial-aggregates map-side into at most
    d*w = 2048 cells per partition.
    """
    h = F.col(hash_col)
    rows = F.array(*[
        F.struct(F.lit(j).cast("int").alias("j"),
                 cms_bucket(h, j).alias("bucket"))
        for j in range(CMS_D)])
    return (
        counts.select(F.col(count_col).alias("_c"),
                      F.explode(rows).alias("r"))
        .groupBy(F.col("r.j").alias("j"), F.col("r.bucket").alias("bucket"))
        .agg(F.sum("_c").cast("bigint").alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, sketch: DataFrame, hash_col: str,
                 key_cols: list[str]) -> DataFrame:
    """min-over-rows point estimate for each candidate key.

    The sketch side is at most ``d*w`` rows — broadcast it; the probe is
    then a scan-stage hash lookup per (candidate, j).
    """
    h = F.col(hash_col)
    rows = F.array(*[
        F.struct(F.lit(j).cast("int").alias("j"),
                 cms_bucket(h, j).alias("bucket"))
        for j in range(CMS_D)])
    probes = candidates.select(*key_cols, F.explode(rows).alias("r")) \
        .select(*key_cols, F.col("r.j").alias("j"),
                F.col("r.bucket").alias("bucket"))
    # LEFT join + coalesce-to-0: the grid only materializes non-empty
    # cells, and an empty cell means "count 0" — an inner join would
    # drop never-seen candidate keys entirely (instead of est=0) and
    # min() over only the non-empty cells would overestimate.
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(*key_cols)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
             .cast("bigint").alias("cms_est"))
    )


def _rho_chain_sql(v_expr: str) -> str:
    """CASE chain: trailing-zero rank of ``v`` (+1), 26 when v = 0.

    ``v % 2^k = 2^(k-1)`` <=> exactly k-1 trailing zeros. A generated
    WHEN chain keeps the arithmetic to integer modulo — no log2/libm
    (whose float results differ across engines at exact powers of two).
    """
    whens = " ".join(
        f"WHEN {v_expr} % {1 << k} = {1 << (k - 1)} THEN {k}"
        for k in range(1, _HLL_MAX_RHO))
    return f"CASE WHEN {v_expr} = 0 THEN {_HLL_MAX_RHO} {whens} END"


def rho(v: Column) -> Column:
    """Spark twin of :func:`_rho_chain_sql`."""
    out = F.when(v == 0, F.lit(_HLL_MAX_RHO))
    for k in range(1, _HLL_MAX_RHO):
        out = out.when(v % (1 << k) == (1 << (k - 1)), F.lit(k))
    return out.cast("int")


def hll_registers(df: DataFrame, hash_col: str,
                  group_cols: list[str]) -> DataFrame:
    """(group_cols..., reg, max_rho): the register table.

    One groupBy whose ``max`` partial-aggregates map-side — the shuffle
    carries at most ``m`` rows per group per partition regardless of
    input size. Duplicate elements are free (max is idempotent), so no
    distinct pass is needed.
    """
    h = F.col(hash_col)
    reg = (h % F.lit(HLL_M)).cast("int").alias("reg")
    v = F.floor(h / F.lit(HLL_M)).cast("bigint")
    return (
        df.select(*group_cols, reg, rho(v).alias("r"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("r").alias("max_rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """``alpha * m^2 / (sum_present 2^-M_j + n_absent * 1.0)`` as an
    aggregated DataFrame over the register table.

    Absent registers contribute ``2^0 = 1`` each. All addends are exact
    powers of two in [2^-26, 1]; their sums are exactly representable,
    so the float total is reassociation-proof (see module docstring).
    Raw estimator only — no small-range linear-counting correction,
    which needs ``ln`` (libm, engine-divergent).
    """
    present = F.count(F.lit(1))
    # 2^-rho as 1.0 / (1 << rho): shift + divide are exact IEEE ops in
    # both engines (libm pow is not guaranteed bit-identical).
    # (F.shiftleft only takes a literal bit count; the SQL form takes a
    # column.)
    term = F.expr("1.0 / cast(shiftleft(cast(1 as bigint), max_rho) "
                  "as double)")
    inv_sum = F.sum(term) + (F.lit(float(HLL_M)) - present.cast("double"))
    return registers.groupBy(*group_cols).agg(
        (F.lit(HLL_ALPHA * HLL_M * HLL_M) / inv_sum).alias("hll_est_raw"))


def hll_registers_sql(hash_expr: str) -> tuple[str, str]:
    """(reg_expr, rho_expr) for the DuckDB oracle over a hash column."""
    reg = f"({hash_expr} % {HLL_M})"
    v = f"({hash_expr} // {HLL_M})"
    return reg, _rho_chain_sql(v)


HLL_EST_SQL = (
    f"{HLL_ALPHA * HLL_M * HLL_M} / "
    f"(SUM(1.0 / CAST(1::BIGINT << max_rho AS DOUBLE)) "
    f"+ ({float(HLL_M)} - CAST(COUNT(*) AS DOUBLE)))")
