"""Deduplication & similarity-search operators: character-shingling,
MinHash+LSH, SimHash, and exact embedding cosine — the dedup layer of a
training-data pipeline (SURVEY.md beyond-reference mandate).

Everything is built from relational primitives (explode → hash → groupBy
→ self-join) with pure modular-integer hashing and decimal-accumulated
float sums, so results are deterministic, engine-portable (the DuckDB
oracles reproduce them exactly), and partition-independent.

Scale design:
- Shingle/minhash/simhash computation is a narrow explode + groupBy —
  one shuffle keyed by doc, map-side combined, no UDFs.
- Candidate generation joins are *blocked* (by lang/source or LSH
  bucket): the all-pairs quadratic blowup is bounded by the largest
  block, which the caller controls. This is the standard LSH contract:
  at 100 TB you never join document-to-document directly, only within
  band-signature buckets.
- Embedding dot products explode to (vec, dim) rows and aggregate with
  decimal sums: exact, shuffle-friendly, and skew-free (the `dim` join
  key is uniform by construction).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31 - 1

# Deterministic MinHash permutation parameters, shared with the SQL
# oracles via `minhash_params_sql()`.
N_PERM = 16
N_BANDS = 4
ROWS_PER_BAND = N_PERM // N_BANDS
MINHASH_A = tuple((2 * i + 1) * 1_103_515_245 % MOD for i in range(N_PERM))
MINHASH_B = tuple((i * 12_345 + 6_789) * 2_654_435_761 % MOD
                  for i in range(N_PERM))

SIMHASH_BITS = 16


def minhash_params_sql() -> str:
    """``(VALUES ...) AS p(i, a, b)`` rows for the DuckDB oracle."""
    rows = ", ".join(
        f"({i}::BIGINT, {a}::BIGINT, {b}::BIGINT)"
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B)))
    return f"(VALUES {rows}) AS p(i, a, b)"


def bit_weights_sql(n_bits: int = SIMHASH_BITS) -> str:
    rows = ", ".join(f"({j}, {1 << j})" for j in range(n_bits))
    return f"(VALUES {rows}) AS bw(j, w)"


def shingles(df: DataFrame, text_col: str, id_cols: Sequence[str],
             n: int = 3) -> DataFrame:
    """Distinct character n-gram shingles per document.

    Explode-only (no shuffle until the consumer's distinct/groupBy);
    documents shorter than ``n`` produce no shingles.
    """
    ids = list(id_cols)
    pos = F.explode(
        F.when(F.length(text_col) >= n,
               F.sequence(F.lit(1), F.length(text_col) - (n - 1)))
        .otherwise(F.array().cast("array<int>"))).alias("pos")
    return (
        df.select(*ids, F.col(text_col), pos)
        .select(*ids,
                F.substring(F.col(text_col), F.col("pos"), n).alias("shingle"))
        .distinct()
    )


def shingle_hash(shingle: Column) -> Column:
    """3-char shingle → bigint, pure codepoint arithmetic (identical in
    Spark and DuckDB: ascii() is the first codepoint in both)."""
    return (
        F.ascii(F.substring(shingle, 1, 1)).cast("bigint") * 923_521
        + F.ascii(F.substring(shingle, 2, 1)).cast("bigint") * 961
        + F.ascii(F.substring(shingle, 3, 1)).cast("bigint") * 31
    ) % MOD


SHINGLE_HASH_SQL = ("(ascii(substr(shingle, 1, 1)) * 923521 "
                    "+ ascii(substr(shingle, 2, 1)) * 961 "
                    "+ ascii(substr(shingle, 3, 1)) * 31) % 2147483647")


def minhash_signature(sh: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """(id_cols, i, mh): MinHash value for each of N_PERM permutations.

    One explode (×N_PERM) + one groupBy shuffle on the doc key with
    map-side MIN combine — the canonical scalable formulation.
    """
    ids = list(id_cols)
    params = F.explode(F.array(*[
        F.struct(F.lit(i).alias("i"),
                 F.lit(MINHASH_A[i]).alias("a"),
                 F.lit(MINHASH_B[i]).alias("b"))
        for i in range(N_PERM)])).alias("p")
    hashed = sh.withColumn("h", shingle_hash(F.col("shingle")))
    expanded = hashed.select(*ids, "h", params).select(
        *ids, F.col("p.i").alias("i"),
        ((F.col("p.a") * F.col("h") + F.col("p.b")) % MOD).alias("ph"))
    return expanded.groupBy(*ids, "i").agg(F.min("ph").alias("mh"))


def band_signatures(sig: DataFrame, id_cols: Sequence[str]) -> DataFrame:
    """(id_cols, band, band_sig): LSH band signature strings — documents
    sharing any (band, band_sig) bucket are near-dup candidates."""
    ids = list(id_cols)
    banded = sig.withColumn("band", (F.col("i") / ROWS_PER_BAND).cast("int"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "mh"))),
        lambda s: s["mh"].cast("string"))
    return banded.groupBy(*ids, "band").agg(
        F.concat_ws("-", ordered).alias("band_sig"))


def simhash(df: DataFrame, id_cols: Sequence[str], token_col: str = "token",
            count_col: str = "n", n_bits: int = SIMHASH_BITS) -> DataFrame:
    """(id_cols, simhash): count-weighted SimHash over hashed tokens.

    Input: one row per (doc, token) with a count column and a bigint
    ``th`` token-hash column. Explodes ×n_bits then two groupBy passes;
    all-integer arithmetic so bit decisions are exact.
    """
    ids = list(id_cols)
    bits = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"), F.lit(1 << j).alias("w"))
        for j in range(n_bits)])).alias("b")
    th16 = (F.col("th") % (1 << n_bits)).alias("th16")
    expanded = df.select(*ids, F.col(count_col).alias("__n"), th16, bits)
    contrib = expanded.select(
        *ids, "b.j", "b.w",
        (F.col("__n") * (
            (F.floor(F.col("th16") / F.col("b.w")) % 2) * 2 - 1))
        .alias("c"))
    per_bit = contrib.groupBy(*ids, "j", "w").agg(F.sum("c").alias("s"))
    return per_bit.groupBy(*ids).agg(
        F.sum(F.when(F.col("s") > 0, F.col("w")).otherwise(F.lit(0)))
        .cast("bigint").alias("simhash"))


def vector_dims(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, v): one row per vector component, dim 1-based, value
    cast float→double (exact) so downstream products match any engine."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).select(
        F.col(id_col), (F.col("pos") + 1).alias("dim"),
        F.col("v").cast("double").alias("v"))


def vector_norms(dims: DataFrame, id_col: str) -> DataFrame:
    """(id, norm): L2 norm via exact decimal sum of squares."""
    return dims.groupBy(id_col).agg(
        F.sqrt(F.sum((F.col("v") * F.col("v")).cast("decimal(30,10)"))
               .cast("double")).alias("norm"))


def cosine_pairs(q_dims: DataFrame, c_dims: DataFrame,
                 q_norms: DataFrame, c_norms: DataFrame,
                 qid: str = "qid", cid: str = "cid") -> DataFrame:
    """(qid, cid, cosine): exact cosine for every (query, candidate)
    pair present in both dim tables. The join key is ``dim`` plus
    whatever blocking the caller pre-applied; sums are decimal-exact."""
    dots = (
        q_dims.join(c_dims, "dim")
        .groupBy(qid, cid)
        .agg(F.sum((F.col("qv") * F.col("cv")).cast("decimal(30,10)"))
             .cast("double").alias("dot")))
    return (
        dots.join(q_norms, qid).join(c_norms, cid)
        .withColumn(
            "cosine",
            F.when((F.col("qnorm") > 0) & (F.col("cnorm") > 0),
                   F.col("dot") / (F.col("qnorm") * F.col("cnorm")))
            .otherwise(F.lit(0.0))))
