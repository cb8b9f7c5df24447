"""Hand-rolled Bloom filter as pure Spark expressions.

OSS Spark keeps its runtime bloom filters (bloom_filter_agg /
might_contain) internal to the optimizer, so this module provides the
same mechanism as library code: build the bit array from a (small)
key DataFrame, collect it into an ``array<long>`` literal, and test
membership with scan-stage bit arithmetic — no UDF, no shuffle on the
probe side.

Guarantees: no false negatives (every inserted key tests positive);
false positives at the usual Bloom rate, so callers needing exactness
confirm survivors with an exact (broadcast) semi-join — the pre-filter
just shrinks the joined volume (see plans/decontam_queries.s18).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 1 << 16   # 64 Kbit -> 1024 longs, ~8 KB literal
DEFAULT_K = 5

_LONG_MIN = -(1 << 63)


def _array_literal(vals) -> Column:
    """``array<bigint>`` literal from Python ints via ONE parsed
    expression string (r10 optimization, guide §5 driver / §7.3).

    ``F.array(*[F.lit(v).cast("bigint") for v in vals])`` costs two
    py4j round-trips per element — measured ~3 s of DRIVER time for
    the 1024-word default filter, re-paid on every query construction
    — and drags a 1024-child CreateArray through analysis and
    constant-folding on every execution (the s18 stage profile showed
    a 2.9 s driver gap against 0.9 s of stage work). One ``F.expr``
    string parses JVM-side in ~4 ms and folds to the identical
    ``array<bigint>`` literal.  Long.MIN_VALUE has no negative-decimal
    literal form in SparkSQL (the parser reads ``-`` as unary minus on
    an out-of-range positive), so that one word is emitted as the
    foldable ``shiftleft(1L, 63)`` with the same bit pattern.
    """
    parts = [f"{int(v)}L" if int(v) != _LONG_MIN else "shiftleft(1L, 63)"
             for v in vals]
    return F.expr("array(" + ",".join(parts) + ")")


def _position(col: Column, i: int, bits: int) -> Column:
    return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(bits))


def bloom_bits_literal(keys: DataFrame, col: str,
                       bits: int = DEFAULT_BITS,
                       k: int = DEFAULT_K) -> Column:
    """Aggregate ``keys[col]`` into a Bloom bit array and return it as
    a dense ``array<long>`` literal (length ``bits/64``).

    The build is one small aggregation (distinct keys x k positions ->
    <= bits/64 words) followed by a driver collect of at most
    ``bits/64`` rows — the same cost class as a broadcast.
    """
    pos = keys.select(F.explode(F.array(*[
        _position(F.col(col), i, bits) for i in range(k)
    ])).alias("pos"))
    words = (pos
             .select(F.expr("CAST(pos DIV 64 AS INT) AS w"),
                     F.expr("shiftleft(CAST(1 AS BIGINT),"
                            " CAST(pos % 64 AS INT)) AS mask"))
             .groupBy("w").agg(F.expr("bit_or(mask) AS bits")))
    word_map = {r["w"]: r["bits"] for r in words.collect()}
    return _array_literal(word_map.get(w, 0) for w in range(bits >> 6))


def _pow2_literal() -> Column:
    """array<long> of the 64 single-bit masks (bit 63 as the signed
    long whose two's-complement pattern is 0x8000...0 — identical to
    SQL shiftleft(1, 63) on the build side)."""
    vals = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]
    return _array_literal(vals)


def might_contain(blit: Column, col: str | Column,
                  bits: int = DEFAULT_BITS,
                  k: int = DEFAULT_K) -> Column:
    """Boolean scan-stage expression: all ``k`` bits set for ``col``
    in the bloom literal ``blit``. Pure Column arithmetic — the bit
    mask is an element_at into a 64-long powers-of-two literal, so the
    position hash has a single definition shared with the build path
    (whole-stage codegen's subexpression elimination evaluates it once
    per probe bit)."""
    c = F.col(col) if isinstance(col, str) else col
    pow2 = _pow2_literal()
    out = None
    for i in range(k):
        p = _position(c, i, bits)
        # shiftright(p, 6) == p DIV 64 for non-negative p (pmod output)
        # — the same exact integer arithmetic as the build side's
        # `pos DIV 64`, so build and probe share one word-index
        # definition (no float-division round-trip in the guarantee).
        word = F.element_at(blit, F.shiftright(p, 6).cast("int")
                            + F.lit(1))
        mask = F.element_at(pow2, F.pmod(p, F.lit(64)).cast("int")
                            + F.lit(1))
        check = word.bitwiseAND(mask) != 0
        out = check if out is None else out & check
    return out
