"""Semantics pins for the corpus-hygiene operators (t10/t11/t12,
s16/s17): chunking edge cases, decontamination on planted overlaps,
coverage monotonicity, mixing-weight invariants, and shuffle
determinism."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from mousedatapipeline_spark.operators import text as T
from mousedatapipeline_spark.plans import decontam_queries as DQ
from mousedatapipeline_spark.plans.catalog import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")
_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")


def test_chunk_hashes_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b"), (3, "")], ["i", "text"])
    out = df.select(
        "i", F.size(T.chunk_hashes(T.tokens(F.col("text")), 2))
        .alias("n")).collect()
    got = {r["i"]: r["n"] for r in out}
    # 5 tokens / chunk=2 -> 2 full chunks, trailing token dropped;
    # exactly one chunk at size==n; empty text -> no chunks.
    assert got == {1: 2, 2: 1, 3: 0}


def test_chunk_hashes_identical_spans_collide(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w")], ["i", "text"])
    rows = df.select(
        T.chunk_hashes(T.tokens(F.col("text")), 4).alias("c")).collect()
    assert rows[0]["c"] == rows[1]["c"] and len(rows[0]["c"]) == 1


def test_decontamination_planted_overlap(spark):
    # doc 10 is "eval" (10 % 10 == 0); doc 11 copies it verbatim ->
    # fully contaminated; doc 13 shares nothing -> zero hits.
    shared = "alpha beta gamma delta epsilon zeta"
    docs = [(10, shared), (11, shared),
            (13, "one two three four five six seven")]
    spark.createDataFrame(docs, ["doc_id", "text"]) \
        .createOrReplaceTempView("documents")
    d = spark.table("documents")
    grams = F.array_distinct(
        T.ngrams_from_tokens(T.tokens(F.col("text")), DQ.NGRAM))
    ex = d.select("doc_id", F.explode(grams).alias("gram"))
    ev = (ex.filter(F.col("doc_id") % DQ.EVAL_MOD == 0)
          .select("gram").distinct().withColumn("hit", F.lit(1)))
    per = (ex.filter(F.col("doc_id") % DQ.EVAL_MOD != 0)
           .join(F.broadcast(ev), "gram", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum("hit"), F.lit(0)).alias("hits")))
    got = {r["doc_id"]: (r["n"], r["hits"]) for r in per.collect()}
    assert got[11][0] == got[11][1] > 0   # verbatim copy: all grams hit
    assert got[13] == (3, 0)              # 7 tokens -> 3 grams, 0 hits


@_needs_data
def test_t10_excludes_eval_docs(spark):
    out = all_queries()["t10_decontamination"].spark(spark, SF_DIR)
    assert out.filter(F.col("doc_id") % DQ.EVAL_MOD == 0).count() == 0
    bad = out.filter((F.col("n_hit") > F.col("n_grams"))
                     | (F.col("contamination") < 0)
                     | (F.col("contamination") > 1))
    assert bad.count() == 0


@_needs_data
def test_t11_dup_fraction_bounded_and_consistent(spark):
    out = all_queries()["t11_span_dedup"].spark(spark, SF_DIR)
    bad = out.filter((F.col("n_dup_chunks") > F.col("n_chunks"))
                     | (F.col("n_chunks") <= 0))
    assert bad.count() == 0


@_needs_data
def test_t12_coverage_monotone_to_one(spark):
    rows = (all_queries()["t12_vocab_coverage"].spark(spark, SF_DIR)
            .orderBy("rank").collect())
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    cov = [r["cum_coverage"] for r in rows]
    assert all(b >= a for a, b in zip(cov, cov[1:]))
    assert cov[-1] <= 1.0 + 1e-9
    # counts ordered by the ranking key
    ns = [r["n"] for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


@_needs_data
def test_s16_mix_invariants(spark):
    rows = all_queries()["s16_temperature_mix"].spark(spark, SF_DIR) \
        .collect()
    probs = [r["mix_prob"] for r in rows]
    assert abs(sum(probs) - 1.0) < 1e-4
    # temperature mixing boosts small sources above natural frequency;
    # with uniform source sizes every boost is exactly 1.0.
    small = min(rows, key=lambda r: r["n_docs"])
    big = max(rows, key=lambda r: r["n_docs"])
    if small["n_docs"] < big["n_docs"]:
        assert small["boost"] > big["boost"]
    else:
        assert all(math.isclose(r["boost"], 1.0, rel_tol=1e-5)
                   for r in rows)
    for r in rows:
        assert math.isclose(r["w_raw"], math.sqrt(r["n_docs"]),
                            rel_tol=1e-5)


@_needs_data
def test_s17_shuffle_deterministic_and_dense(spark):
    q = all_queries()["s17_shuffle_shards"].spark
    a = {(r["doc_id"], r["shard"], r["pos"], r["interleaved_pos"])
         for r in q(spark, SF_DIR).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"], r["interleaved_pos"])
         for r in q(spark, SF_DIR).repartition(7).collect()}
    assert a == b  # partitioning-independent
    # per-shard positions are dense 1..n
    by_shard: dict[str, list[int]] = {}
    for _, shard, pos, _ in a:
        by_shard.setdefault(shard, []).append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # interleaved positions never collide
    inter = [i for _, _, _, i in a]
    assert len(set(inter)) == len(inter)


# --- remove_duplicate_spans (t26, Lee-et-al-style substring removal) ------

def _rds(spark, docs, **kw):
    df = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    out = T.remove_duplicate_spans(df, chunk=2, min_run=2, **kw)
    return {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in out.collect()}


def test_substring_removal_keeps_first_occurrence(spark):
    # chunk=2, min_run=2 => a removable span is >= 2 consecutive
    # duplicated 2-token chunks. Doc 2 repeats doc 1's first 4 tokens
    # (chunks [a b][c d]) verbatim at chunk-aligned positions.
    docs = [(1, "a b c d x y"), (2, "a b c d p q")]
    got = _rds(spark, docs)
    assert got[1] == (6, 0, "a b c d x y")       # first occurrence kept
    assert got[2] == (6, 4, "p q")               # run of 2 chunks removed


def test_substring_removal_short_run_kept(spark):
    # Only ONE duplicated chunk (< min_run) => nothing removed.
    docs = [(1, "a b x x"), (2, "a b z w")]
    got = _rds(spark, docs)
    assert got[2] == (4, 0, "a b z w")


def test_substring_removal_within_doc_repeat(spark):
    # The same doc repeating its own chunks: first instance kept,
    # later run removed (corpus order is (doc_id, position)).
    docs = [(1, "a b c d a b c d")]
    got = _rds(spark, docs)
    assert got[1] == (8, 4, "a b c d")


def test_substring_removal_tail_tokens_survive(spark):
    # Trailing tokens that never filled a chunk are never removed,
    # even when every full chunk goes.
    docs = [(1, "a b c d"), (2, "a b c d z")]
    got = _rds(spark, docs)
    assert got[2] == (5, 4, "z")


def test_packed_key_out_of_range_fails_loudly_both_engines(spark):
    """With ANSI off, doc_id * 1e9 + idx would WRAP silently past
    doc_id ~ 9.2e9 (and idx >= 1e9 would alias into the next doc's
    key range with no overflow at all) — mis-ordering the corpus-wide
    earliest-occurrence MIN with no error. The guard inside the
    consumed key expression must raise instead, in BOTH engines."""
    import duckdb

    bad_doc = T._OCC_DOC_MAX + 1
    docs = [(bad_doc, "a b c d a b c d")]
    df = spark.createDataFrame(docs, "doc_id: bigint, text: string")
    with pytest.raises(Exception, match="packed occurrence key"):
        T.remove_duplicate_spans(df, chunk=2, min_run=2).collect()

    con = duckdb.connect()
    sql = ("SELECT " + T.packed_occurrence_key_sql("doc_id", "j")
           + f" FROM (VALUES (CAST({bad_doc} AS BIGINT), 0)) t(doc_id, j)")
    with pytest.raises(Exception, match="packed occurrence key"):
        con.execute(sql).fetchall()
    # in-range keys still pack exactly
    ok = ("SELECT " + T.packed_occurrence_key_sql("doc_id", "j")
          + " FROM (VALUES (CAST(7 AS BIGINT), 3)) t(doc_id, j)")
    assert con.execute(ok).fetchall() == [(7 * T._OCC_KEY_SPAN + 3,)]


def test_e22_weight_modulo_first_matches_and_guards(spark):
    """The bootstrap weight hash is modulo-first: identical values to
    the naive (event_id*C+k)%P form for every event_id >= 0, but its
    largest intermediate is (P-1)^2 < 2^63-1 so it cannot wrap BIGINT
    at any id magnitude. Negative ids raise in both engines."""
    import duckdb

    from mousedatapipeline_spark.plans.events_queries import (
        _E22_P, _e22_w_sql, _e22_weight)

    big = 9_223_372_036_854_775_807  # would overflow the naive form
    ids = [0, 1, 12345, 130_000_000, 10**12, big]
    df = spark.createDataFrame([(i,) for i in ids], "event_id: bigint")
    got = {r.event_id: (r.w0, r.w31) for r in df.select(
        "event_id", _e22_weight(0).alias("w0"),
        _e22_weight(31).alias("w31")).collect()}
    con = duckdb.connect()
    for i in ids:
        naive = {}
        for k in (0, 31):
            c = (2 * k + 3) * 1103515245
            if i * c + k < 2**63:  # naive form only defined in-range
                h = ((i * c + k) % _E22_P) % 4
                naive[k] = 0 if h == 0 else (2 if h == 1 else 1)
        want = con.execute(
            f"SELECT {_e22_w_sql(0)} AS w0, {_e22_w_sql(31)} AS w31 "
            f"FROM (VALUES (CAST({i} AS BIGINT))) t(event_id)").fetchone()
        assert got[i] == tuple(want), i
        if 0 in naive:
            assert got[i][0] == naive[0], i
        if 31 in naive:
            assert got[i][1] == naive[31], i

    neg = spark.createDataFrame([(-5,)], "event_id: bigint")
    with pytest.raises(Exception, match="negative event_id"):
        neg.select(_e22_weight(3).alias("w")).collect()
    with pytest.raises(Exception, match="negative event_id"):
        con.execute(f"SELECT {_e22_w_sql(3)} FROM (VALUES "
                    f"(CAST(-5 AS BIGINT))) t(event_id)").fetchall()


def test_e22_weights_array_matches_scalar_form(spark):
    """The staged array form (one transform over the multiplier
    literal, what e22/w13 actually aggregate) is value-identical to
    the per-replica scalar reference form for every k, and keeps the
    negative-id raise."""
    from mousedatapipeline_spark.plans.events_queries import (
        _E22_B, _e22_weight, _e22_weights_col)

    ids = [0, 1, 12345, 130_000_000, 10**12,
           9_223_372_036_854_775_807]
    df = spark.createDataFrame([(i,) for i in ids], "event_id: bigint")
    scalar = df.select(
        "event_id", F.array(*[_e22_weight(k) for k in range(_E22_B)])
        .alias("wts"))
    arr = df.select("event_id", _e22_weights_col().alias("wts"))
    got = {r.event_id: r.wts for r in arr.collect()}
    want = {r.event_id: r.wts for r in scalar.collect()}
    assert got == want
    assert all(len(v) == _E22_B for v in got.values())

    neg = spark.createDataFrame([(-7,)], "event_id: bigint")
    with pytest.raises(Exception, match="negative event_id"):
        neg.select(_e22_weights_col().alias("w")).collect()


def test_substring_removal_matches_pure_python_brute_force(spark):
    """Randomized triangulation of the WHOLE t26 span-removal pipeline
    (tokenize -> md5 chunk hashes -> corpus-first occurrence ->
    gaps-and-islands runs -> reconstruction) against an independent
    pure-Python implementation.  The hand-crafted cases above pin the
    named semantics; this one walks 40 random docs built from a shared
    segment pool (aligned AND misaligned repeats) and demands exact
    equality of (n_tokens, n_removed, clean_text) per doc."""
    import hashlib
    import random
    from collections import defaultdict

    rng = random.Random(42)
    chunk, min_run = 8, 2
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    segments = [" ".join(rng.choice(vocab) for _ in range(chunk))
                for _ in range(10)]
    docs = {}
    for did in range(40):
        parts = [segments[rng.randrange(len(segments))]
                 for _ in range(rng.randrange(1, 6))]
        text = " ".join(parts)
        if did % 4 == 0:      # misalign: chunks straddle segment bounds
            text = "pre fix tok " + text
        if did % 7 == 0:      # ragged tail dropped by chunking
            text += " tail" + str(did)
        docs[did] = text

    def ref(docs):
        toks = {d: [t for t in txt.lower().split(" ") if t]
                for d, txt in docs.items()}
        occ = []
        for d in sorted(toks):
            ts = toks[d]
            for j in range(len(ts) // chunk):
                h = hashlib.md5(
                    " ".join(ts[j * chunk:(j + 1) * chunk]).encode()
                ).hexdigest()
                occ.append((d, j, h))
        first = {}
        for d, j, h in occ:
            if h not in first or (d, j) < first[h]:
                first[h] = (d, j)
        rmv = defaultdict(list)
        for d, j, h in occ:
            if (d, j) > first[h]:
                rmv[d].append(j)
        out = {}
        for d, ts in toks.items():
            removed, run = set(), []
            for j in sorted(rmv.get(d, [])):
                if run and j == run[-1] + 1:
                    run.append(j)
                else:
                    if len(run) >= min_run:
                        removed |= set(run)
                    run = [j]
            if len(run) >= min_run:
                removed |= set(run)
            kept = [t for i, t in enumerate(ts)
                    if (i // chunk) not in removed]
            out[d] = (len(ts), len(ts) - len(kept), " ".join(kept))
        return out

    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_text"])
           for r in T.remove_duplicate_spans(
               df, chunk=chunk, min_run=min_run).collect()}
    exp = ref(docs)
    assert got == exp
    assert any(v[1] > 0 for v in exp.values()), \
        "fixture must exercise actual removal"


def test_guards_still_raise_loudly_under_ansi(spark):
    """session.get_spark pins ansi.enabled=false for DuckDB NULL-on-
    divide parity (an explicit, documented contract — session.py). A
    production deployment flipping ANSI ON must not change the guard
    story: the two in-plan overflow guards raise their OWN loud error
    (never a silent wrap, and ideally before ANSI's arithmetic check
    can fire) with ANSI on too. ansi.enabled is runtime-settable, so
    this exercises the real config, not a fresh session."""
    bad_doc = T._OCC_DOC_MAX + 1
    df = spark.createDataFrame([(bad_doc, "a b c d a b c d")],
                               "doc_id: bigint, text: string")
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(Exception, match="packed occurrence key"):
            T.remove_duplicate_spans(df, chunk=2, min_run=2).collect()
        # in-range keys still compute under ANSI (no spurious aborts)
        ok = spark.createDataFrame([(7, 3)], "doc_id: bigint, j: bigint") \
            .select(T.packed_occurrence_key(
                F.col("doc_id"), F.col("j")).alias("k")).collect()
        assert ok[0]["k"] == 7 * T._OCC_KEY_SPAN + 3
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


def test_get_spark_ansi_parameter_sets_builder_config():
    """get_spark(ansi=...) must land in the session config on CREATE
    and on REUSE (runtime-settable; since r08 get_spark also pins it
    explicitly after getOrCreate); assert against the active session's
    conf, which this suite created with the default ansi=False."""
    from mousedatapipeline_spark.session import get_spark

    # getOrCreate on the suite's existing session still APPLIES
    # runtime-settable builder configs (shuffle.partitions would jump
    # to the machine's core count and leak into later plan-shape
    # tests) — snapshot and restore what get_spark touches.
    from pyspark.sql import SparkSession
    active = SparkSession.getActiveSession()
    prev = active.conf.get("spark.sql.shuffle.partitions")
    try:
        s = get_spark()
        assert s.conf.get("spark.sql.ansi.enabled") == "false"
    finally:
        active.conf.set("spark.sql.shuffle.partitions", prev)
    import inspect
    sig = inspect.signature(get_spark)
    assert sig.parameters["ansi"].default is False
