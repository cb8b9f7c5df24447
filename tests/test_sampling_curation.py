"""Unit semantics for operators/sampling.py and the PII redaction ops:
determinism, stratum rates, split partition/stability, packing layout,
and redaction on synthetic PII (the catalog corpus is PII-free, so
hits are exercised here with hand-written rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mousedatapipeline_spark.operators import sampling as SA
from mousedatapipeline_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "en" if i % 2 == 0 else "de", f"word{i % 7} " * (i % 9 + 1))
            for i in range(400)]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_stratified_sample_is_deterministic_and_rate_shaped(docs):
    rates = {"en": 0.5, "de": 1.0}
    a = SA.stratified_sample(docs, "doc_id", "lang", rates)
    b = SA.stratified_sample(docs.repartition(7), "doc_id", "lang", rates)
    ra = sorted(r.doc_id for r in a.collect())
    rb = sorted(r.doc_id for r in b.collect())
    assert ra == rb  # partitioning-independent membership
    per = {r["lang"]: r["n"] for r in
           a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per["de"] == 200  # rate 1.0 keeps everything
    assert 60 <= per["en"] <= 140  # ~100 expected at rate .5, md5-uniform
    w = {r["lang"]: r["weight"] for r in a.select("lang", "weight")
         .distinct().collect()}
    assert w == {"en": 2.0, "de": 1.0}


def test_stratified_sample_unknown_stratum_dropped_or_defaulted(spark):
    df = spark.createDataFrame([(1, "xx"), (2, "xx")], ["doc_id", "lang"])
    assert SA.stratified_sample(df, "doc_id", "lang", {"en": 1.0}).count() == 0
    kept = SA.stratified_sample(df, "doc_id", "lang", {"en": 1.0},
                                default_rate=1.0)
    assert kept.count() == 2
    assert kept.select("weight").distinct().collect()[0][0] == 1.0


def test_dataset_split_partitions_everything_exactly_once(docs):
    s = SA.dataset_split(docs, "doc_id",
                         {"train": 0.8, "val": 0.1, "test": 0.1})
    assert s.filter(F.col("split").isNull()).count() == 0
    n = {r["split"]: r["n"] for r in
         s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(n.values()) == 400
    assert n["train"] > n["val"] and n["train"] > n["test"]


def test_dataset_split_membership_stable_under_growth(spark, docs):
    """Adding rows never moves an existing row between splits."""
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    first = {r["doc_id"]: r["split"]
             for r in SA.dataset_split(docs.limit(100), "doc_id", fr)
             .collect()}
    grown = {r["doc_id"]: r["split"]
             for r in SA.dataset_split(docs, "doc_id", fr).collect()}
    assert all(grown[k] == v for k, v in first.items())


def test_split_fractions_must_sum_to_one(docs):
    with pytest.raises(ValueError):
        SA.dataset_split(docs, "doc_id", {"train": 0.5, "val": 0.1})


def test_pack_sequences_chunk_layout(spark):
    # tokens: 3,4,5 in one group with budget 6 ->
    # starts 0,3,7 -> chunks 0,0,1
    df = spark.createDataFrame(
        [("g", 1, 3), ("g", 2, 4), ("g", 3, 5)], ["g", "i", "n"])
    out = SA.pack_sequences(df, ["g"], "i", "n", budget=6) \
        .orderBy("i").collect()
    assert [(r.tok_start, r.chunk_id) for r in out] == \
        [(0, 0), (3, 0), (7, 1)]


def test_pack_sequences_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 600), ("b", 1, 600)], ["g", "i", "n"])
    out = SA.pack_sequences(df, ["g"], "i", "n", budget=512).collect()
    assert all(r.chunk_id == 0 and r.tok_start == 0 for r in out)


def test_redact_pii_hits_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.b+c@ex-ample.co.uk ip 192.168.0.1 tel 555-123-4567 x"),
         (2, "no pii here 1234")],
        ["i", "t"])
    out = df.select("i", T.redact_pii(F.col("t")).alias("r"),
                    *T.pii_counts(F.col("t"))).orderBy("i").collect()
    assert out[0].r == "mail [EMAIL] ip [IP] tel [PHONE] x"
    assert (out[0].n_email, out[0].n_ip, out[0].n_phone) == (1, 1, 1)
    assert out[1].r == "no pii here 1234"
    assert (out[1].n_email, out[1].n_ip, out[1].n_phone) == (0, 0, 0)


def test_redaction_order_email_before_phone(spark):
    # digits inside an email local part must not be phone-matched
    df = spark.createDataFrame([("x 555-123-4567@corp.io y",)], ["t"])
    r = df.select(T.redact_pii(F.col("t")).alias("r")).collect()[0].r
    assert r == "x [EMAIL] y"


def test_ngrams_and_repetition_fractions(spark):
    rows = [(1, "a b a b a"),   # toks 5, distinct 2; bigrams: ab ba ab ba
            (2, "x"),           # too short for bigrams
            (3, "")]
    df = spark.createDataFrame(rows, ["i", "t"])
    toks = T.tokens(F.col("t"))
    staged = df.select(
        "i", toks.alias("toks"),
        T.ngrams_from_tokens(toks, 2).alias("g2"))
    out = {r.i: r for r in staged.select(
        "i", "toks", "g2",
        T.dup_fraction(F.col("toks")).alias("dw"),
        T.top_freq_fraction(F.col("g2")).alias("tb")).collect()}
    assert out[1].g2 == ["a b", "b a", "a b", "b a"]
    assert abs(out[1].dw - (1 - 2 / 5)) < 1e-12
    assert abs(out[1].tb - 0.5) < 1e-12
    assert out[2].g2 == [] and out[2].dw == 0.0 and out[2].tb == 0.0
    assert out[3].g2 == [] and out[3].dw == 0.0 and out[3].tb == 0.0


def test_exact_k_per_stratum_sizes_and_determinism(docs):
    out = SA.exact_k_per_stratum(docs, "doc_id", "lang", k=30)
    per = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert per == {"en": 30, "de": 30}
    small = SA.exact_k_per_stratum(docs, "doc_id", "lang", k=10**6)
    assert small.count() == 400  # k > |stratum| keeps everything
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in SA.exact_k_per_stratum(
        docs.repartition(11), "doc_id", "lang", k=30).collect())
    assert a == b  # membership independent of partitioning


def test_c05_compaction_bins_match_python_reference(spark):
    """c05's bin assignment equals an exact Python greedy running-sum
    pack over the same manifest, and per-source file-id ranges of
    consecutive bins never overlap (a rewrite job can run bins
    independently)."""
    from mousedatapipeline_spark.plans.curation_queries import (
        _C05_TARGET, c05_compaction_plan)

    sf = "/root/testdata/sf0.001"
    manifest = sorted(
        (r.source, r.doc_id, len(r.text))
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("source", "doc_id", "text").collect())
    expect = {}
    cum, cur = 0, None
    for src, fid, sz in manifest:
        if src != cur:
            cur, cum = src, 0
        b = cum // _C05_TARGET
        n, tot, mn, mx = expect.get((src, b), (0, 0, fid, fid))
        expect[(src, b)] = (n + 1, tot + sz, min(mn, fid), max(mx, fid))
        cum += sz
    got = {(r.source, r.bin): r for r in
           c05_compaction_plan(spark, sf).collect()}
    assert set(got) == set(expect)
    for k, (n, tot, mn, mx) in expect.items():
        r = got[k]
        assert (r.n_input_files, r.total_bytes) == (n, tot), k
        assert (r.first_file, r.last_file) == (mn, mx), k
        assert r.full_bin == (tot >= _C05_TARGET), k
    # Non-overlapping id ranges per source, in bin order.
    by_src = {}
    for (src, b), r in got.items():
        by_src.setdefault(src, []).append((b, r.first_file, r.last_file))
    for src, bins in by_src.items():
        bins.sort()
        for (_, _, hi), (_, lo, _) in zip(bins, bins[1:]):
            assert hi < lo, src


def test_canonical_url_idempotent_and_junk_removal(spark):
    """operators/text.canonical_url: every junk class is removed, path
    case survives, and the transform is idempotent (canon(canon(u)) ==
    canon(u)) — the property the dedup key depends on. The DuckDB twin
    (canonical_url_sql) is cross-checked on the same hand-built URLs,
    so both engines agree beyond the minted t38 corpus."""
    import duckdb

    cases = [
        # (raw, expected canonical)
        ("HTTPS://WWW.Example.COM:443/A/B/?utm_source=x&z=1&a=2#frag",
         "https://example.com/A/B?a=2&z=1"),
        ("https://example.com", "https://example.com/"),
        ("http://example.com:80/?fbclid=abc&gclid=g1&utm_medium=m",
         "http://example.com/"),
        ("https://sub.www.example.com/x", "https://sub.www.example.com/x"),
        ("https://example.com/p?b=2&a=1", "https://example.com/p?a=1&b=2"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["url"])
    got = {r.url: r.canon for r in df.select(
        "url", T.canonical_url(F.col("url")).alias("canon")).collect()}
    for raw, want in cases:
        assert got[raw] == want, raw
    # Idempotence: re-canonicalizing the canonical form is the identity.
    df2 = spark.createDataFrame([(c,) for _, c in cases], ["url"])
    again = {r.url: r.canon for r in df2.select(
        "url", T.canonical_url(F.col("url")).alias("canon")).collect()}
    for _, c in cases:
        assert again[c] == c, c
    # DuckDB twin parity on the identical raw strings.
    con = duckdb.connect()
    for raw, want in cases:
        expr = T.canonical_url_sql("url")
        row = con.sql(
            f"SELECT {expr} AS c FROM (SELECT ? AS url)",
            params=[raw]).fetchone()
        assert row[0] == want, raw


def test_t38_dedup_invariants(spark):
    """t38 aggregates equal the closed forms implied by the minted-URL
    construction, computed here from N alone (no logic shared with the
    plan): with page = doc_id//3 and three junk variants per page,
    every complete triple (and the v0+v1 pair of a partial page)
    collapses to one canonical URL; only the v0 variant is already
    canonical."""
    import math
    import os

    from mousedatapipeline_spark.plans.catalog import all_queries

    sf = "/root/testdata/sf0.001"
    if not os.path.isdir(sf):
        import pytest
        pytest.skip("no test data")
    n = spark.read.parquet(f"{sf}/documents.parquet").count()
    rows = all_queries()["t38_url_canonical_dedup"].spark(spark, sf).collect()
    pages = math.ceil(n / 3)
    assert sum(r.n_raw for r in rows) == n
    assert sum(r.n_canonical for r in rows) == pages
    assert max(r.max_group for r in rows) == (3 if n >= 3 else n)
    # v0 rows are the only already-canonical ones: dirty = n - #v0.
    assert sum(r.n_dirty for r in rows) == n - pages
    # every page with >= 2 members is a dup group.
    lone = 1 if n % 3 == 1 else 0
    assert sum(r.n_dup_rows for r in rows) == n - lone


def test_canonical_url_randomized_engine_parity(spark):
    """Seeded random URL grammar (case, ports, www, params in random
    order, tracking junk, fragments, trailing slashes) — Spark and the
    DuckDB twin must canonicalize every sample identically, and the
    result must be a fixed point of a second canonicalization."""
    import random

    import duckdb

    rng = random.Random(0xC0FFEE)
    urls = []
    for _ in range(120):
        scheme = rng.choice(["http", "https", "HTTP", "HTTPS", "Https"])
        www = rng.choice(["", "www.", "WWW."])
        host = rng.choice(["example.com", "Sub.Example.COM", "a-b.c.org"])
        port = rng.choice(["", ":443", ":80", ":8443"])
        depth = rng.randint(0, 3)
        path = "".join(f"/{rng.choice(['X', 'y', 'Z9', 'p q'])}"
                       for _ in range(depth))
        if rng.random() < 0.4:
            path += "/"
        params = rng.sample(
            ["a=1", "b=2", "z=9", "ref=7", "utm_source=x",
             "utm_medium=m", "gclid=g12", "fbclid=f9"],
            rng.randint(0, 5))
        qs = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#top", "#sec-2"])
        urls.append(f"{scheme}://{www}{host}{port}{path}{qs}{frag}")

    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.canon for r in df.select(
        "url", T.canonical_url(F.col("url")).alias("canon")).collect()}
    again = {r.url: r.canon for r in spark.createDataFrame(
        [(c,) for c in set(got.values())], ["url"]).select(
        "url", T.canonical_url(F.col("url")).alias("canon")).collect()}
    con = duckdb.connect()
    expr = T.canonical_url_sql("url")
    for u in urls:
        want = con.sql(f"SELECT {expr} AS c FROM (SELECT ? AS url)",
                       params=[u]).fetchone()[0]
        assert got[u] == want, u
        assert again[got[u]] == got[u], (u, got[u])
