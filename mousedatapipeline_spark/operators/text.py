"""Text-analysis operators for training-data pipelines: tokenization,
language identification, quality scoring, and document fingerprinting —
all as JVM-side column expressions (no Python UDFs in the hot path).

These extend the reference's capability surface (SURVEY.md §2 "beyond
the reference" mandate): MOUSEDataPipeline itself has no text path, so
semantics here follow standard corpus-curation practice (C4/Gopher-style
heuristics) expressed Spark-first.

Scale notes: every function below is a narrow projection — no shuffle,
no UDF, fully whole-stage-codegen'd. At 100 TB these run at scan speed;
the only shuffles appear in the consumers (groupBy in the dedup/quality
aggregation queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish word/number/symbol tokenizer, shared with the DuckDB oracles.
# Java regex and RE2 agree on this subset (char classes + alternation).
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# Marker stopwords per language for the n-gram/stopword-voting language
# ID heuristic. Deliberately tiny and inlined into the SQL oracles too.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein"),
    "fr": ("le", "la", "et", "les", "des", "est", "une"),
    "es": ("el", "que", "los", "una", "y", "es", "las"),
}
CJK_REGEX_SPARK = "[\\u4e00-\\u9fff]"
CJK_REGEX_DUCK = "[\\x{4e00}-\\x{9fff}]"

# English stopwords for the quality-score stopword ratio.
EN_STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is",
                "it", "that", "for", "on", "with", "as")

_MOD = 2_147_483_647  # 2^31 - 1, keeps all rolling-hash math in bigint


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text (empty tokens from runs
    of spaces are dropped so token counts match across engines)."""
    return F.filter(F.split(F.lower(text), " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: words / digit runs / single symbols."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(TOKEN_REGEX),
                                       idx=0)).cast("bigint")


def marker_count(toks: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are marker words of one language."""
    ms = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(ms, t))
                  ).cast("bigint")


def cjk_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(CJK_REGEX_SPARK)).cast("bigint")


def predict_language(text: Column) -> Column:
    """Stopword-voting language ID with a fixed, engine-independent
    tie-break order (zh by CJK presence, then en >= de >= fr >= es)."""
    t = tokens(text)
    en = marker_count(t, LANG_MARKERS["en"])
    de = marker_count(t, LANG_MARKERS["de"])
    fr = marker_count(t, LANG_MARKERS["fr"])
    es = marker_count(t, LANG_MARKERS["es"])
    return (
        F.when(cjk_count(text) > 0, F.lit("zh"))
        .when((en >= de) & (en >= fr) & (en >= es), F.lit("en"))
        .when((de >= fr) & (de >= es), F.lit("de"))
        .when(fr >= es, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def mean_token_length(text: Column) -> Column:
    """Mean token length as an exact ratio of integer totals (bigint sum
    / bigint count — identical in any engine)."""
    t = tokens(text)
    total = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    n = F.size(t).cast("bigint")
    return F.when(n > 0, total.cast("double") / n.cast("double")
                  ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column,
                   stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    t = tokens(text)
    n = F.size(t).cast("bigint")
    return F.when(
        n > 0,
        marker_count(t, stopwords).cast("double") / n.cast("double")
    ).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    n = F.length(text).cast("bigint")
    alpha = F.regexp_count(F.lower(text), F.lit("[a-z ]")).cast("bigint")
    return F.when(n > 0, alpha.cast("double") / n.cast("double")
                  ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length documents
    with moderate stopword density and mostly-alphabetic content
    (Gopher-rule flavor, deterministic arithmetic only)."""
    n_tok = token_count(text).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    return (len_score * F.lit(0.4) + sw_score * F.lit(0.3)
            + alpha_ratio(text) * F.lit(0.3))


def token_hashes(text: Column) -> Column:
    """Per-token modular hash: first/last char codepoints + length.
    Pure integer arithmetic — bit-identical in Spark and DuckDB."""
    return F.transform(
        tokens(text),
        lambda t: (F.ascii(F.substring(t, 1, 1)) * F.lit(8191)
                   + F.ascii(F.substring(t, -1, 1)) * F.lit(131)
                   + F.length(t)).cast("bigint") % F.lit(_MOD))


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: left fold of the token-hash
    stream, ``acc -> (acc*31 + h) mod (2^31-1)``, seeded with the first
    hash (mirrors DuckDB ``list_reduce`` semantics, which uses the first
    element as the initial accumulator)."""
    h = token_hashes(text)
    folded = F.aggregate(
        F.slice(h, 2, F.greatest(F.size(h) - 1, F.lit(0))),
        F.element_at(h, 1),
        lambda acc, x: (acc * 31 + x) % F.lit(_MOD))
    return F.when(F.size(h) > 0, folded).otherwise(F.lit(0).cast("bigint"))


def content_hash(text: Column) -> Column:
    """Exact-identity fingerprint (md5 hex — engine-portable)."""
    return F.md5(text)


# ---------------------------------------------------------------------------
# PII redaction (beyond-reference: training-data scrubbing).
# Patterns are restricted to the Java-regex ∩ RE2 subset (no lookaround,
# no backreferences) so Spark and the DuckDB oracle agree byte-for-byte.
# ---------------------------------------------------------------------------

PII_PATTERNS = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)


def pii_counts(text: Column) -> list[Column]:
    """One bigint hit-count column per PII pattern, named n_<tag>."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), idx=0))
        .cast("bigint").alias(f"n_{tag.lower()}")
        for tag, pat in PII_PATTERNS
    ]


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its [TAG]; order matters (emails
    first so their digit runs are never half-eaten by the phone rule)."""
    out = text
    for tag, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, f"[{tag}]")
    return out


def pii_counts_sql(text_sql: str) -> list[str]:
    return [
        f"CAST(len(regexp_extract_all({text_sql}, '{pat}')) AS BIGINT)"
        f" AS n_{tag.lower()}"
        for tag, pat in PII_PATTERNS
    ]


def redact_pii_sql(text_sql: str) -> str:
    out = text_sql
    for tag, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '[{tag}]', 'g')"
    return out


# ---------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filters, Rae et al. 2021):
# duplicate-word fraction and top-n-gram fraction. All row-local array
# expressions — zero shuffles; callers must stage token/gram arrays as
# materialized columns (CollapseProject would otherwise duplicate the
# whole tokenization into every consumer — see README scale notes).
# ---------------------------------------------------------------------------

def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Word n-grams (space-joined) from a materialized token array."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    return F.when(F.size(toks) >= n, grams) \
        .otherwise(F.array().cast("array<string>"))


def chunk_hashes(toks: Column, n: int) -> Column:
    """md5 hashes of consecutive NON-overlapping ``n``-token chunks
    (the unit of span-level dedup, CCNet/RefinedWeb-style). Trailing
    tokens that don't fill a chunk are dropped; fewer than ``n`` tokens
    yields an empty array. Row-local — zero shuffles."""
    n_chunks = F.floor(F.size(toks) / n).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.md5(F.concat_ws(" ", F.slice(toks, j * n + 1, n))))
    # Guard: Spark's sequence(0, -1) counts DOWN ([0,-1]); the when()
    # keeps the empty-doc branch off that path entirely.
    return F.when(n_chunks > 0, chunks) \
        .otherwise(F.array().cast("array<string>"))


def dup_fraction(toks: Column) -> Column:
    """1 - distinct/total: the fraction of repeated words."""
    return F.when(
        F.size(toks) > 0,
        1.0 - F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks)).otherwise(F.lit(0.0))


def top_freq_fraction(grams: Column) -> Column:
    """Fraction of all grams taken by the single most frequent gram.

    Computed as the longest run of equal elements in the SORTED gram
    array — one O(n log n) sort plus a single fold with adjacent
    compares only. (The naive distinct x filter scan is O(d*n) string
    compares per row: measured ~3x slower on the documents corpus.)
    Row-local either way — zero shuffles; the explode+count
    alternative would trade this for a per-gram shuffle."""
    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc.best, run).alias("best"))

    best = F.aggregate(
        F.array_sort(grams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                 F.lit(0).alias("best")),
        step, lambda acc: acc.best)
    return F.when(
        F.size(grams) > 0, best.cast("double") / F.size(grams)) \
        .otherwise(F.lit(0.0))


# --------------------------------------------------------------------------
# Exact-substring dedup (DataFrame-level): the Lee et al. 2022
# ("Deduplicating Training Data Makes Language Models Better")
# operation — REMOVE long substrings that already occur earlier in the
# corpus, keeping the first occurrence. The suffix-array formulation
# is inherently sequential; the distributed re-expression anchors on
# non-overlapping token-chunk hashes (the t11/t21 unit): a duplicated
# substring of length >= (min_run+1)*chunk - 1 tokens must contain at
# least min_run consecutive duplicated chunks (pigeonhole), so runs of
# removable chunks locate the removable spans.
# --------------------------------------------------------------------------

# Occurrence keys pack (doc_id, chunk_idx) into one BIGINT so "earliest
# occurrence corpus-wide" is a single map-side-combinable MIN — no
# window over the (possibly mega-hot) chunk-hash partition. Bounds the
# per-doc chunk count; 1e9 * 8 tokens/chunk = docs up to 8B tokens.
_OCC_KEY_SPAN = 1_000_000_000
# Largest doc_id whose packed key fits BIGINT:
# _OCC_DOC_MAX * _OCC_KEY_SPAN + (_OCC_KEY_SPAN - 1) < 2^63 - 1.
_OCC_DOC_MAX = 9_223_372_035


def packed_occurrence_key(doc_id, idx):
    """``doc_id * SPAN + idx`` with a loud in-plan range guard.

    With ANSI off (engine-wide, for NULL-on-divide oracle parity) the
    raw product wraps BIGINT silently beyond doc_id ~ 9.2e9 while
    DuckDB raises — and an idx >= SPAN aliases into the next doc's key
    range in BOTH engines without any overflow at all. Either way the
    corpus-wide MIN mis-orders with no error. The guard lives inside
    the consumed key expression, so Catalyst cannot prune it.
    """
    ok = (doc_id >= 0) & (doc_id <= _OCC_DOC_MAX) & (idx < _OCC_KEY_SPAN)
    return F.when(ok, doc_id * _OCC_KEY_SPAN + idx).otherwise(
        F.raise_error(F.concat(
            F.lit("packed occurrence key out of range: doc_id="),
            doc_id.cast("string"),
            F.lit(" idx="), idx.cast("string"))))


def packed_occurrence_key_sql(doc: str = "doc_id", idx: str = "j") -> str:
    """DuckDB twin of :func:`packed_occurrence_key` (same guard)."""
    return (f"CASE WHEN {doc} BETWEEN 0 AND {_OCC_DOC_MAX} "
            f"AND {idx} < {_OCC_KEY_SPAN} "
            f"THEN {doc} * {_OCC_KEY_SPAN} + {idx} "
            f"ELSE CAST(error('packed occurrence key out of range: "
            f"doc_id=' || {doc} || ' idx=' || {idx}) AS BIGINT) END")


def remove_duplicate_spans(docs, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           chunk: int = 8, min_run: int = 2):
    """Remove runs of >= ``min_run`` consecutive ``chunk``-token chunks
    whose content occurs earlier in the corpus (earlier = smaller
    (doc_id, position)). Returns one row per input doc:
    ``(id_col, n_tokens, n_removed, clean_text)``.

    Plan shape (100 TB): chunking is row-local; "earliest occurrence"
    is one groupBy(hash) MIN (partial agg absorbs hot boilerplate
    chunks); the probe is a corpus-keyed equi-join on the hash (1:1
    with occurrences — no fan-out); the gaps-and-islands window
    partitions by doc (bounded by a doc's chunk count); reconstruction
    joins the removal set back by doc id and filters the token array
    with a JVM higher-order function. No UDFs, no broadcast
    dependence, no all-pairs anything.
    """
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("t"))
    ch = (base.select(
        id_col,
        F.posexplode(chunk_hashes(F.col("t"), chunk)).alias("idx", "h"))
        .select(id_col, F.col("idx").cast("bigint").alias("idx"), "h")
        .withColumn("pk", packed_occurrence_key(F.col(id_col),
                                                F.col("idx"))))
    first = ch.groupBy("h").agg(F.min("pk").alias("first_pk"))
    rmv = (ch.join(first, "h")
           .filter(F.col("pk") > F.col("first_pk"))
           .select(id_col, "idx"))
    w = Window.partitionBy(id_col).orderBy("idx")
    isl = rmv.withColumn("grp", F.col("idx") - F.row_number().over(w))
    run_w = Window.partitionBy(id_col, "grp")
    removed = (isl.withColumn("run_len", F.count(F.lit(1)).over(run_w))
               .filter(F.col("run_len") >= min_run)
               .groupBy(id_col)
               .agg(F.sort_array(F.collect_list("idx")).alias("rm")))
    rm = F.coalesce(F.col("rm"), F.array().cast("array<bigint>"))
    kept = F.filter(
        F.col("t"),
        lambda x, i: ~F.array_contains(rm, F.floor(i / chunk)))
    return (base.join(removed, id_col, "left")
            .select(id_col,
                    F.size("t").cast("bigint").alias("n_tokens"),
                    (F.size("t") - F.size(kept)).cast("bigint")
                    .alias("n_removed"),
                    F.array_join(kept, " ").alias("clean_text")))


# ---------------------------------------------------------------------------
# URL canonicalization (web-crawl curation). Idempotent by construction
# (canonical output re-canonicalizes to itself — pinned by a property
# test): lowercase scheme/host, strip :443/:80 and a leading 'www.',
# drop the #fragment, remove tracking params (utm_*/gclid/fbclid), sort
# the remaining query params, strip the trailing slash. Every regex is
# in the Java-regex ∩ RE2 subset (the PII-pattern discipline above) and
# the whole chain is scan-stage codegen — no UDF, no shuffle.
# ---------------------------------------------------------------------------

_URL_TRACKING_PREFIXES = (("utm_", 4), ("gclid=", 6), ("fbclid=", 7))


def url_host(url: Column) -> Column:
    """Canonical host: lowercased authority with the default port
    (:443/:80) and a leading ``www.`` removed."""
    return F.regexp_replace(
        F.regexp_replace(
            F.lower(F.regexp_extract(url, r"^[A-Za-z]+://([^/?#]+)", 1)),
            r":(443|80)$", ""),
        r"^www\.", "")


def canonical_url(url: Column) -> Column:
    """Full canonical form: lower(scheme)://host + path (trailing slash
    stripped, '/' restored when empty) + '?' + sorted surviving params
    (tracking params dropped); fragment discarded."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    path0 = F.regexp_replace(
        F.regexp_extract(url, r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1),
        r"/$", "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)

    def keep(p):
        cond = p != ""
        for pref, n in _URL_TRACKING_PREFIXES:
            cond = cond & (F.substring(p, 1, n) != pref)
        return cond

    params = F.array_sort(F.filter(
        F.split(F.regexp_extract(url, r"\?([^#]*)", 1), "&"), keep))
    return F.concat(
        scheme, F.lit("://"), url_host(url), path,
        F.when(F.size(params) > 0,
               F.concat(F.lit("?"), F.array_join(params, "&")))
        .otherwise(F.lit("")))


def url_host_sql(u: str) -> str:
    """DuckDB twin of :func:`url_host` (identical regex chain)."""
    return (f"regexp_replace(regexp_replace(lower("
            f"regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1)), "
            f"':(443|80)$', ''), '^www\\.', '')")


def canonical_url_sql(u: str) -> str:
    """DuckDB twin of :func:`canonical_url` (identical chain; list
    filter/sort mirror Spark's higher-order filter + array_sort)."""
    keep = " AND ".join(
        [f"p <> ''"] + [f"substr(p, 1, {n}) <> '{pref}'"
                        for pref, n in _URL_TRACKING_PREFIXES])
    path0 = (f"regexp_replace(regexp_extract({u}, "
             f"'^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/$', '')")
    params = (f"list_sort(list_filter(string_split("
              f"regexp_extract({u}, '\\?([^#]*)', 1), '&'), "
              f"p -> {keep}))")
    return (f"lower(regexp_extract({u}, '^([A-Za-z]+)://', 1)) || '://' "
            f"|| {url_host_sql(u)} "
            f"|| CASE WHEN {path0} = '' THEN '/' ELSE {path0} END "
            f"|| CASE WHEN len({params}) > 0 "
            f"THEN '?' || array_to_string({params}, '&') ELSE '' END")
