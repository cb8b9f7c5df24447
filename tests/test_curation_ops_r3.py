"""Semantic invariants for the round-3 pipeline operators (t27/t28,
s33-s36, k03, t30/t31, w10): properties that must hold on ANY corpus,
complementing the exact DuckDB-oracle hash checks the driver runs."""

from __future__ import annotations

import os

import pytest

from mousedatapipeline_spark.plans import catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001")

_needs_data = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"no test data at {SF_DIR}")


def _run(spark, name):
    return catalog.all_queries()[name].spark(spark, SF_DIR).collect()


@_needs_data
def test_t27_merge_stats_ranked_and_dense(spark):
    rows = _run(spark, "t27_bpe_merge_stats")
    assert 0 < len(rows) <= 20
    by_rank = sorted(rows, key=lambda r: r["rank"])
    assert [r["rank"] for r in by_rank] == list(range(1, len(rows) + 1))
    cnts = [r["cnt"] for r in by_rank]
    assert cnts == sorted(cnts, reverse=True)  # ranked by count desc
    assert all(len(r["pair"].split(" ")) == 2 for r in rows)


@_needs_data
def test_t28_importance_favors_target_language(spark):
    # Weights are log p_target/p_corpus with target = lang 'en': the
    # mean importance of en docs must exceed that of any other lang.
    from mousedatapipeline_spark.tables import load
    rows = _run(spark, "t28_dsir_importance")
    langs = {r["doc_id"]: None for r in rows}
    lang_of = {r["doc_id"]: r["lang"]
               for r in load(spark, SF_DIR, "documents")
               .select("doc_id", "lang").collect() if r["doc_id"] in langs}
    by_lang: dict[str, list[float]] = {}
    for r in rows:
        by_lang.setdefault(lang_of[r["doc_id"]], []).append(r["importance"])
    means = {k: sum(v) / len(v) for k, v in by_lang.items() if v}
    assert "en" in means
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, means)


@_needs_data
def test_s33_matrix_consistent_with_pair_set(spark):
    rows = _run(spark, "s33_cross_source_dup_matrix")
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert 0 <= r["n_cross"] <= r["n_pairs"]
        # verified pairs all passed the 0.5 Jaccard gate
        assert r["mean_jaccard"] >= 0.5


@_needs_data
def test_s34_exactly_one_keeper_per_component(spark):
    rows = _run(spark, "s34_quality_canonical")
    comps: dict[int, list] = {}
    for r in rows:
        comps.setdefault(r["component_id"], []).append(r)
    for cid, members in comps.items():
        keepers = [m for m in members if m["keep"] == 1]
        assert len(keepers) == 1, cid
        best = max(members, key=lambda m: (m["quality"], -m["doc_id"]))
        assert keepers[0]["doc_id"] == best["doc_id"]
        assert all(m["n_members"] == len(members) for m in members)


@_needs_data
def test_s35_negative_labels_differ_and_cell_shared(spark):
    rows = _run(spark, "s35_hard_negatives")
    assert rows
    for r in rows:
        assert r["q_label"] != r["neg_label"]
        assert r["n_cross"] >= 1
        assert -1.0 <= r["cosine"] <= 1.0 + 1e-9


@_needs_data
def test_s36_codes_and_errors_wellformed(spark):
    rows = _run(spark, "s36_product_quantization")
    assert rows
    for r in rows:
        parts = r["code"].split("-")
        assert len(parts) == 4
        assert all(p.isdigit() for p in parts)
        assert r["recon_err"] >= 0.0


@_needs_data
def test_k03_inclusion_exclusion_identities(spark):
    rows = _run(spark, "k03_hll_set_ops")
    assert rows
    for r in rows:
        # union never smaller than either side, never larger than sum
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-6
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-6
        # intersect is DEFINED as a+b-union (identity must hold after
        # the shared rounding)
        assert abs((r["est_a"] + r["est_b"] - r["est_union"])
                   - r["est_intersect"]) < 2e-6


@_needs_data
def test_t30_rollup_covers_heldout_splits_only(spark):
    rows = _run(spark, "t30_split_contamination")
    assert {r["split"] for r in rows} <= {"val", "test"}
    for r in rows:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert 0.0 <= r["mean_contamination"] <= 1.0


@_needs_data
def test_t31_savings_bounded(spark):
    rows = _run(spark, "t31_dedup_savings_by_source")
    assert rows
    for r in rows:
        assert 0 <= r["removed_tokens"] <= r["raw_tokens"]
        assert 0.0 <= r["savings_share"] < 1.0


@_needs_data
def test_c06_funnel_counts_are_monotone(spark):
    """The production funnel only ever REMOVES documents, stage by
    stage: per source, docs >= exact-dedup survivors >= near-dup
    canonicals >= quality-gated final, with a non-negative token
    budget — on ANY corpus, independent of the oracle's exact values."""
    rows = _run(spark, "c06_production_dedup_e2e")
    assert rows, "funnel census must cover every source"
    for r in rows:
        assert (r["n_docs"] >= r["n_after_exact"]
                >= r["n_after_neardup"] >= r["n_final"] >= 0), r
        assert r["tokens_final"] >= 0, r
        # an empty final set must carry an empty budget
        if r["n_final"] == 0:
            assert r["tokens_final"] == 0, r
