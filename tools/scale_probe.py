"""Scale probe: measure catalog-query scaling across sf0.01 -> sf0.1 ->
a 10x-replicated sf0.1 ("sfx1", ~sf1-equivalent row counts).

The driver ships testdata up to sf0.1 only; to test the claim "this
plan survives a 10x scale-up", this tool replicates the sf0.1 tables
K times with id offsets into a scratch dir and times a representative
query slice at all three scales.

Key-domain handling: an id column shared across tables (o_custkey and
c_custkey, l_orderkey and o_orderkey) must shift by the SAME offset in
every table, or replicated foreign keys point into the wrong replica
and joins silently lose matches. Offsets are therefore computed once
per DOMAIN (from the table that owns the key) and reused.

Replication semantics (deliberate, documented): texts repeat across
replicas, so the corpus gains exact/near duplicates with multiplicity
K — the realistic shape of a crawled corpus. Scan/agg/window/join
queries should scale ~linearly in rows; PAIR-EMITTING dedup queries
(s01 groups, s03 bands) legitimately scale with duplicate mass
(cluster-size-squared), which the report calls out rather than hides.

Usage: PYTHONPATH=. python tools/scale_probe.py [K] [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

SCRATCH = Path("/tmp/mouse_scale_probe")
BASE = "/root/testdata/sf0.1"

# Key domains: domain name -> (owning table, owning column). Every
# column in that domain shifts by the same owner-derived offset.
DOMAINS = {
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "order": ("orders", "o_orderkey"),
    "cust": ("customer", "c_custkey"),
}

# (table, {column: domain})
TABLES = {
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
    "events": {"event_id": "event", "user_id": "user"},
    "lineitem": {"l_orderkey": "order"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "customer": {"c_custkey": "cust"},
    # small dims copied as-is (they are fixed-size in TPC-H too)
    "region": {}, "nation": {}, "supplier": {}, "part": {},
}

PROBE = [
    # linear family: scan/agg/window/join
    "q01_pricing_summary", "q24_window_analytics",
    "q31_scalable_percentiles", "t01_token_stats",
    "t14_unigram_surprisal", "t26_substring_removal",
    "e02_sessionization", "e13_skew_report", "k03_hll_set_ops",
    "t28_dsir_importance", "t30_split_contamination",
    "s36_product_quantization", "e16_rolling_active_users",
    "e20_decayed_engagement", "q35_scd2_intervals",
    "s41_power_iteration_pca", "c05_compaction_plan",
    "q48_zorder_skipping", "k05_sliding_hll", "w15_stream_compaction",
    # iterative-graph family over the near-dup edge list: replication
    # x10 grows duplicate-mass-squared edges ~100x — the stress that
    # would expose a non-checkpointed iteration recomputing s19
    # per round (VERDICT r05 task 4)
    "s40_neardup_pagerank", "s43_label_propagation",
    # round-6 widening: the heaviest bench queries not yet probed —
    # ANN/index builds, dedup composition, profiling, bootstrap
    "s38_knn_graph_stats", "s39_ivf_pq_index_build",
    "s33_cross_source_dup_matrix", "s34_quality_canonical",
    "s21_semantic_dedup", "s19_lsh_verified_neardup",
    "s14_neardup_components", "s18_bloom_decontam",
    "q16_column_profile", "q25_group_percentiles",
    "e22_bootstrap_stderr", "mm06_media_dedup_clusters",
    # duplicate-mass family: pair emitters (expected superlinear in
    # duplicate multiplicity, linear in distinct content)
    "s01_exact_dedup", "s03_minhash_lsh",
    # the production funnel: exact dedup FIRST collapses the 10
    # replicas, so the pair stages see only distinct content
    "c06_production_dedup_e2e",
    # round-10 addition: URL canonicalization + dedup — scan-stage
    # string chain feeding one (host, canon) groupBy; expected linear
    "t38_url_canonical_dedup",
]


def build_sfx(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from mousedatapipeline_spark.tables import load

    out = SCRATCH / f"sfx{k}"
    done = out / "_BUILD_COMPLETE"
    if done.exists():
        return str(out)
    if out.exists():  # interrupted build: partial tables are poison
        shutil.rmtree(out)
    out.mkdir(parents=True)
    # One offset per key domain, taken from the owning table (tables
    # are read through tables.load so events' TIMESTAMP(NANOS)
    # handling is applied, same as every consumer).
    span = {
        dom: load(spark, BASE, tbl).agg(F.max(col)).collect()[0][0] + 1
        for dom, (tbl, col) in DOMAINS.items()
    }
    for table, cols in TABLES.items():
        df = load(spark, BASE, table)
        if not cols:
            df.write.mode("overwrite").parquet(
                str(out / f"{table}.parquet"))
            continue
        rep = df.withColumn(
            "__r", F.explode(F.array(*[F.lit(i) for i in range(k)])))
        for c, dom in cols.items():
            rep = rep.withColumn(
                c, F.col(c) + F.col("__r") * F.lit(span[dom]))
        (rep.drop("__r")
         .write.mode("overwrite").parquet(str(out / f"{table}.parquet")))
    done.touch()
    return str(out)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING.json"
    # Optional trailing query names: re-measure just that slice (e.g.
    # after a plan change to one family) without paying for the full
    # probe. The output file then holds only the slice — merge into
    # the committed full run by hand, don't overwrite it.
    only = set(sys.argv[3:])
    from mousedatapipeline_spark.plans.catalog import spark_queries
    from mousedatapipeline_spark.session import get_spark
    spark = get_spark("scale_probe")
    qs = spark_queries()
    sfx = build_sfx(spark, k)
    scales = [("sf0.01", "/root/testdata/sf0.01"),
              ("sf0.1", BASE), (f"sfx{k}", sfx)]
    results: dict[str, dict] = {}
    for name in PROBE:
        if only and name not in only:
            continue
        row: dict[str, dict] = {}
        for label, d in scales:
            t0 = time.time()
            cnt = qs[name](spark, d).count()
            row[label] = {"sec": round(time.time() - t0, 2), "rows": cnt}
        results[name] = row
        print(name, json.dumps(row), flush=True)
    Path(out_path).write_text(json.dumps(
        {"replication": k, "results": results}, indent=1))


if __name__ == "__main__":
    main()
