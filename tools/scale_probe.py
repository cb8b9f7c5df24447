"""Scale probe: measure catalog-query scaling across sf0.01 -> sf0.1 ->
a 10x-replicated sf0.1 ("sfx1", ~sf1-equivalent row counts).

The driver ships testdata up to sf0.1 only; to test the claim "this
plan survives a 10x scale-up", this tool replicates the sf0.1 tables
K times with id offsets (doc_id/vec_id/event_id/user_id/l_orderkey
shifted per replica; payload columns untouched) into a scratch dir and
times a representative query slice at all three scales.

Replication semantics (deliberate, documented): texts repeat across
replicas, so the corpus gains exact/near duplicates with multiplicity
K — the realistic shape of a crawled corpus. Scan/agg/window/join
queries should scale ~linearly in rows; PAIR-EMITTING dedup queries
(s01 groups, s03 bands) legitimately scale with duplicate mass
(cluster-size-squared), which the report calls out rather than hides.

Usage: python tools/scale_probe.py [K] [out.json]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

SCRATCH = Path("/tmp/mouse_scale_probe")
BASE = "/root/testdata/sf0.1"

# (table, id columns to offset per replica)
TABLES = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    # small dims copied as-is (they are fixed-size in TPC-H too)
    "region": [], "nation": [], "supplier": [], "part": [],
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
    # duplicate-mass family: pair emitters (expected superlinear in
    # duplicate multiplicity, linear in distinct content)
    "s01_exact_dedup", "s03_minhash_lsh",
]


def build_sfx(spark, k: int) -> str:
    from pyspark.sql import functions as F
    out = SCRATCH / f"sfx{k}"
    if out.exists():
        return str(out)
    out.mkdir(parents=True)
    for table, id_cols in TABLES.items():
        src = f"{BASE}/{table}.parquet"
        if not id_cols:
            shutil.copy(src, out / f"{table}.parquet")
            continue
        df = spark.read.parquet(src)
        n = {c: df.agg(F.max(c)).collect()[0][0] + 1 for c in id_cols}
        rep = df.withColumn(
            "__r", F.explode(F.array(*[F.lit(i) for i in range(k)])))
        for c in id_cols:
            rep = rep.withColumn(c, F.col(c) + F.col("__r") * F.lit(n[c]))
        (rep.drop("__r")
         .write.mode("overwrite").parquet(str(out / f"{table}.parquet")))
    return str(out)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SCALING.json"
    from mousedatapipeline_spark.session import get_spark
    from mousedatapipeline_spark.plans.catalog import spark_queries
    spark = get_spark("scale_probe")
    qs = spark_queries()
    sfx = build_sfx(spark, k)
    scales = [("sf0.01", "/root/testdata/sf0.01"),
              ("sf0.1", BASE), (f"sfx{k}", sfx)]
    results: dict[str, dict] = {}
    for name in PROBE:
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
