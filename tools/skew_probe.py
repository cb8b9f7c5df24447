"""Measured AQE skew-join demonstration — and its map-side precondition.

`session.get_spark` enables `spark.sql.adaptive.skewJoin.enabled` and
SCALING.md asserts "AQE splits the hot bucket" for skewed shuffle
joins. This tool measures that claim on a deliberately skewed
fact->dim equi-join (80% of fact rows share ONE deterministic
user_id-derived key; broadcast disabled so it is a real shuffled
sort-merge join, the shape a far-over-threshold dim forces at 100 TB).

What the first run of this probe found (the reason the tool keeps
both variants): **AQE can only split a skewed reduce partition at
map-output-chunk granularity.** The local fixture's events table is
ONE parquet file with one row group -> effectively one mapper, so the
hot partition is a single indivisible chunk and OptimizeSkewedJoin
silently does nothing — `SortMergeJoin` carries no `skew=true` marker
no matter how low the thresholds go. After spreading the scan across
32 mappers (`repartition`, the `tables.load_spread` pattern), the
SAME join at the SAME thresholds splits the hot partition
(`SortMergeJoin(skew=true)`, `AQEShuffleRead coalesced and skewed`).
At 100 TB this precondition is normally free (thousands of input
splits), but any single-chunk stage feeding a skewed join — a
coalesce(1), a tiny-file source, one giant unsplittable row group —
quietly disables skew handling: skew mitigation needs map-side
parallelism FIRST.

Thresholds are lowered from the 256 MB-class defaults because the
local hot partition is ~10² MB; the RATIOS (factor 2 over median)
match production intent. Each timed variant rebuilds the DataFrame so
no shuffle files are reused between trials.

Usage: PYTHONPATH=. python tools/skew_probe.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SCRATCH = [("sfx30", "/tmp/mouse_scale_probe/sfx30"),
           ("sfx10", "/tmp/mouse_scale_probe/sfx10"),
           ("sf0.1", "/root/testdata/sf0.1")]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SKEWPROBE.json"
    from pyspark.sql import functions as F

    from mousedatapipeline_spark.session import get_spark
    from mousedatapipeline_spark.tables import load

    fixtures = [(l, p) for l, p in SCRATCH if Path(p).exists()]
    if not fixtures:
        sys.exit("skew_probe: no fixture data found (looked for "
                 + ", ".join(p for _, p in SCRATCH) + ")")
    spark = get_spark("skew_probe")
    label, d = fixtures[0]

    for k, v in [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
         "8MB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB"),
    ]:
        spark.conf.set(k, v)

    def joined(spread: bool):
        ev = load(spark, d, "events")
        if spread:
            ev = ev.repartition(32)  # >=32 map-output chunks
        fact = ev.select(
            F.when(F.col("user_id") % 10 < 8, F.lit(0))
             .otherwise(F.col("user_id") % 1000).alias("k"),
            "event_id",
            # md5 payload keeps the hot partition large after shuffle
            # compression (a constant key column compresses away)
            F.md5(F.col("event_id").cast("string")).alias("pay"))
        dim = spark.range(1000).select(
            F.col("id").alias("k2"), (F.col("id") * 7).alias("payload"))
        return (fact.join(dim, F.col("k") == F.col("k2"))
                .agg(F.sum(F.col("payload") + F.col("event_id"))
                      .alias("x"),
                     F.count("pay").alias("n")))

    results: dict[str, dict] = {"scale": label, "fact_dir": d}
    variants = [
        ("single_mapper_skewjoin_on", False, "true"),
        ("spread_skewjoin_on", True, "true"),
        ("spread_skewjoin_off", True, "false"),
    ]
    for name, spread, skew_on in variants:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        best, row, plan = None, None, ""
        for _ in range(3):
            q = joined(spread)  # fresh plan: no shuffle reuse
            t0 = time.time()
            row = q.collect()[0]
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
            plan = q._jdf.queryExecution().executedPlan().toString()
        results[name] = {
            "sec": round(best, 2),
            "rows_joined": row["n"],
            "checksum": int(row["x"]),
            "skew_split_in_plan": "skew=true" in plan,
        }
        print(name, json.dumps(results[name]), flush=True)
    checks = {r["checksum"] for k, r in results.items()
              if isinstance(r, dict) and "checksum" in r}
    results["checksums_match"] = len(checks) == 1
    # the probe's two claims, asserted so a Spark upgrade that changes
    # AQE behavior fails loudly here instead of silently in prose
    assert not results["single_mapper_skewjoin_on"]["skew_split_in_plan"], \
        "single-mapper scan unexpectedly produced a skew split"
    assert results["spread_skewjoin_on"]["skew_split_in_plan"], \
        "spread scan did not produce a skew split"
    Path(out_path).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
