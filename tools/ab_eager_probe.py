"""Interleaved lazy-vs-forced-eager localCheckpoint A/B harness.

The methodology behind SCALING.md's round-9 sweep table: this box's
3-10x single-query timing noise swamps any sequential comparison, so
each query runs lazy, eager, lazy, eager back-to-back in ONE warm
session (min of each variant's trials). "Eager" is a monkeypatch
forcing every ``localCheckpoint(eager=False)`` in the query's plan to
``eager=True`` — a whole-plan A/B, not a per-site one, which is why
results are attributed per query and per-site flips are then justified
by reading the plan shape (concurrent consumers -> eager; sequential
first consumer -> lazy).

Usage:
  PYTHONPATH=. python tools/ab_eager_probe.py [out.json] q1 q2 ...
  (no query names: the round-9 sweep's 28-query candidate list)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"

DEFAULT = [
    "q28_sole_late_supplier", "q44_logistic_regression_steps",
    "q45_delta_join_maintenance", "t15_bigram_surprisal",
    "t28_dsir_importance", "t33_heaps_fit", "s18_bloom_decontam",
    "t18_novelty_scan", "t21_shared_span_localization",
    "t30_split_contamination", "c06_production_dedup_e2e",
    "s03_minhash_lsh", "s10_kmeans_ivf", "s19_lsh_verified_neardup",
    "s22_incremental_neardup", "s26_minhash_accuracy",
    "s27_triangle_count", "s29_bbit_minhash", "s30_cluster_quality",
    "e13_skew_report", "e15_robust_outliers",
    "e16_rolling_active_users", "e19_weekly_churn",
    "e21_sequence_anomaly", "k01_cms_heavy_hitters",
    "k03_hll_set_ops", "k04_join_size_estimate", "w10_stream_decontam",
]


def main() -> None:
    import pyspark.sql.dataframe as D

    import __spark_entry__ as e
    from mousedatapipeline_spark.session import get_spark

    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else None
    names = (args[1:] if out_path else args) or DEFAULT

    orig = D.DataFrame.localCheckpoint

    def eager_forced(self, eager=False):
        return orig(self, eager=True)

    spark = get_spark("ab_eager_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    qs["q02_order_census"](spark, SF).collect()      # warm the JVM
    res = {}
    for n in names:
        t_lazy: list[float] = []
        t_eager: list[float] = []
        for _ in range(2):
            for variant, sink in (("lazy", t_lazy), ("eager", t_eager)):
                D.DataFrame.localCheckpoint = (
                    orig if variant == "lazy" else eager_forced)
                try:
                    t = time.time()
                    qs[n](spark, SF).collect()
                    sink.append(time.time() - t)
                finally:
                    D.DataFrame.localCheckpoint = orig
        res[n] = {"lazy": round(min(t_lazy), 3),
                  "eager": round(min(t_eager), 3)}
        print(n, res[n], flush=True)
    if out_path:
        Path(out_path).write_text(json.dumps(res, indent=1))
        print("wrote", out_path)


if __name__ == "__main__":
    main()
