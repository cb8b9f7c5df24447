"""Interleaved pinned-vs-plain-checkpoint A/B harness (round 10).

Same methodology as ab_eager_probe.py: this box's timing noise swamps
sequential comparisons, so each query runs pinned, plain, pinned,
plain back-to-back in ONE warm session (min of each variant's trials).
"Plain" monkeypatches ``tables.pin_keyed`` back
to the pre-round-10 behavior — a bare ``localCheckpoint(eager=True)``
with AQE left on (UnknownPartitioning, per-consumer re-exchange).

Usage:
  PYTHONPATH=. python tools/ab_pin_probe.py [out.json] q1 q2 ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"

DEFAULT = [
    "s14_neardup_components", "c06_production_dedup_e2e",
    "s21_semantic_dedup", "mm06_media_dedup_clusters",
    "s40_neardup_pagerank", "s43_label_propagation",
    "t37_textrank_keywords", "s34_quality_canonical",
    "s19_lsh_verified_neardup", "s33_cross_source_dup_matrix",
]


def main() -> None:
    import __spark_entry__ as e
    from mousedatapipeline_spark import tables
    from mousedatapipeline_spark.session import get_spark

    args = sys.argv[1:]
    out_path = args[0] if args and args[0].endswith(".json") else None
    names = (args[1:] if out_path else args) or DEFAULT

    orig_pin = tables.pin_keyed

    def plain_pin(df, keys, sort=True):
        return df.localCheckpoint(eager=True)

    spark = get_spark("ab_pin_probe")
    qs = e.queries()
    qs["q02_order_census"](spark, SF).write.mode(
        "overwrite").format("noop").save()

    results: dict[str, dict[str, float]] = {}
    for n in names:
        fn = qs[n]
        fn(spark, SF).write.mode("overwrite").format("noop").save()  # warm
        best: dict[str, float] = {}
        for _ in range(3):
            for variant in ("pinned", "plain"):
                tables.pin_keyed = (plain_pin if variant == "plain"
                                    else orig_pin)
                try:
                    t0 = time.time()
                    fn(spark, SF).write.mode("overwrite") \
                        .format("noop").save()
                    dt = time.time() - t0
                finally:
                    tables.pin_keyed = orig_pin
                best[variant] = min(best.get(variant, 1e9), dt)
        results[n] = {k: round(v, 3) for k, v in best.items()}
        print(f"{n}: pinned={best['pinned']:.2f}s "
              f"plain={best['plain']:.2f}s", flush=True)

    if out_path:
        Path(out_path).write_text(json.dumps(results, indent=1) + "\n")


if __name__ == "__main__":
    main()
