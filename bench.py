"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through the `noop` sink (full execution, no
driver collect) — the measured time is the distributed plan, not result
serialization. Every query runs $SPARK_GRAFT_BENCH_TRIALS times
(default 2) and reports the per-query MINIMUM: single-run times in this
environment swing 3-10x from JIT/GC noise unrelated to the plan, and
the minimum is the stable estimator of plan cost. `value` is the sum of
the reported minima.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from mousedatapipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    qs = entrymod.queries()

    if not qs:
        print(json.dumps({"metric": "catalog_total_runtime", "value": -1.0,
                          "unit": "sec", "queries": {}, "sf": sf,
                          "errors": {"__catalog__": "no queries registered"}}))
        return

    # Warm the JVM + parquet footer caches once; a broken warm query
    # must not kill the bench (the guarded loop will time/record it).
    try:
        warm = next(iter(qs.values()))
        warm(spark, sf_dir).write.mode("overwrite").format("noop").save()
    except Exception as exc:  # noqa: BLE001
        print(f"BENCH WARMUP ERROR: {exc}", file=sys.stderr)

    trials = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "2")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, fn in qs.items():
        best = None
        for _ in range(trials):
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.mode("overwrite") \
                    .format("noop").save()
            except Exception as exc:  # noqa: BLE001 - one bad query must
                # not lose the whole bench line
                errors[name] = f"{type(exc).__name__}: {exc}"[:200]
                print(f"BENCH ERROR {name}: {errors[name]}",
                      file=sys.stderr)
                best = None  # a query is timed XOR errored, never both
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        if best is not None:
            timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)

    out = {
        "metric": "catalog_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
