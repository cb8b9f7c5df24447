"""Attribute the run-vs-cpu gap of a query's worst stages (VERDICT r10
item 5): per-stage task-metric breakdown — CPU, JVM GC, shuffle fetch
wait, shuffle write time, (de)serialization, scheduler delay — via the
UI REST API with task summaries.

Usage: PYTHONPATH=. python tools/stage_waits.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as e
    from mousedatapipeline_spark.session import get_spark

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.config("spark.ui.enabled", "true")
    spark = builder.master("local[32]").getOrCreate()
    spark = get_spark("stage_waits")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    qs["q02_order_census"](spark, SF).collect()  # warm

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    def get(path: str):
        with urllib.request.urlopen(f"{base}/{path}") as r:
            return json.load(r)

    for n in sys.argv[1:]:
        fn = qs[n]
        fn(spark, SF).write.mode("overwrite").format("noop").save()  # warm
        before = {s["stageId"] for s in get("stages?status=complete")}
        t0 = time.time()
        fn(spark, SF).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        new = [s for s in get("stages?status=complete")
               if s["stageId"] not in before]
        new.sort(key=lambda s: -s.get("executorRunTime", 0))
        print(f"\n=== {n}: wall={wall:.2f}s")
        for s in new[:4]:
            run = s["executorRunTime"] / 1e3
            cpu = s["executorCpuTime"] / 1e9
            gc = s.get("jvmGcTime", 0) / 1e3
            fetch = s.get("shuffleFetchWaitTime", 0) / 1e3
            swt = s.get("shuffleWriteTime", 0) / 1e9
            deser = s.get("executorDeserializeTime", 0) / 1e3
            tasks = s["numCompleteTasks"]
            print(f"  stage {s['stageId']}: tasks={tasks} run={run:.2f}s "
                  f"cpu={cpu:.2f}s gc={gc:.2f}s fetchWait={fetch:.2f}s "
                  f"shufWrite={swt:.2f}s deser={deser:.2f}s "
                  f"unattr={run - cpu - gc - fetch - swt:.2f}s")
            # task-level quantiles for the unattributed share
            try:
                q = get(f"stages/{s['stageId']}/0/taskSummary"
                        "?quantiles=0.0,0.5,1.0")
                dur = q.get("duration", [])
                qcpu = [v / 1e6 for v in q.get("executorCpuTime", [])]
                print(f"    task duration min/med/max = "
                      f"{[round(v/1e3, 2) for v in dur]}s  "
                      f"cpu(ms) = {[round(v, 0) for v in qcpu]}")
            except Exception as exc:  # noqa: BLE001
                print(f"    (no summary: {exc})")


if __name__ == "__main__":
    main()
