"""Per-stage time profile of catalog queries via the Spark UI REST API.

Runs each named query (noop sink, min-of-N wall) in a session with the
UI on, then prints that query's stages sorted by stage WALL time (with
executor run/cpu, input / shuffle bytes), attributing wall time
empirically per guide §1.  The header line reports query wall vs the
sum of stage walls — the gap is driver-side work (planning, scheduling,
result handling) that no stage accounts for.

Usage: PYTHONPATH=. python tools/stage_profile.py q1 [q2 ...]
"""

from __future__ import annotations

import datetime
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def _ts(s: str) -> float:
    # "2026-08-17T12:00:00.123GMT" -> epoch seconds
    return datetime.datetime.strptime(
        s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()


def main() -> None:
    import __spark_entry__ as e
    from mousedatapipeline_spark.session import get_spark

    from pyspark.sql import SparkSession
    builder = SparkSession.builder.config("spark.ui.enabled", "true")
    # get_spark reapplies the rest; ui.enabled must be set pre-create
    spark = builder.master("local[32]").getOrCreate()
    spark = get_spark("stage_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = sys.argv[1:]

    qs["q02_order_census"](spark, SF).collect()  # warm

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
            return json.load(r)

    def jobs() -> list[dict]:
        with urllib.request.urlopen(f"{base}/jobs?status=succeeded") as r:
            return json.load(r)

    for n in names:
        # one untimed warm run, then a timed run profiled
        spark.sparkContext.setJobDescription(f"{n} (warm)")
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        before = {s["stageId"] for s in stages()}
        jbefore = {j["jobId"] for j in jobs()}
        spark.sparkContext.setJobDescription(n)
        t0 = time.time()
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in before]
        njobs = len([j for j in jobs() if j["jobId"] not in jbefore])
        for s in new:
            try:
                s["_wall"] = (_ts(s["completionTime"])
                              - _ts(s["firstTaskLaunchedTime"]))
                s["_sub"] = (_ts(s["firstTaskLaunchedTime"])
                             - _ts(s["submissionTime"]))
            except (KeyError, ValueError):
                s["_wall"] = s["_sub"] = 0.0
        new.sort(key=lambda s: -s["_wall"])
        stot = sum(s["_wall"] for s in new)
        print(f"\n=== {n}: wall={wall:.2f}s stage-wall-sum={stot:.2f}s "
              f"driver-gap={wall-stot:.2f}s jobs={njobs} "
              f"stages={len(new)}")
        for s in new[:14]:
            print(f"  wall={s['_wall']:5.2f}s sub={s['_sub']:4.2f}s "
                  f"run={s['executorRunTime']/1000:6.2f}s "
                  f"cpu={s.get('executorCpuTime',0)/1e9:6.2f}s "
                  f"tasks={s['numCompleteTasks']:4d} "
                  f"in={s['inputBytes']/1e6:7.1f}MB "
                  f"sr={s['shuffleReadBytes']/1e6:6.1f}MB "
                  f"sw={s['shuffleWriteBytes']/1e6:6.1f}MB "
                  f"| {s['name'].splitlines()[0][:52]}")


if __name__ == "__main__":
    main()
