"""Per-stage time profile of catalog queries via the Spark UI REST API.

Runs each named query once (noop sink) in a session with the UI on,
then prints that query's stages sorted by executorRunTime (with input /
shuffle bytes), attributing wall time empirically per guide §1.

Usage: PYTHONPATH=. python tools/stage_profile.py q1 [q2 ...]
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


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

    for n in names:
        before = {s["stageId"] for s in stages()}
        spark.sparkContext.setJobDescription(n)
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        spark.sparkContext.setJobDescription(None)
        new = [s for s in stages() if s["stageId"] not in before]
        new.sort(key=lambda s: -s["executorRunTime"])
        tot = sum(s["executorRunTime"] for s in new)
        print(f"\n=== {n}: {len(new)} stages, "
              f"executorRunTime total {tot/1000:.1f}s")
        for s in new[:12]:
            print(f"  run={s['executorRunTime']/1000:6.2f}s "
                  f"cpu={s.get('executorCpuTime',0)/1e9:6.2f}s "
                  f"tasks={s['numCompleteTasks']:4d} "
                  f"in={s['inputBytes']/1e6:8.1f}MB "
                  f"sr={s['shuffleReadBytes']/1e6:7.1f}MB "
                  f"sw={s['shuffleWriteBytes']/1e6:7.1f}MB "
                  f"fetchWait={s.get('shuffleFetchWaitTime',0)/1000:5.2f}s "
                  f"| {s['name'].splitlines()[0][:60]}")


if __name__ == "__main__":
    main()
