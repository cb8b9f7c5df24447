"""Measure the w-family's per-batch driver machinery from
StreamingQueryProgress (VERDICT r10 item 7): durationMs breakdown —
triggerExecution vs queryPlanning vs addBatch vs state commit — for a
query's availableNow drain.

The registered w-callables run the drain internally and return the
sink read, so this probe attaches a StreamingQueryListener and records
every progress event fired while the callable runs.

Usage: PYTHONPATH=. python tools/w13_planning_probe.py w13_stream_bootstrap [...]
"""

from __future__ import annotations

import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql.streaming import StreamingQueryListener

    import __spark_entry__ as e
    from mousedatapipeline_spark.session import get_spark

    spark = get_spark("w13probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    events: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            events.append(event.progress)

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(L())

    for n in sys.argv[1:]:
        events.clear()
        import time
        t0 = time.time()
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        tot = defaultdict(float)
        nbatch = 0
        for p in events:
            nbatch += 1
            for k, v in (p.durationMs or {}).items():
                tot[k] += v / 1e3
        print(f"\n=== {n}: wall={wall:.2f}s batches={nbatch}")
        for k, v in sorted(tot.items(), key=lambda kv: -kv[1]):
            print(f"  {k:25s} {v:6.2f}s")


if __name__ == "__main__":
    main()
