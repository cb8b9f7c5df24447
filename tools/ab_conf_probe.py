"""Interleaved config A/B harness (round-10 optimization).

Same methodology as ab_eager_probe: this box's single-query timing
noise swamps sequential comparisons, so each query runs A, B, A, B
back-to-back in ONE warm session and each variant reports its min.
Variant B is a set of runtime-settable SQL confs applied around the
run (restored after); variant A is the session default.

Usage:
  PYTHONPATH=. python tools/ab_conf_probe.py out.json \
      'spark.sql.join.preferSortMergeJoin=false,...' q1 q2 ...
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def main() -> None:
    import __spark_entry__ as e
    from mousedatapipeline_spark.session import get_spark

    out_path = sys.argv[1]
    confs = dict(kv.split("=", 1) for kv in sys.argv[2].split(","))
    names = sys.argv[3:]
    trials = 3

    spark = get_spark("ab_conf_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    def run(n: str) -> float:
        t = time.time()
        qs[n](spark, SF).write.mode("overwrite").format("noop").save()
        return time.time() - t

    def set_confs(on: bool) -> None:
        for k, v in confs.items():
            if on:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)

    run(names[0])  # warm the JVM + parquet footers
    res = {}
    for n in names:
        t_a: list[float] = []
        t_b: list[float] = []
        for _ in range(trials):
            t_a.append(run(n))
            set_confs(True)
            try:
                t_b.append(run(n))
            finally:
                set_confs(False)
        res[n] = {"a": round(min(t_a), 3), "b": round(min(t_b), 3)}
        print(n, res[n], flush=True)
    res["__confs__"] = confs
    Path(out_path).write_text(json.dumps(res, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
