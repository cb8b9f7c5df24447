"""Interleaved A/B: s14's `mem` checkpoint eager (round-10 form) vs
lazy (round-11 form), one warm session, min-of-N per variant.

The "old" variant is the round-10 body verbatim (eager=True on mem);
the "new" variant is whatever the module currently ships. s34 is
measured through a patch of the module-level s14 symbol it calls.

Usage: PYTHONPATH=. python tools/ab_s14_mem.py [trials]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.1"


def old_s14(spark, sf_dir):
    """Round-10 s14 body: eager mem checkpoint (everything else the
    shipped code)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import mousedatapipeline_spark.operators.similarity as S
    import mousedatapipeline_spark.operators.text as T
    from mousedatapipeline_spark.operators.graph import connected_components
    from mousedatapipeline_spark.plans.similarity_queries import (
        MAX_NEARDUP_DEGREE,
        exact_jaccard_edges,
    )
    from mousedatapipeline_spark.functions.rounding import stable_round
    from mousedatapipeline_spark.tables import load

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source", "th")
    mem = (d.select("doc_id", "lang", "source", "text",
                    T.content_hash(F.col("text")).alias("th"))
           .withColumn("rep", F.min("doc_id").over(w))
           .localCheckpoint(eager=True))
    star = (mem.filter((F.col("doc_id") != F.col("rep"))
                       & (F.length("text") >= 3))
            .select(F.col("rep").alias("d1"),
                    F.col("doc_id").alias("d2")))
    reps = (mem.filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "lang", "source", "text")
            .repartition(spark.sparkContext.defaultParallelism))
    raw = exact_jaccard_edges(
        reps, redistribute=spark.sparkContext.defaultParallelism
    ).select("d1", "d2", "n_common",
             stable_round(F.col("jaccard_raw")).alias("jaccard_raw"))
    capped = S.degree_cap_edges(raw, MAX_NEARDUP_DEGREE) \
        .select("d1", "d2")
    edges = capped.unionByName(star)
    cc = connected_components(d.select("doc_id"), edges,
                              "doc_id", "d1", "d2")
    sizes = cc.groupBy("component_id") \
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    return (cc.join(sizes, "component_id")
            .select("doc_id", "component_id", "n_members",
                    (F.col("doc_id") == F.col("component_id"))
                    .cast("int").alias("is_canonical")))


def main() -> None:
    import __spark_entry__ as e
    import mousedatapipeline_spark.plans.similarity_queries as simq
    from mousedatapipeline_spark.session import get_spark

    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab_s14_mem")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    qs["q02_order_census"](spark, SF).write.mode(
        "overwrite").format("noop").save()

    new_s14 = simq.s14_neardup_components

    def run(fn):
        t0 = time.time()
        fn(spark, SF).write.mode("overwrite").format("noop").save()
        return time.time() - t0

    for label, target in (("s14", None), ("s34", "s34_quality_canonical")):
        best = {"old": 1e9, "new": 1e9}
        # warm both variants once
        for variant in ("old", "new"):
            simq.s14_neardup_components = (
                old_s14 if variant == "old" else new_s14)
            fn = qs[target] if target else simq.s14_neardup_components
            try:
                run(fn)
            finally:
                simq.s14_neardup_components = new_s14
        for _ in range(trials):
            for variant in ("old", "new"):
                simq.s14_neardup_components = (
                    old_s14 if variant == "old" else new_s14)
                fn = qs[target] if target else simq.s14_neardup_components
                try:
                    best[variant] = min(best[variant], run(fn))
                finally:
                    simq.s14_neardup_components = new_s14
        print(f"{label}: old(eager mem)={best['old']:.2f}s "
              f"new(lazy mem)={best['new']:.2f}s", flush=True)

    # row parity old vs new (sf0.1)
    a = sorted(map(tuple, old_s14(spark, SF).collect()))
    b = sorted(map(tuple, new_s14(spark, SF).collect()))
    print("rows identical:", a == b, len(a))


if __name__ == "__main__":
    main()
