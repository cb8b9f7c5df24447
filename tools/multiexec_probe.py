"""Multi-executor probe: run a catalog slice under ``local-cluster``.

`SCALING.md`'s single-JVM probes (`tools/scale_probe.py`) deliberately
note what they do NOT show: multi-executor shuffle behavior. Spark's
``local-cluster[N,C,M]`` master launches N REAL executor JVMs (C cores,
M MiB each) with the standalone scheduler — shuffle blocks cross
process boundaries through the shuffle service path, broadcasts are
really transferred, and Python workers spawn per executor. Loopback
TCP stands in for the network, so ABSOLUTE times are not cluster
times; what this run proves is that every probed plan (a) executes and
(b) returns the same row counts it returns on ``local[32]``, with no
single-JVM crutch (shared memory, same-process broadcast) hiding a
plan defect.

Slice: shuffle-heavy aggregates/joins, the pair-emitting dedup family,
an Arrow ``mapInPandas`` kernel (Python workers on executors), and the
production funnel.

Found by this probe's first run (the reason it exists): executor
Python workers do NOT inherit the driver's ``sys.path``, so any
pickled UDF referencing ``mousedatapipeline_spark`` dies with
ModuleNotFoundError on a real cluster even though ``local[*]`` hides
it. The deployment answer is the standard one — ship the package as a
zip through ``sc.addPyFile`` (= ``spark-submit --py-files``), which
:func:`ship_package` builds; anything submitting this repo to a real
cluster should do the same.

Usage: PYTHONPATH=. python tools/multiexec_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PROBE = [
    "q01_pricing_summary",      # join + agg over lineitem
    "q24_window_analytics",     # partitioned windows
    "q31_scalable_percentiles", # two-pass histogram quantiles
    "e02_sessionization",       # event windows
    "k03_hll_set_ops",          # sketch partial-merge
    "t28_dsir_importance",      # hashed-bigram scan + broadcast LM
    "s03_minhash_lsh",          # banded LSH pair emitter
    "s19_lsh_verified_neardup", # LSH + verified Jaccard + checkpoint
    "s36_product_quantization", # vector subspace k-means assignment
    "mm08_audio_framing_census",  # Arrow mapInPandas on executors
    "c06_production_dedup_e2e", # the full funnel in one plan
    # round-7 widening (VERDICT r06 task 6): the iterative similarity
    # family — localCheckpoint state lives on EXECUTOR block managers
    # under local-cluster, so these prove the per-iteration checkpoint
    # reuse (s40/s43 edge list, s38 IVF assignment) works with real
    # executor-side storage, not the single-JVM shared-memory crutch
    "s38_knn_graph_stats",      # IVF cell-join + localCheckpoint reuse
    "s40_neardup_pagerank",     # 3 iterations over checkpointed edges
    "s43_label_propagation",    # integer label rounds, same edge list
    # Structured Streaming under real executors: per-executor state
    # store providers, watermark/session/sliding-sketch state — a
    # different execution surface than any batch plan
    "w01_stream_tumbling_counts",
    "w08_stream_session_window",
    "w16_stream_sliding_hll",
    # round-9 multimodal hardening: the dedup-first band join's eager
    # decode checkpoint and the star/rep-rep edge list now put kernel
    # output blocks on EXECUTOR block managers; row parity here proves
    # the guard joins + checkpoint reuse survive real process
    # boundaries, not just the single-JVM shared-memory crutch
    "mm03_phash_neardup",       # exact-first banded LSH + pair expand
    "mm06_media_dedup_clusters",  # linear edges -> components
    # round-10 s14 funnel: the exact-dedup window's eager member
    # checkpoint feeds the star branch AND the survivor enumeration
    # inside one materializing job (CC's edge checkpoint) — row
    # parity here proves that reuse works when the checkpoint blocks
    # live on executor block managers, not driver shared memory
    "s14_neardup_components",   # exact-first funnel -> components
]

# streaming fixtures are sized for sf0.01/sf0.1; the w-family reads
# sf-dir chunk files, so sfx scratch dirs (no chunks) are batch-only
STREAM_SCALES = {"w01_stream_tumbling_counts",
                 "w08_stream_session_window",
                 "w16_stream_sliding_hll"}

SCALES = [("sf0.1", "/root/testdata/sf0.1"),
          ("sfx10", "/tmp/mouse_scale_probe/sfx10")]


def ship_package() -> str:
    """Zip ``mousedatapipeline_spark`` for ``addPyFile`` distribution —
    the same artifact ``spark-submit --py-files`` would take."""
    pkg = Path(__file__).resolve().parent.parent / "mousedatapipeline_spark"
    base = Path(tempfile.mkdtemp(prefix="mexec_pkg_")) / "mousedatapipeline_spark"
    return shutil.make_archive(str(base), "zip",
                               root_dir=str(pkg.parent),
                               base_dir="mousedatapipeline_spark")


def get_cluster_spark():
    import pyspark
    from pyspark.sql import SparkSession

    os.environ.setdefault("SPARK_HOME",
                          os.path.dirname(pyspark.__file__))
    return (
        SparkSession.builder.master("local-cluster[4,8,8192]")
        # executors must run the SAME interpreter as the driver
        # (pickled Arrow UDFs are not cross-version portable)
        .config("spark.pyspark.python", sys.executable)
        .appName("multiexec_probe")
        # same SQL semantics/tuning as session.get_spark
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        .config("spark.executor.memory", "8g")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate())


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "MULTIEXEC.json"
    from mousedatapipeline_spark.plans.catalog import spark_queries

    spark = get_cluster_spark()
    try:
        spark.sparkContext.setLogLevel("WARN")
        spark.sparkContext.addPyFile(ship_package())
        n_exec = spark.sparkContext.getConf().get("spark.master")
        qs = spark_queries()
        results: dict[str, dict] = {}
        for name in PROBE:
            row: dict[str, dict] = {}
            for label, d in SCALES:
                if not Path(d).exists():
                    continue
                if name in STREAM_SCALES and label != "sf0.1":
                    continue
                try:
                    t0 = time.time()
                    cnt = qs[name](spark, d).count()
                    row[label] = {"sec": round(time.time() - t0, 2),
                                  "rows": cnt}
                except Exception as exc:  # noqa: BLE001 - record, go on
                    row[label] = {"error": f"{type(exc).__name__}: "
                                           f"{exc}"[:300]}
            results[name] = row
            print(name, json.dumps(row), flush=True)
        Path(out_path).write_text(json.dumps(
            {"master": n_exec, "results": results}, indent=1) + "\n")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
