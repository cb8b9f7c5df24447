"""CLI face of the engine — the reference's directory-processor
interface re-expressed (src/directory_processor.py:145-181: a human
names an ordered step list; here the steps compose into ONE lazy plan).

    python -m mousedatapipeline_spark \
        --sf-dir /root/testdata/sf0.001 \
        --steps metadata_update flux_and_transmissions tcf_propagation \
                apply_tcf background_thickness stacker \
        --output /tmp/stacked --format parquet

``--program nostack|full`` selects a canonical ordering (the
multibatch-nostack script or the watcher's full program) instead of an
explicit ``--steps`` list. Output formats mirror the reference's two
sinks: parquet (S11 stacked file) and csv (S12 summary table).
"""

from __future__ import annotations

import argparse
import sys
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mousedatapipeline_spark import pipeline as P

# Step name -> builder(ctx) -> Step. Mirrors the reference's
# importlib-by-name step resolution (src/directory_processor.py:126-142)
# with an explicit registry instead of module import side effects.
STEP_BUILDERS: Mapping[str, Callable] = {
    "metadata_update": lambda ctx: P.metadata_update(ctx["logbook"]),
    "flux_and_transmissions": lambda ctx: P.flux_and_transmissions,
    "tcf_propagation": lambda ctx: P.tcf_propagation,
    "apply_tcf": lambda ctx: P.apply_tcf_step,
    "background_thickness": lambda ctx: P.background_thickness(),
    "stacker": lambda ctx: P.stack,
}

PROGRAMS = {
    # src/directory_processor_multibatch_nostack.sh:17-32
    "nostack": ("metadata_update", "flux_and_transmissions",
                "tcf_propagation", "apply_tcf", "background_thickness"),
    # src/watcher.py:78-89
    "full": ("metadata_update", "flux_and_transmissions",
             "tcf_propagation", "apply_tcf", "background_thickness",
             "stacker"),
}


def build_inputs(spark: SparkSession, sf_dir: str):
    """Measurements + logbook exactly as the m05 catalog query derives
    them from the synthetic tables (plans/mouse_queries.py)."""
    from mousedatapipeline_spark.plans.mouse_queries import measurements

    m = measurements(spark, sf_dir).withColumns({
        "bg_ymd": F.col("ymd"),
        "bg_batch": (F.col("batch").cast("bigint") / 10).cast("bigint") * 10,
    })
    logbook = m.select("ymd", "batch").distinct().withColumn(
        "sample_name", F.concat_ws("_", F.lit("S"), F.col("batch")))
    return m, logbook


def run(argv: list[str] | None = None,
        spark: SparkSession | None = None) -> DataFrame:
    ap = argparse.ArgumentParser(prog="mousedatapipeline_spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--program", choices=sorted(PROGRAMS), default=None)
    ap.add_argument("--steps", nargs="+", choices=sorted(STEP_BUILDERS),
                    default=None,
                    help="explicit ordered step list (overrides --program)")
    ap.add_argument("--output", default=None,
                    help="write the result here (otherwise show 5 rows)")
    ap.add_argument("--format", choices=("parquet", "csv"),
                    default="parquet")
    args = ap.parse_args(argv)

    step_names = args.steps or PROGRAMS[args.program or "full"]
    own_session = spark is None
    if own_session:
        from mousedatapipeline_spark.session import get_spark
        spark = get_spark("mousedatapipeline_spark_cli")

    m, logbook = build_inputs(spark, args.sf_dir)
    ctx = {"logbook": logbook}
    program = P.compose(*[STEP_BUILDERS[n](ctx) for n in step_names])
    out = program(m)

    if args.output:
        writer = out.write.mode("overwrite")
        if args.format == "csv":
            writer.option("header", True).csv(args.output)
        else:
            writer.parquet(args.output)
        print(f"wrote {args.output} [{args.format}] "
              f"steps={','.join(step_names)}")
    else:
        out.show(5, truncate=False)
    return out


def main() -> None:
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
