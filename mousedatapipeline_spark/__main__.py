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
from pyspark.sql import DataFrame, SparkSession

from mousedatapipeline_spark import pipeline as P

# Canonical orderings and the step registry live in pipeline.py — the
# CLI is a thin name-resolution layer over them.
PROGRAMS = {"nostack": P.NOSTACK_STEPS, "full": P.FULL_STEPS}


def run(argv: list[str] | None = None,
        spark: SparkSession | None = None) -> DataFrame:
    ap = argparse.ArgumentParser(prog="mousedatapipeline_spark")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--program", choices=sorted(PROGRAMS), default=None)
    ap.add_argument("--steps", nargs="+",
                    choices=sorted(P.STEP_BUILDERS),
                    default=None,
                    help="explicit ordered step list (overrides --program)")
    ap.add_argument("--output", default=None,
                    help="write the result here (otherwise show 5 rows)")
    ap.add_argument("--format", choices=("parquet", "csv"),
                    default="parquet")
    ap.add_argument("--settings", default=None,
                    help="MOUSE_settings.yaml-style file; its sf_dir "
                         "(engine extension) or saxs_dir supplies "
                         "--sf-dir when that flag is left at default")
    # Selection flags of the reference CLI
    # (src/directory_processor.py:154-156): restrict the manifest to
    # one ymd / batch / repetition — predicates evaluate in the scan.
    ap.add_argument("--ymd", default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--repetition", type=int, default=None)
    # Batch-range form of the reference's multibatch drivers
    # (directory_processor_multibatch*.sh: iterate min..max batch; here
    # one plan covers the whole range).
    ap.add_argument("--min-batch", type=int, default=None)
    ap.add_argument("--max-batch", type=int, default=None)
    # Catalog escape hatch: run any registered query by name instead
    # of a step program (python -m mousedatapipeline_spark --query
    # s03_minhash_lsh --sf-dir ... [--output ...]). `--query list`
    # prints the inventory.
    ap.add_argument("--query", default=None, metavar="NAME|list")
    args = ap.parse_args(argv)

    if args.settings:
        from mousedatapipeline_spark.config import SettingsCarrier
        carrier = SettingsCarrier.from_yaml(args.settings)
        if args.sf_dir == ap.get_default("sf_dir"):
            args.sf_dir = str(carrier.sf_dir or carrier.saxs_dir)

    if args.query == "list":
        from mousedatapipeline_spark.plans.catalog import all_queries
        for name, spec in all_queries().items():
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}\t{kind}")
        return None

    # Validate the query name BEFORE building a session: the catalog
    # lookup needs no JVM, and a typo should fail in milliseconds, not
    # after Spark startup.
    if args.query:
        from mousedatapipeline_spark.plans.catalog import all_queries
        qs = all_queries()
        if args.query not in qs:
            ap.error(f"unknown query {args.query!r} "
                     f"(--query list shows the catalog)")

    step_names = args.steps or PROGRAMS[args.program or "full"]
    own_session = spark is None
    if own_session:
        from mousedatapipeline_spark.session import get_spark
        spark = get_spark("mousedatapipeline_spark_cli")

    from pyspark.sql import functions as F

    if args.query:
        out = qs[args.query].spark(spark, args.sf_dir)
        step_names = [f"query:{args.query}"]
    else:
        from mousedatapipeline_spark.plans.mouse_queries import (
            pipeline_inputs,
        )
        m, logbook = pipeline_inputs(spark, args.sf_dir)
        for col, val in (("ymd", args.ymd), ("batch", args.batch),
                         ("repetition", args.repetition)):
            if val is not None:
                m = m.filter(F.col(col) == val)
        if args.min_batch is not None:
            m = m.filter(F.col("batch") >= args.min_batch)
        if args.max_batch is not None:
            m = m.filter(F.col("batch") <= args.max_batch)
        out = P.program_from_names(step_names, logbook)(m)

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
