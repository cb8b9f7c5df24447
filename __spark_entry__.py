"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mousedatapipeline_spark.plans.catalog`` — every
implemented operator from SURVEY.md §2 registers a QuerySpec there with
a Spark callable and (when SQL-expressible) a DuckDB oracle string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mousedatapipeline_spark.plans import catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the MOUSE pipeline end-to-end (m05) at sf0.001 —
    logbook broadcast join, flux/transmission physics, TCF window
    propagation, background self-join, and the stacked per-batch
    summary, in one lazy plan."""
    qs = catalog.all_queries()
    try:
        df = qs["m05_pipeline_e2e"].spark(spark, SMOKE_SF_DIR)
        df.limit(1).count()  # force one tiny execution: DataFrames are
        # lazy, so plan construction alone would not catch runtime
        # breakage and the fallback below would never fire
        return df
    except Exception as exc:  # noqa: BLE001 - smoke must survive a
        # broken flagship; fall back to the simplest grouped scan —
        # LOUDLY, so the degrade is visible in driver logs
        import sys
        import traceback
        print(f"ENTRY FLAGSHIP ERROR (falling back to q01): {exc}",
              file=sys.stderr)
        traceback.print_exc()
        return qs["q01_pricing_summary"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.spark_queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sqls()
