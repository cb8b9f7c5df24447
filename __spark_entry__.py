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
    """Flagship query: grouped pricing summary (A1/A2 shape) at sf0.001."""
    return catalog.all_queries()["q01_pricing_summary"].spark(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.spark_queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sqls()
