"""Streaming catalog entry: the watcher path (W1-W5) run end-to-end in
``availableNow`` mode, checked against the equivalent BATCH SQL oracle.

The reference's "streaming" is ingestion-triggered batch (SURVEY.md
§2.8), so streaming/batch parity IS the correctness contract: draining
the landing area in one availableNow pass must produce exactly the
batch aggregation of the same files. That is what the oracle asserts.
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from mousedatapipeline_spark.operators.aggregates import dsum
from mousedatapipeline_spark.plans.catalog import register
from mousedatapipeline_spark.streaming import watcher

# events.parquet stores TIMESTAMP(NANOS); the stream reads it as long
# under the legacy conf and converts (same convention as tables.load).
_EVENTS_STREAM_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def _hourly_counts(batch: DataFrame) -> DataFrame:
    ts = F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    return (
        batch.withColumn("ts", ts)
        .groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.countDistinct("user_id").cast("bigint").alias("n_users"),
             stable_round(dsum("value")).alias("value_sum"))
    )


@register(
    "w01_stream_tumbling_counts",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {stable_round_sql(
               'CAST(SUM(CAST(value AS DECIMAL(30,10))) AS DOUBLE)')} AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    doc="W1-W5 end-to-end: events land in a staging dir, a Structured "
        "Streaming file source drains them availableNow through "
        "foreachBatch into a parquet sink, and the drained sink must "
        "equal the batch aggregation (streaming/batch parity oracle).",
)
def w01_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    work = Path(tempfile.mkdtemp(prefix="mouse_stream_"))
    landing = work / "landing"
    landing.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", landing / "events.parquet")

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 - locked conf: the read will surface it
        pass
    stream = watcher.stream_manifest(
        spark, str(landing), _EVENTS_STREAM_SCHEMA, fmt="parquet")
    sink = str(work / "sink")
    q = watcher.run_watcher(
        stream, _hourly_counts, sink, str(work / "ckpt"),
        available_now=True, dedupe_keys=None)
    q.awaitTermination(300)
    return spark.read.parquet(sink)
