"""Event-stream query catalog over the ``events`` table: tumbling-window
aggregation and gap-based sessionization — the batch twins of the
Structured Streaming surface in ``streaming/`` (SURVEY.md §2.8: the
reference's "streaming" is ingestion-triggered batch, so the same
transformations serve both modes via ``foreachBatch``).

Timestamps: events.parquet stores TIMESTAMP(NANOS); both engines
truncate to microseconds on read (see tables._load_events), so
second-level bucketing below is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mousedatapipeline_spark.functions.rounding import (
    stable_round,
    stable_round_sql,
)
from mousedatapipeline_spark.operators.aggregates import dsum
from mousedatapipeline_spark.operators.windows import sessionize
from mousedatapipeline_spark.plans.catalog import register
from mousedatapipeline_spark.tables import load


@register(
    "e01_tumbling_counts",
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
    doc="W-ext: tumbling 1-hour window counts / distinct users / value "
        "sum per event type. In streaming mode the same agg runs under "
        "a watermark (streaming/watcher.py).",
)
def e01_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")),
                          "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.countDistinct("user_id").cast("bigint").alias("n_users"),
             stable_round(dsum("value")).alias("value_sum"))
    )


@register(
    "e02_sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR CAST(epoch(ts) AS BIGINT)
                     - CAST(epoch(lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id))
                            AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id,
           CAST(MAX(session_seq) AS BIGINT) AS n_sessions,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM s GROUP BY user_id
    """,
    doc="Gap-based sessionization (30 min): per-user session count via "
        "lag + running sum — two uses of one (user, ts) sort/shuffle.",
)
def e02_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Tie-break equal timestamps by event_id so lag() is deterministic.
    sess = sessionize(
        ev.withColumn("ts", F.col("ts")), "user_id", "ts",
        gap_seconds=1800, tiebreak="event_id")
    return sess.groupBy("user_id").agg(
        F.max("session_seq").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"))
