"""Test-table loaders for the driver-provided synthetic star schema.

Tables (one parquet each, see TESTDATA.md): region nation customer
supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Small dimensions: always broadcast-eligible at any scale factor in this
# schema (region=5 rows, nation=25). customer/supplier/part grow with SF
# but stay dimension-sized relative to lineitem/orders.
BROADCAST_DIMS = ("region", "nation", "supplier")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``load`` + round-robin repartition to the cluster's parallelism.

    For queries that do per-row-EXPENSIVE work right off the scan
    (tokenize/ngram/explode over text): the local fixture is a single
    parquet file -> ONE input partition, which single-threads the scan
    stage. The repartition shuffles the raw rows once (small — it is
    the raw table, pre-explosion, strictly cheaper than the
    post-explosion shuffle these queries already pay) and buys full
    parallelism for the expensive projection.

    Conditional on the scan's actual split count: on a real cluster
    the source is already many splits and this returns the plain scan
    — an unconditional repartition would be a pure-overhead shuffle of
    the whole corpus at 100 TB. Metadata-only queries should use plain
    :func:`load` and keep their one-stage scan.
    """
    df = load(spark, sf_dir, name)
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the ``ts`` column to a session-zoned (UTC) TIMESTAMP.

    The driver's generator has emitted ``ts`` as TIMESTAMP(NANOS) (read
    as bigint under the legacy conf) and as TIMESTAMP_NTZ across
    versions; downstream operators assume plain TIMESTAMP semantics
    matching DuckDB's naive timestamps.
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":  # raw nanos: truncate to micros. DIV is
        # exact integer division — `/` would round-trip through double,
        # whose ulp at epoch-nanos magnitude (~2^60) is ~256 ns, enough
        # to land one microsecond low on cast('long') truncation.
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_type == "timestamp_ntz":
        # Naive micros timestamp: with the session pinned to UTC this cast
        # is a pure type relabel, keeping wall-clock parity with DuckDB.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Allow reading TIMESTAMP(NANOS) parquet as long — the single home
    of the legacy-conf idiom (also used by the streaming file sources)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 - conf locked down: fall through, the
        pass           # read will surface PARQUET_TYPE_ILLEGAL if so


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet has stored ``ts`` as TIMESTAMP(NANOS) — which
    Spark's vectorized parquet reader rejects by default — or
    TIMESTAMP_NTZ. Read nanos as long (legacy conf) and normalize."""
    ensure_nanos_conf(spark)
    return normalize_events_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (mirrors the DuckDB oracle setup)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
