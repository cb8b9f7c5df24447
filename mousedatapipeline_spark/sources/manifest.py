"""Manifest source (S1/S2) + completeness filtering (F1/F2): the
repetition-directory worklist as a DataFrame.

Reference: the batch worklist comes from globbing
``{data_dir}/{year}/{ymd}/{ymd}_{batch}_*/`` (src/directory_processor.py:90-95)
and parsing ``ymd_batch_repetition`` directory names into typed keys
(src/YMD_class.py:33-44). Completeness requires exact per-pattern file
counts (src/checkers.py:19-46); already-processed repetitions are
skipped (src/checkers.py:5-13).

Scale: the manifest is built from Spark's distributed ``binaryFile``
listing (driver-side listing parallelized by the source), carries
``(year, ymd)`` partition columns for pruning, and all gating is
expressed as joins/aggregations — no driver-side loops over
directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.aggregates import census
from mousedatapipeline_spark.operators.filters import completeness_check
from mousedatapipeline_spark.operators.joins import anti_members

# ymd_batch_repetition, e.g. 20240131_12_3 (src/YMD_class.py:33-44)
DIR_KEY_REGEX = r"(\d{8})_(\d+)_(\d+)"

REPETITION_KEYS = ("ymd", "batch", "repetition")


def scan_files(spark: SparkSession, root: str,
               glob: str = "*") -> DataFrame:
    """S1 — distributed file listing: path, length, modificationTime.

    Uses the ``binaryFile`` source with content dropped immediately, so
    only metadata flows; the listing itself is parallelized by Spark.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "length", "modificationTime")
    )


def extract_keys(df: DataFrame, path_col: str = "path") -> DataFrame:
    """S2/P16 — parse (ymd, batch, repetition) from the path and derive
    date / year partition columns."""
    p = F.col(path_col)
    return (
        df.withColumn("ymd", F.regexp_extract(p, DIR_KEY_REGEX, 1))
        .withColumn("batch", F.regexp_extract(p, DIR_KEY_REGEX, 2)
                    .cast("int"))
        .withColumn("repetition", F.regexp_extract(p, DIR_KEY_REGEX, 3)
                    .cast("int"))
        .filter(F.col("ymd") != "")
        .withColumn("measurement_date", F.to_date("ymd", "yyyyMMdd"))
        .withColumn("year", F.year("measurement_date"))
    )


def repetition_manifest(files: DataFrame) -> DataFrame:
    """F1 — one row per repetition with per-pattern file counts and the
    completeness verdict + missing list (src/checkers.py:19-46).

    Patterns mirror `processing_possible`: a complete repetition has
    exactly 2 sub-measurement detector masters, 2 instrument snapshots,
    and 1 of each at top level.
    """
    path = F.col("path")
    in_subdir = path.rlike(r"(beam_profile|beam_profile_through_sample)/")
    is_master = path.rlike(r"eiger_\d+_master\.h5$")
    is_craw = path.rlike(r"im_craw\.nxs$")
    counts = census(files, list(REPETITION_KEYS), {
        "n_sub_master": in_subdir & is_master,
        "n_sub_craw": in_subdir & is_craw,
        "n_top_master": ~in_subdir & is_master,
        "n_top_craw": ~in_subdir & is_craw,
    })
    return completeness_check(counts, {
        "n_sub_master": 2, "n_sub_craw": 2,
        "n_top_master": 1, "n_top_craw": 1,
    })


def pending_repetitions(manifest: DataFrame,
                        processed: DataFrame) -> DataFrame:
    """F2 — complete-but-unprocessed repetitions (left-anti join against
    the processed-output table; src/checkers.py:5-13)."""
    complete = manifest.filter(F.col("is_complete"))
    return anti_members(complete, processed, REPETITION_KEYS)
