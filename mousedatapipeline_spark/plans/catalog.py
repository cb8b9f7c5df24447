"""Query catalog: the single registry behind ``__spark_entry__``.

Every operator implemented from SURVEY.md §2 registers a ``QuerySpec``
here: a name, a Spark callable ``(spark, sf_dir) -> DataFrame``, and —
when SQL-expressible — an equivalent DuckDB oracle SQL string over the
same parquet tables. The driver hash-compares both at sf=0.01.

Conventions (required for the driver's order-insensitive value hash):
- alias every computed column identically in Spark and SQL;
- round floating-point aggregates on BOTH sides (Spark and DuckDB sum in
  different orders; per-row IEEE arithmetic matches bit-exactly, but
  reassociated sums and libm transcendentals do not);
- cast integer-ish outputs to BIGINT on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register query specs on import.
_QUERY_MODULES = (
    "mousedatapipeline_spark.plans.relational_queries",
    "mousedatapipeline_spark.plans.mouse_queries",
    "mousedatapipeline_spark.plans.text_queries",
    "mousedatapipeline_spark.plans.decontam_queries",
    "mousedatapipeline_spark.plans.similarity_queries",
    "mousedatapipeline_spark.plans.curation_queries",
    "mousedatapipeline_spark.plans.events_queries",
    "mousedatapipeline_spark.plans.image_queries",
    "mousedatapipeline_spark.plans.streaming_queries",
)


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""
    def wrap(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn
    return wrap


_ATTEMPTED: set[str] = set()


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        # Attempt each module at most once per process: a module that
        # registered some queries before raising would otherwise hit
        # the duplicate-name guard on every retry, masking the root
        # cause and spamming stderr.
        if mod in _ATTEMPTED:
            continue
        _ATTEMPTED.add(mod)
        try:
            importlib.import_module(mod)
        except Exception as exc:  # noqa: BLE001 - one broken module must
            # not erase the whole registry from the driver's view
            import sys
            import traceback
            print(f"CATALOG LOAD ERROR {mod}: {exc}", file=sys.stderr)
            traceback.print_exc()


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def spark_queries() -> dict[str, SparkQuery]:
    return {name: spec.spark for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_queries().items()
            if spec.oracle is not None}
