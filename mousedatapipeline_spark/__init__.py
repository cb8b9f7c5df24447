"""mousedatapipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of
BAMresearch/MOUSEDataPipeline (the automated SAXS processing pipeline),
re-expressed Spark-first: immutable DataFrame transformations, Catalyst
optimization, pandas-UDF image kernels, Structured Streaming ingestion.

Layout
------
- ``session``    : SparkSession builder tuned for the target scale.
- ``config``     : MOUSE_settings.yaml carrier (reference defaults chain).
- ``tables``     : test-table loaders (explicit schemas, ts
                   normalization) replacing the reference's
                   convention-fixed HDF5 path dictionaries.
- ``sources/``   : manifest scan, logbook/mask dimension loaders, HDF5
                   ingestion (gated), parquet/CSV/JSONL/bucketed sinks.
- ``operators/`` : pure ``DataFrame -> DataFrame`` transformations, one
                   per reference process step family (filters, joins,
                   aggregates, expressions, windows) plus the
                   training-data extensions (dedup, similarity, text,
                   sketches, multimodal, graph, sampling, bloom).
- ``functions/`` : Column-expression builders (physics, rounding) and
                   the pandas-UDF image kernels (beam analysis).
- ``pipeline``   : the reference's step programs as composable chains.
- ``plans/``     : the query catalog consumed by ``__spark_entry__``.
- ``streaming/`` : Structured Streaming watcher front-end + stateful ops.
"""

__version__ = "0.1.0"
