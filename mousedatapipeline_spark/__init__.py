"""mousedatapipeline_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of
BAMresearch/MOUSEDataPipeline (the automated SAXS processing pipeline),
re-expressed Spark-first: immutable DataFrame transformations, Catalyst
optimization, pandas-UDF image kernels, Structured Streaming ingestion.

Layout
------
- ``session``    : SparkSession builder tuned for the target scale.
- ``schemas``    : explicit StructTypes replacing the reference's
                   convention-fixed HDF5 path dictionaries.
- ``sources/``   : manifest scan, logbook/mask dimension loaders, HDF5
                   ingestion (gated), parquet/CSV sinks.
- ``operators/`` : pure ``DataFrame -> DataFrame`` transformations, one
                   per reference process step family (filters, joins,
                   aggregates, expressions, windows) plus the
                   training-data extensions (dedup, similarity, text,
                   multimodal).
- ``functions/`` : Column-expression builders (physics, arrays, hashing).
- ``kernels``    : pandas-UDF image kernels (beam analysis).
- ``plans/``     : step composition + the query catalog consumed by
                   ``__spark_entry__``.
- ``streaming/`` : Structured Streaming watcher front-end.
"""

__version__ = "0.1.0"
