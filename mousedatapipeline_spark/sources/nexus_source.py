"""Pluggable NeXus/HDF5 source: ``spark.read.format("nexus")``.

The DataSource-V2 face of S3-S9 ingestion (SURVEY.md §4 flagged this as
the "thin DataSource later" step): the same declarative
``IngestSchema`` path->column flattening as ``hdf5.ingest_hdf5``, but
exposed through PySpark's Python DataSource API so ingestion composes
like any other format:

    spark.dataSource.register(NexusDataSource)
    df = (spark.read.format("nexus")
          .option("path", "/data/20240101")          # dir of repetition files
          .load())

Planning: ONE InputPartition PER FILE — each file is read by its own
task, so ingestion parallelism equals file count (matching the
reference's per-repetition unit of work) and scales with the cluster,
not the driver. The driver only globs the listing.

File formats: ``.h5``/``.nxs`` via h5py when installed (import-gated —
not in this container); ``.json`` trees (nested dicts, the same fake
accepted by ``hdf5.read_h5_value``) everywhere, so the full source is
testable here. Keys (ymd, batch, repetition) parse from the
``{ymd}_{batch}_{repetition}`` stem, like the reference's directory
naming (src/YMD_class.py:33-44).
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from mousedatapipeline_spark.sources.hdf5 import (
    MOUSE_SCHEMA,
    HDF5Mapping,
    IngestSchema,
    flatten_tree,
)

_STEM_RE = re.compile(r"(\d{8})_(\d+)_(\d+)$")


def _parse_keys(path: str) -> dict:
    stem = os.path.splitext(os.path.basename(path))[0]
    # Tolerate prefixes like MOUSE_20240101_2_3 — match the trailing
    # ymd_batch_repetition triple.
    m = _STEM_RE.search(stem)
    if not m:
        return {"ymd": "", "batch": -1, "repetition": -1}
    return {"ymd": m.group(1), "batch": int(m.group(2)),
            "repetition": int(m.group(3))}


def _load_tree(path: str):
    if path.endswith(".json"):
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    try:  # pragma: no cover - h5py absent in this container
        import h5py
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            f"reading {path} requires h5py; only .json fixture trees "
            "are supported without it") from exc
    return h5py.File(path, "r")  # pragma: no cover


def _schema_from_options(options) -> IngestSchema:
    spec = options.get("mapping")
    if not spec:
        return MOUSE_SCHEMA
    mappings = tuple(
        HDF5Mapping(m["source_path"], m["column"], m.get("kind", "float"),
                    m.get("unit"))
        for m in json.loads(spec))
    return IngestSchema(mappings=mappings)


class NexusReader(DataSourceReader):
    def __init__(self, schema: IngestSchema, options):
        self._schema = schema
        root = options.get("path")
        if not root:
            raise ValueError("nexus source requires .option('path', dir)")
        pattern = options.get("glob", "*.json")
        self._files: Sequence[str] = sorted(
            glob.glob(os.path.join(root, pattern)))

    def partitions(self) -> Sequence[InputPartition]:
        # One file per partition: task parallelism == file count.
        return [InputPartition(f) for f in self._files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        path = partition.value
        tree = _load_tree(path)
        try:
            row = flatten_tree(tree, self._schema, _parse_keys(path))
        finally:
            close = getattr(tree, "close", None)
            if close:
                close()
        fields = [f.name for f in self._schema.spark_schema().fields]
        yield tuple(row[name] for name in fields)


class NexusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "nexus"

    def schema(self):
        return _schema_from_options(self.options).spark_schema()

    def reader(self, schema) -> NexusReader:
        return NexusReader(_schema_from_options(self.options), self.options)
