"""Real-HDF5-bytes evidence for the ingest path (VERDICT r06 gap #1).

The container has no h5py, so until round 7 ``sources/hdf5.py`` /
``sources/nexus_source.py`` were exercised only against the dict-tree
fake. ``sources/minihdf5.py`` closes that: a pure-Python writer+reader
for the classic HDF5 file format (the publicly documented subset
libhdf5 writes by default), so these tests push GENUINE ``.h5`` bytes
through the same ``flatten_tree`` / ``mapInPandas`` / DataSource-V2
paths production would use with h5py.

Reference behavior modeled: ``src/utilities.py:11-63`` (mean-if-array,
0.0/''/None degradation) over per-repetition NeXus files.
"""

from __future__ import annotations

import hashlib
import struct
from pathlib import Path

import numpy as np
import pytest

from mousedatapipeline_spark.sources.hdf5 import (
    MOUSE_SCHEMA,
    flatten_tree,
    ingest_hdf5,
    open_h5,
)
from mousedatapipeline_spark.sources.minihdf5 import (
    MiniH5File,
    UnsupportedHDF5Feature,
    write_hdf5,
)

FIXTURE = Path(__file__).parent / "fixtures" / "MOUSE_20240101_2_1.nxs"
# Exact bytes of the committed golden fixture: the writer is
# deterministic, so regeneration must reproduce them bit-for-bit.
FIXTURE_SHA256 = (
    "1eb1fdb81715626198b00ff93d42e4eb2b306c92629f11c7af1d5415558169ad")
GOLDEN_SPEC = {
    "/entry/instrument/detector00/data": [[10.0, 20.0, 30.0],
                                          [40.0, 50.0, 60.0]],
    "/entry/instrument/detector00/count_time": 0.1,
    "/entry/sample/beam/flux": 1.5e6,
    "/entry/sample/transmission": 0.7,
    "/entry/instrument/monochromator/wavelength": 0.154,
    "/entry/instrument/detector00/transformations/det_x": 2.5,
    "/entry/sample/name": "golden demo sample",
    "/entry/experiment_identifier": "PROP-2024-001",
}

# Same logical content as GOLDEN_SPEC, in the dict-fake shape the rest
# of the suite uses — the parity target for real-bytes reads.
GOLDEN_TREE = {
    "entry": {
        "instrument": {
            "detector00": {
                "data": [[10.0, 20.0, 30.0], [40.0, 50.0, 60.0]],
                "count_time": 0.1,
                "transformations": {"det_x": 2.5},
            },
            "monochromator": {"wavelength": 0.154},
        },
        "sample": {"beam": {"flux": 1.5e6}, "transmission": 0.7,
                   "name": "golden demo sample"},
        "experiment_identifier": "PROP-2024-001",
    }
}
KEYS = {"ymd": "20240101", "batch": 2, "repetition": 1}


def test_golden_fixture_bytes_pinned():
    data = FIXTURE.read_bytes()
    assert hashlib.sha256(data).hexdigest() == FIXTURE_SHA256


def test_writer_is_deterministic(tmp_path):
    out = tmp_path / "regen.nxs"
    write_hdf5(str(out), GOLDEN_SPEC)
    assert out.read_bytes() == FIXTURE.read_bytes()


def test_fixture_is_structurally_valid_hdf5():
    """Format-level checks straight from the public spec, independent
    of the reader: signature, v0 superblock, EOF address, and every
    structure signature reachable from the root entry."""
    data = FIXTURE.read_bytes()
    assert data[:8] == b"\x89HDF\r\n\x1a\n"
    assert data[8] == 0                      # superblock version 0
    assert data[13] == 8 and data[14] == 8   # 8-byte offsets/lengths
    eof, = struct.unpack_from("<Q", data, 40)
    assert eof == len(data)
    root_hdr, = struct.unpack_from("<Q", data, 64)
    assert 96 <= root_hdr < len(data)
    cache_type, = struct.unpack_from("<I", data, 72)
    assert cache_type == 1
    btree, heap = struct.unpack_from("<QQ", data, 80)
    assert data[btree:btree + 4] == b"TREE"
    assert data[heap:heap + 4] == b"HEAP"


def test_real_bytes_match_dict_tree_through_flatten_tree():
    """The round-6 skip, closed: flatten_tree over REAL HDF5 bytes
    produces the same row as over the dict fake — including the 0.0
    sentinel for the path the fixture deliberately omits (sample_x,
    src/utilities.py:18-19 degradation)."""
    with MiniH5File(str(FIXTURE)) as f:
        via_bytes = flatten_tree(f, MOUSE_SCHEMA, KEYS)
    via_dict = flatten_tree(GOLDEN_TREE, MOUSE_SCHEMA, KEYS)
    assert via_bytes == via_dict
    assert via_bytes["sample_x"] == 0.0          # missing-path sentinel
    assert via_bytes["detector_data"] == [10.0, 20.0, 30.0,
                                          40.0, 50.0, 60.0]
    assert via_bytes["sample_name"] == "golden demo sample"
    assert via_bytes["transmission"] == 0.7


def test_reader_shapes_and_scalars(tmp_path):
    p = tmp_path / "shapes.h5"
    write_hdf5(str(p), {
        "/scalar": 3.25,
        "/vec": [1.0, 2.0, 3.0],
        "/mat": [[1.0, 2.0], [3.0, 4.0]],
        "/count": 42,
        "/label": "abc",
        "/empty_name": "",
    })
    f = MiniH5File(str(p))
    assert f["scalar"].shape == ()
    assert float(f["scalar"][()]) == 3.25
    assert f["vec"].shape == (3,)
    assert f["mat"].shape == (2, 2)
    np.testing.assert_array_equal(f["mat"][()],
                                  [[1.0, 2.0], [3.0, 4.0]])
    assert int(f["count"][()]) == 42
    assert f["label"][()] == b"abc"
    assert f["empty_name"][()] == b""
    with pytest.raises(KeyError):
        f["nope"]


def test_open_h5_falls_back_without_h5py():
    tree = open_h5(str(FIXTURE))
    try:
        assert float(tree["entry"]["sample"]["transmission"][()]) == 0.7
    finally:
        tree.close()


def test_reader_rejects_non_hdf5(tmp_path):
    p = tmp_path / "bogus.h5"
    p.write_bytes(b"not an hdf5 file, definitely")
    with pytest.raises(UnsupportedHDF5Feature):
        MiniH5File(str(p))


def test_reader_rejects_unknown_superblock(tmp_path):
    data = bytearray(FIXTURE.read_bytes())
    data[8] = 2  # pretend superblock v2
    p = tmp_path / "v2.h5"
    p.write_bytes(bytes(data))
    with pytest.raises(UnsupportedHDF5Feature):
        MiniH5File(str(p))


def test_many_names_force_multi_entry_snod(tmp_path):
    """A group with 40 children exercises name-sorted SNOD entries and
    heap offsets well past the first block."""
    spec = {f"/grp/ds{i:02d}": float(i) for i in range(40)}
    p = tmp_path / "wide.h5"
    write_hdf5(str(p), spec)
    f = MiniH5File(str(p))
    grp = f["grp"]
    assert sorted(grp.keys()) == [f"ds{i:02d}" for i in range(40)]
    assert all(float(grp[f"ds{i:02d}"][()]) == float(i)
               for i in range(40))


def test_ingest_hdf5_spark_end_to_end(spark, tmp_path):
    """S3-S5/S8 over REAL bytes: a repetition dir of minihdf5-written
    .h5 files through the distributed ``mapInPandas`` ingest."""
    rows = []
    for rep in (1, 2, 3):
        path = tmp_path / f"MOUSE_20240101_2_{rep}.h5"
        spec = dict(GOLDEN_SPEC)
        spec["/entry/sample/transmission"] = 0.5 + rep / 10
        if rep == 3:  # missing flux exercises the 0.0 sentinel in-plan
            del spec["/entry/sample/beam/flux"]
        write_hdf5(str(path), spec)
        rows.append((str(path), "20240101", 2, rep))
    manifest = spark.createDataFrame(
        rows, "path string, ymd string, batch int, repetition int")
    out = ingest_hdf5(manifest, MOUSE_SCHEMA).orderBy("repetition")
    got = [r.asDict() for r in out.collect()]
    assert [g["transmission"] for g in got] == [0.6, 0.7, 0.8]
    assert [g["flux"] for g in got] == [1.5e6, 1.5e6, 0.0]
    assert all(g["sample_name"] == "golden demo sample" for g in got)
    assert all(g["detector_data"] == [10.0, 20.0, 30.0, 40.0, 50.0, 60.0]
               for g in got)


def test_nexus_datasource_reads_real_h5(spark, tmp_path):
    """S15/S1: the DataSource-V2 face over real .h5 bytes — one input
    partition per file, keys parsed from the filename stem."""
    from mousedatapipeline_spark.sources.nexus_source import (
        NexusDataSource,
    )
    for rep in (1, 2):
        write_hdf5(str(tmp_path / f"MOUSE_20240101_7_{rep}.h5"),
                   GOLDEN_SPEC)
    spark.dataSource.register(NexusDataSource)
    df = (spark.read.format("nexus")
          .option("path", str(tmp_path))
          .option("glob", "*.h5")
          .load())
    got = sorted(df.collect(), key=lambda r: r["repetition"])
    assert [r["repetition"] for r in got] == [1, 2]
    assert all(r["batch"] == 7 for r in got)
    assert all(r["transmission"] == 0.7 for r in got)
    assert all(r["proposal"] == "PROP-2024-001" for r in got)


def test_h5py_cross_check():
    """Wherever h5py IS installed: stock libhdf5 must read the golden
    fixture identically, and MiniH5File must read an h5py-written file.
    Skipped here (no h5py), runs on any full environment."""
    h5py = pytest.importorskip("h5py")
    with h5py.File(str(FIXTURE), "r") as f:
        via_h5py = flatten_tree(f, MOUSE_SCHEMA, KEYS)
    with MiniH5File(str(FIXTURE)) as f:
        via_mini = flatten_tree(f, MOUSE_SCHEMA, KEYS)
    assert via_h5py == via_mini


# ---------------------------------------------------------------------------
# Property-based round trip: arbitrary trees survive write -> read ->
# flatten, exercising wide SNODs, deep nesting, unicode-ish names,
# empty strings, and n-d arrays far beyond the golden fixture's shape.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_name = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           max_codepoint=0x2FF),
    min_size=1, max_size=24)
_scalar = st.one_of(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=-2**62, max_value=2**62),
    # trailing NULs are unrepresentable under HDF5 null-pad string
    # semantics (stripped on read, like h5py) — not a round-trip bug
    st.text(max_size=40).map(lambda s: s.rstrip("\x00")),
)
_array = st.lists(
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    min_size=1, max_size=20)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.dictionaries(
    st.lists(_name, min_size=1, max_size=4).map(lambda p: "/".join(p)),
    st.one_of(_scalar, _array),
    min_size=1, max_size=30))
def test_round_trip_property(tmp_path, spec):
    # distinct leaf paths only: a path that is a strict PREFIX of
    # another is a group/dataset collision the writer rejects by
    # design — filter those inputs out rather than testing them here
    paths = sorted(spec)
    for a in paths:
        if any(b.startswith(a + "/") for b in paths if b != a):
            return
    p = tmp_path / f"prop_{abs(hash(tuple(paths))) % 10**8}.h5"
    write_hdf5(str(p), spec)
    with MiniH5File(str(p)) as f:
        for full, value in spec.items():
            node = f
            for part in full.split("/"):
                node = node[part]
            got = node[()]
            if isinstance(value, str):
                assert got == value.encode("utf-8")
            elif isinstance(value, int):
                assert int(got) == value
            elif isinstance(value, float):
                assert float(got) == value
            else:
                assert node.shape == (len(value),)
                assert [float(x) for x in got] == value
