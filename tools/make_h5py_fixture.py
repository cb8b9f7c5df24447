"""Generate the libhdf5-written golden fixture (ADVICE r09, medium).

Every hand-crafted v2/v4/dense fixture in tests/test_minihdf5.py is
built from the same spec reading as the parser, so a shared
misreading (e.g. whether a filtered chunk's stored size includes the
fletcher32 checksum) would pass green while real libhdf5 bytes
misparse. The fix is a fixture written by libhdf5 ITSELF:

    python tools/make_h5py_fixture.py

writes ``tests/fixtures/libver_latest_h5py.h5`` — one small
libver='latest' file exercising, in a single binary, every "latest"
feature minihdf5 claims: v3 superblock, v2 (OHDR) object headers,
compact links, a chunked+gzip+shuffle+fletcher32 dataset (v4 layout),
a vlen-str attribute, and a DENSE (>8, fractal-heap) attribute set.

This container has neither h5py nor libhdf5 (no pip/apt allowed), so
the binary cannot be generated here; the generator is committed so
any environment WITH h5py produces it deterministically (fixed data,
no timestamps — h5py omits object times under libver='latest').
``tests/test_minihdf5.py::test_libhdf5_written_fixture`` reads the
fixture UNCONDITIONALLY whenever the file exists — it never silently
skips because h5py is missing, only because the binary itself is
absent — and pins the expected values below.
"""
from __future__ import annotations

import pathlib
import sys

FIXTURE = (pathlib.Path(__file__).resolve().parent.parent
           / "tests" / "fixtures" / "libver_latest_h5py.h5")

# Single source of truth for the expected content — the test imports
# these instead of restating them.
SCALAR = 3.25
CHUNKED_SHAPE = (7, 5)          # edge chunks on both axes with (4, 3)
CHUNKS = (4, 3)
DENSE_ATTRS = {f"a{i:02d}": float(i * i) for i in range(12)}
UNITS = b"nm"
VLEN_NOTE = "written by libhdf5"


def chunked_value():
    import numpy as np
    return (np.arange(35, dtype="<f8") * 1.5).reshape(CHUNKED_SHAPE)


def main() -> int:
    try:
        import h5py
    except ImportError:
        print("h5py is not installed — run this in an environment "
              "with h5py to (re)generate the fixture", file=sys.stderr)
        return 1
    with h5py.File(str(FIXTURE), "w", libver="latest") as f:
        g = f.create_group("entry")
        d = g.create_dataset("scalar", data=SCALAR)
        d.attrs["units"] = UNITS
        d.attrs["note"] = VLEN_NOTE          # vlen str attribute
        c = g.create_dataset(
            "stack", data=chunked_value(), chunks=CHUNKS,
            compression="gzip", shuffle=True, fletcher32=True)
        for k, v in DENSE_ATTRS.items():     # >8 -> dense storage
            c.attrs[k] = v
    print(f"wrote {FIXTURE}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
