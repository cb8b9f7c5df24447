"""Generate VERIFICATION.md: the evidence ledger for every catalog
query — which round's driver correctness row proves it (if any), and
what local verification the unproven backlog carries meanwhile.

Sources: plans/catalog.py's green/stale sets (the rotation policy's
single source of truth) and the CORRECTNESS_r*.json files.

Run after catalog changes: PYTHONPATH=. python tools/verification_doc.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> None:
    from mousedatapipeline_spark.plans.catalog import (
        _PROVEN,
        _R01_GREEN,
        _R02_GREEN,
        _R03_NEW,
        _STALE_PROOF,
        all_queries,
    )
    qs = all_queries()
    rows = []
    for name, spec in qs.items():
        if name in _STALE_PROOF:
            state = "re-verify (changed after its green row)"
        elif name in _R02_GREEN:
            state = "driver-green (r02)"
        elif name in _R01_GREEN:
            state = "driver-green (r01)"
        elif spec.oracle is None:
            state = "rows-only (non-SQL kernel; closed-form tests)"
        elif name in _R03_NEW:
            state = "local-green (added r03, queued for driver)"
        else:
            state = "local-green (queued for driver)"
        rows.append((name, state))
    n_proven = sum(n in _PROVEN for n, _ in rows)
    n_rows_only = sum(qs[n].oracle is None for n, _ in rows)
    n_queued = len(rows) - n_proven - n_rows_only
    lines = [
        "# VERIFICATION — evidence ledger",
        "",
        "Every oracled query is checked locally against its DuckDB",
        "oracle at BOTH sf0.01 and sf0.1 before commit",
        "(tools/check_correctness.py); the driver independently",
        "re-proves a ~50-query prefix per round and records",
        "CORRECTNESS_r{N}.json. Registration order IS the evidence",
        "policy (plans/catalog.py): unproven queries claim the prefix,",
        "proven ones yield it, changed queries rejoin the pool.",
        "",
        f"State: **{n_proven} driver-proven**, **{n_queued} local-green",
        f"queued for driver rows**, **{n_rows_only} rows-only** "
        f"(of {len(rows)} total).",
        "",
        "| query | evidence |",
        "|---|---|",
    ]
    lines += [f"| {n} | {s} |" for n, s in sorted(rows)]
    (ROOT / "VERIFICATION.md").write_text("\n".join(lines) + "\n")
    print(f"VERIFICATION.md: {len(rows)} queries "
          f"({n_proven} proven / {n_queued} queued / {n_rows_only} rows-only)")


if __name__ == "__main__":
    main()
