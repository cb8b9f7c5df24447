"""Duplicate-mass scaling probe for the multimodal near-dup family.

`tools/scale_probe.py` can't stress the mm queries (they pin a fixed
doc_id < 300 media set so their oracles stay closed-form), so this
probe mints media directly: N assets over 150 distinct payloads, i.e.
group size N/150 — duplicate mass grows linearly with N while distinct
content stays fixed, the exact shape that melts an unguarded banded
self-join quadratically.

Measures the mm06 funnel (aHash kernel -> exact-hash dedup -> banded
LSH over distinct hashes -> star/rep-rep edges -> connected components
-> census) against the pre-round-9 pair-based plan
(phash_neardup_pairs -> CC) at 1x/10x/30x duplicate mass, min-of-2.
The SCALING.md round-9 table is this probe's output.

Usage: PYTHONPATH=. python tools/mm_dupmass_probe.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mousedatapipeline_spark.operators.graph import (
        connected_components,
    )
    from mousedatapipeline_spark.operators.multimodal import (
        ahash_media,
        attach_synthetic_media,
        phash_neardup_edges,
        phash_neardup_pairs,
    )

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def funnel(n: int, use_edges: bool):
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 150).alias("payload_key"))
        media = attach_synthetic_media(docs, "doc_id",
                                       key_col="payload_key")
        h = ahash_media(media)
        e = (phash_neardup_edges(h, max_hamming=3) if use_edges
             else phash_neardup_pairs(h, max_hamming=3)
             .select("d1", "d2"))
        nodes = docs.select(F.col("doc_id").alias("media_id"))
        cc = connected_components(nodes, e, "media_id", "d1", "d2")
        sizes = cc.groupBy("component_id").agg(
            F.count(F.lit(1)).alias("n"))
        return sizes.agg(F.count(F.lit(1)).alias("ncomp"),
                         F.sum("n").alias("nmedia")).collect()[0]

    out: dict = {}
    # pair-based plan only to 10x: its within-group pair mass is
    # (N/150)^2 * 150 — ~27 M pairs at 30x, the enumeration wall the
    # edges plan exists to avoid.
    for label, use_edges, ns in (("edges", True, (3000, 30000, 90000)),
                                 ("pairs", False, (3000, 30000))):
        for n in ns:
            best, row = None, None
            for _ in range(2):
                t = time.time()
                row = funnel(n, use_edges)
                el = time.time() - t
                best = el if best is None else min(best, el)
            out[f"{label}_n{n}"] = {
                "sec": round(best, 2), "components": row["ncomp"],
                "media": row["nmedia"]}
            print(f"{label} n={n}: {best:.2f}s "
                  f"comps={row['ncomp']}", flush=True)

    path = sys.argv[1] if len(sys.argv) > 1 else "MM_DUPMASS.json"
    Path(path).write_text(json.dumps(out, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
