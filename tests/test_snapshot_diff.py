"""snapshot_diff semantics: action classification, unchanged-row
elision, NULL-safe value compare, composite keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.joins import snapshot_diff


def test_actions_and_unchanged_elision(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    new = spark.createDataFrame(
        [(2, 21.0), (3, 30.0), (4, 40.0)], ["k", "v"])
    got = {r.k: (r.action, r.old_v, r.new_v)
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert got == {1: ("delete", 10.0, None),
                   2: ("update", 20.0, 21.0),
                   4: ("insert", None, 40.0)}  # 3 unchanged -> dropped


def test_null_safe_value_compare(spark):
    old = spark.createDataFrame([(1, None), (2, None), (3, 5.0)],
                                "k: bigint, v: double")
    new = spark.createDataFrame([(1, None), (2, 2.0), (3, None)],
                                "k: bigint, v: double")
    got = {r.k: r.action
           for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL is "unchanged" under eqNullSafe; NULL vs value is update
    assert got == {2: "update", 3: "update"}


def test_composite_keys(spark):
    old = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")],
                                ["g", "i", "v"])
    new = spark.createDataFrame([("a", 1, "x"), ("b", 1, "z")],
                                ["g", "i", "v"])
    out = snapshot_diff(old, new, ["g", "i"], ["v"]) \
        .orderBy("g", "i").collect()
    assert [(r.g, r.i, r.action) for r in out] == \
        [("a", 2, "delete"), ("b", 1, "insert")]


def test_column_pruning_reaches_scan(spark, tmp_path):
    """Only keys + compare columns may be read from the source."""
    p = str(tmp_path / "snap")
    spark.range(10).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v"),
        F.lit("wide-unused-payload").alias("payload")).write.parquet(p)
    df = spark.read.parquet(p)
    plan = snapshot_diff(df, df, ["k"], ["v"]) \
        ._jdf.queryExecution().executedPlan().toString()
    reads = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert reads and all("payload" not in ln for ln in reads)


def test_incremental_agg_merge_matches_direct_and_retires_groups(spark):
    from mousedatapipeline_spark.operators.aggregates import (
        incremental_agg_merge,
    )
    # groups: g1 updated, g2 fully deleted (retired), g3 unchanged,
    # g4 newly inserted
    old = spark.createDataFrame(
        [(1, "g1", 10.0), (2, "g1", 5.0), (3, "g2", 7.0), (4, "g3", 1.0)],
        ["k", "g", "v"])
    new = spark.createDataFrame(
        [(1, "g1", 12.5), (2, "g1", 5.0), (4, "g3", 1.0), (5, "g4", 9.0)],
        ["k", "g", "v"])
    got = {r.g: (r.n_rows, float(r.sum_value))
           for r in incremental_agg_merge(old, new, "k", "g", "v")
           .collect()}
    direct = {r.g: (r.n, float(r.s)) for r in
              new.groupBy("g").agg(
                  F.count("*").alias("n"),
                  F.sum(F.col("v").cast("decimal(30,10)")).alias("s"))
              .collect()}
    assert got == direct
    assert "g2" not in got  # count reached zero -> retired


def test_incremental_agg_merge_handles_group_migration(spark):
    """A row whose group key changes must retract from the old group
    and insert into the new one (caught by the property test)."""
    from mousedatapipeline_spark.operators.aggregates import (
        incremental_agg_merge,
    )
    old = spark.createDataFrame([(1, "a", 10.0), (2, "a", 3.0)],
                                ["k", "g", "v"])
    new = spark.createDataFrame([(1, "b", 10.0), (2, "a", 3.0)],
                                ["k", "g", "v"])
    got = {r.g: (r.n_rows, float(r.sum_value))
           for r in incremental_agg_merge(old, new, "k", "g", "v")
           .collect()}
    assert got == {"a": (1, 3.0), "b": (1, 10.0)}


def test_q47_merge_semantics_match_row_level_reference(spark):
    """q47's per-status rollup equals a row-level MERGE reference
    computed in plain Python over the same orders table: base is the
    90% (key % 10 != 0), the change feed inserts %10==0, deletes
    %10==1, updates %10==2 (+100.0), and unmatched U/D are no-ops."""
    from mousedatapipeline_spark.plans.relational_queries import (
        q47_merge_upsert)

    sf = "/root/testdata/sf0.001"
    orders = {r.o_orderkey: (r.o_orderstatus, r.o_totalprice)
              for r in spark.read.parquet(f"{sf}/orders.parquet")
              .select("o_orderkey", "o_orderstatus", "o_totalprice")
              .collect()}
    state, flags = {}, {}
    for k, (st, pr) in orders.items():
        if k % 10 != 0:
            state[k] = (st, pr)
    for k, (st, pr) in orders.items():
        m = k % 10
        if m == 0:                      # insert (never in base)
            state[k] = (st, pr)
            flags[k] = "I"
        elif m == 1:                    # delete (always in base)
            state.pop(k, None)
        elif m == 2:                    # update (always in base)
            state[k] = (st, pr + 100.0)
            flags[k] = "U"
    expect = {}
    for k, (st, pr) in state.items():
        n, nu, ni, mn, mx, rev = expect.get(
            st, (0, 0, 0, None, None, 0.0))
        expect[st] = (n + 1,
                      nu + (flags.get(k) == "U"),
                      ni + (flags.get(k) == "I"),
                      k if mn is None else min(mn, k),
                      k if mx is None else max(mx, k),
                      rev + pr)
    got = {r.o_orderstatus: r for r in q47_merge_upsert(spark, sf).collect()}
    assert set(got) == set(expect)
    for st, (n, nu, ni, mn, mx, rev) in expect.items():
        r = got[st]
        assert (r.n_orders, r.n_updated, r.n_inserted) == (n, nu, ni), st
        assert (r.min_key, r.max_key) == (mn, mx), st
        assert abs(r.revenue - rev) < max(1e-6 * abs(rev), 1e-6), st


def test_q48_zorder_skipping_matches_bit_reference(spark):
    """q48 equals a plain-Python reference: same 16-bit scaling, same
    bit interleave, same 64-file packing, same rectangle workload —
    and the z-order layout must scan no more file-query pairs than
    the custkey-only layout (the point of z-ordering)."""
    from mousedatapipeline_spark.plans.relational_queries import (
        _Q48_NFILES_SHIFT_LIN, _Q48_NFILES_SHIFT_Z, _Q48_QUERIES,
        q48_zorder_skipping)

    sf = "/root/testdata/sf0.001"
    rows = (spark.read.parquet(f"{sf}/orders.parquet")
            .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d")
            .collect())
    cks = [r.o_custkey for r in rows]
    ds = [r.d.toordinal() for r in rows]
    ckmn, ckspan = min(cks), max(max(cks) - min(cks), 1)
    dmn, dspan = min(ds), max(max(ds) - min(ds), 1)
    import math
    boxes = {}
    for ck, dd in zip(cks, ds):
        ux = math.floor((ck - ckmn) * 65535 / ckspan)
        uy = math.floor((dd - dmn) * 65535 / dspan)
        z = 0
        for b in range(16):
            z += ((ux >> b) & 1) << (2 * b + 1)
            z += ((uy >> b) & 1) << (2 * b)
        for layout, fid in (("zorder", z >> _Q48_NFILES_SHIFT_Z),
                            ("linear", ux >> _Q48_NFILES_SHIFT_LIN)):
            mnx, mxx, mny, mxy = boxes.get(
                (layout, fid), (ux, ux, uy, uy))
            boxes[(layout, fid)] = (min(mnx, ux), max(mxx, ux),
                                    min(mny, uy), max(mxy, uy))
    expect = {}
    for (layout, fid), (mnx, mxx, mny, mxy) in boxes.items():
        n, sc = expect.get(layout, (0, 0))
        hits = sum(1 for _, x0, x1, y0, y1 in _Q48_QUERIES
                   if mnx <= x1 and mxx >= x0 and mny <= y1 and mxy >= y0)
        expect[layout] = (n + 1, sc + hits)
    got = {r.layout: r for r in q48_zorder_skipping(spark, sf).collect()}
    assert set(got) == set(expect)
    for layout, (n, sc) in expect.items():
        assert (got[layout].n_files, got[layout].scanned_pairs) == (n, sc)
    assert (got["zorder"].scanned_pairs
            <= got["linear"].scanned_pairs)
