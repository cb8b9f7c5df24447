"""J1/J2/J3/J6 join semantics, including the as-of edge cases the
reference's mask-selection logic depends on
(src/processstep_add_mask_file.py:34-81)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mousedatapipeline_spark.operators.joins import (
    anti_members,
    asof_join,
    background_self_join,
    broadcast_lookup,
    semi_members,
)


def _masks(spark):
    return spark.createDataFrame(
        [(1, 100, "m100"), (1, 200, "m200"), (2, 150, "m150")],
        "config int, mask_day int, mask string")


def _meas(spark):
    return spark.createDataFrame(
        [(1, 150, "a"), (1, 200, "b"), (1, 50, "c"), (2, 500, "d"), (3, 100, "e")],
        "config int, day int, name string")


def test_asof_picks_latest_not_after(spark):
    out = {r["name"]: r["mask_asof"] for r in asof_join(
        _meas(spark), _masks(spark), ["config"], "day", "mask_day",
        ["mask"]).collect()}
    assert out["a"] == "m100"   # 150 -> nearest <= is 100
    assert out["b"] == "m200"   # equal date is inclusive (<=)
    assert out["c"] is None     # no mask dated before day 50
    assert out["d"] == "m150"
    assert out["e"] is None     # config 3 has no masks at all


def test_asof_never_selects_future_mask(spark):
    # Golden invariant: mask_ymd <= measurement ymd, always
    # (src/processstep_add_mask_file.py:69).
    rows = asof_join(_meas(spark), _masks(spark), ["config"], "day",
                     "mask_day", ["mask_day"]).collect()
    for r in rows:
        if r["mask_day_asof"] is not None:
            assert r["mask_day_asof"] <= r["day"]


def test_asof_tolerance(spark):
    out = {r["name"]: r["mask_asof"] for r in asof_join(
        _meas(spark), _masks(spark), ["config"], "day", "mask_day",
        ["mask"], tolerance=F.lit(10)).collect()}
    assert out["a"] is None       # 150-100=50 > 10
    assert out["b"] == "m200"     # exact match within tolerance


def test_broadcast_lookup_first_match_dedupe(spark):
    fact = spark.createDataFrame([(1, "x")], "k int, payload string")
    dim = spark.createDataFrame(
        [(1, "keep"), (1, "drop")], "k int, v string")
    rows = broadcast_lookup(fact, dim, ["k"]).collect()
    assert len(rows) == 1          # one output row per fact row
    assert rows[0]["v"] == "drop"  # deterministic first by column order


def test_background_self_join_same_batch_guard(spark):
    df = spark.createDataFrame(
        [(1, 1, 0.5), (2, 1, 0.7)], "batch int, bg_batch int, t double")
    out = {r["batch"]: r for r in background_self_join(
        df, ["batch"], ["bg_batch"], ["t"]).collect()}
    assert out[1]["same_as_bg_bg"] is True    # its own background
    assert out[2]["same_as_bg_bg"] is False
    assert out[2]["t_bg"] == 0.5              # bg row's value attached


def test_semi_anti_partition_manifest(spark):
    manifest = spark.createDataFrame([(1,), (2,), (3,)], "id int")
    done = spark.createDataFrame([(2,), (2,)], "id int")
    assert {r["id"] for r in anti_members(manifest, done, ["id"]).collect()} \
        == {1, 3}
    assert {r["id"] for r in semi_members(manifest, done, ["id"]).collect()} \
        == {2}
