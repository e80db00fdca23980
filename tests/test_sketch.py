from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.sketch import (
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF001}/events.parquet").cache()


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_registers_partition_invariant(spark, events):
    # the sketch must be bit-identical on any partitioning (resume /
    # cluster-size invariance — the whole point of a mergeable sketch)
    a = _rows(hll_registers(events.repartition(1), "user_id"))
    b = _rows(hll_registers(events.repartition(16), "user_id"))
    assert a == b and len(a) > 0


def test_merge_equals_sketch_of_union(spark, events):
    left = events.where("event_id % 2 = 0")
    right = events.where("event_id % 2 = 1")
    merged = hll_merge(
        hll_registers(left, "user_id"), hll_registers(right, "user_id")
    )
    whole = hll_registers(events, "user_id")
    assert _rows(merged) == _rows(whole)


def test_estimate_accuracy(spark, events):
    exact = events.select("user_id").distinct().count()
    est = hll_estimate(hll_registers(events, "user_id")).collect()[0][
        "est_distinct"
    ]
    # raw HLL at p=8: sigma ~ 1.04/16 = 6.5%; 4 sigma bound
    assert abs(est - exact) / exact < 0.26, (est, exact)


def test_grouped_registers_and_estimate(spark, events):
    regs = hll_registers(events, "user_id", group_cols=("event_type",))
    ests = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate(regs, group_cols=("event_type",)).collect()
    }
    exacts = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(ests) == set(exacts)
    for k, exact in exacts.items():
        assert abs(ests[k] - exact) / exact < 0.30, (k, ests[k], exact)


def test_p_validation(spark, events):
    with pytest.raises(ValueError, match="p must be"):
        hll_registers(events, "user_id", p=2)


def test_cms_never_underestimates_and_is_tight(spark, events):
    from geoharvest_spark.sketch import cms_build, cms_estimate

    # exact per-type counts (5 types over 1000 events)
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sk = cms_build(events, "event_type")
    qs = events.select("event_type").distinct()
    est = {
        r["value"]: r["est_count"]
        for r in cms_estimate(sk, qs, "event_type").collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n  # the CM guarantee: never under
        # 5 distinct values in a 4x4096 table: collisions are ~impossible
        assert est[k] == n, (k, est[k], n)


def test_cms_merge_equals_build_on_union(spark, events):
    from geoharvest_spark.sketch import cms_build, cms_merge

    left = events.where("event_id % 2 = 0")
    right = events.where("event_id % 2 = 1")
    merged = cms_merge(
        cms_build(left, "user_id"), cms_build(right, "user_id")
    )
    whole = cms_build(events, "user_id")
    assert _rows(merged) == _rows(whole)


def test_cms_partition_invariance(spark, events):
    from geoharvest_spark.sketch import cms_build

    a = _rows(cms_build(events.repartition(1), "user_id"))
    b = _rows(cms_build(events.repartition(16), "user_id"))
    assert a == b and len(a) > 0


def test_cms_absent_value_estimates_zero_or_collision(spark, events):
    from geoharvest_spark.sketch import cms_build, cms_estimate

    sk = cms_build(events, "event_type")
    qs = spark.createDataFrame(
        [("never-seen-type",)], "event_type string"
    )
    est = cms_estimate(sk, qs, "event_type").collect()[0]["est_count"]
    assert est == 0  # 4x4096 with 5 values: all probes land on empty


def test_cms_validation(spark, events):
    import pytest

    from geoharvest_spark.sketch import cms_build

    with pytest.raises(ValueError, match="depth"):
        cms_build(events, "user_id", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_build(events, "user_id", width=8)


def test_hist_quantiles_bounded_relative_error(spark):
    import numpy as np

    from geoharvest_spark.sketch import hist_buckets, hist_quantiles

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    sk = hist_buckets(li, "l_extendedprice")
    got = {
        r["q"]: r["est"]
        for r in hist_quantiles(sk, (0.5, 0.9, 0.99)).collect()
    }
    vals = np.array(
        [r["l_extendedprice"] for r in li.select("l_extendedprice").collect()]
    )
    for q, est in got.items():
        exact = float(np.quantile(vals, q, method="inverted_cdf"))
        assert abs(est - exact) / exact < 2 ** -4, (q, est, exact)


def test_hist_merge_equals_build_on_union(spark):
    from geoharvest_spark.sketch import hist_buckets, hist_merge

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    left = li.where("l_orderkey % 2 = 0")
    right = li.where("l_orderkey % 2 = 1")
    merged = hist_merge(
        hist_buckets(left, "l_extendedprice"),
        hist_buckets(right, "l_extendedprice"),
    )
    whole = hist_buckets(li, "l_extendedprice")
    assert _rows(merged) == _rows(whole)


def test_hist_partition_invariance_and_small_exact(spark):
    from geoharvest_spark.sketch import hist_buckets, hist_quantiles

    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    a = _rows(hist_buckets(li.repartition(1), "l_extendedprice"))
    b = _rows(hist_buckets(li.repartition(16), "l_extendedprice"))
    assert a == b and len(a) > 0
    # values small enough for the sub-bit field are EXACT: quantiles of
    # a constant column equal the constant
    df = spark.range(100).selectExpr("0.31 as v")
    got = hist_quantiles(hist_buckets(df, "v"), (0.5,)).collect()[0]["est"]
    assert got == 0.31


def test_hist_validation(spark):
    import pytest

    from geoharvest_spark.sketch import hist_buckets

    df = spark.range(10).selectExpr("cast(id as double) v")
    with pytest.raises(ValueError, match="sub_bits"):
        hist_buckets(df, "v", sub_bits=13)
    with pytest.raises(ValueError, match="scale"):
        hist_buckets(df, "v", scale=0)


def test_cms_weighted_build(spark, events):
    from geoharvest_spark.sketch import cms_build, cms_estimate

    # weighting by an integer column == replicating rows that many times
    w = events.selectExpr("event_type", "cast(event_id % 3 as long) AS w")
    sk = cms_build(w, "event_type", weight_col="w")
    qs = events.select("event_type").distinct()
    est = {
        r["value"]: r["est_count"]
        for r in cms_estimate(sk, qs, "event_type").collect()
    }
    exact = {
        r["event_type"]: r["s"]
        for r in w.groupBy("event_type").agg(F.sum("w").alias("s")).collect()
    }
    assert est == exact  # 5 values in 4x4096: no collisions


def test_hll_extreme_p_and_type_mix(spark, events):
    from geoharvest_spark.sketch import hll_estimate, hll_registers

    # p=14: 16384 registers over 1000 distinct -> linear-counting branch
    regs = hll_registers(events, "event_id", p=14)
    est = hll_estimate(regs, p=14).collect()[0]["est_distinct"]
    exact = events.select("event_id").distinct().count()
    assert abs(est - exact) / exact < 0.05, (est, exact)
    # string column hashes by its cast-to-string value: '1' and 1 agree
    a = hll_registers(events.selectExpr("cast(user_id as string) u"), "u")
    b = hll_registers(events, "user_id")
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}


def test_hist_negative_values_clamp(spark):
    from geoharvest_spark.sketch import hist_buckets

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (0.001,), (2.0,)], "v double"
    )
    rows = {(r["e"], r["b"]): r["cnt"] for r in hist_buckets(df, "v").collect()}
    # -5, 0, 0.001 all clamp to x=1 (e=1, b=1); 2.0 -> x=200
    assert rows[(1, 1)] == 3 and sum(rows.values()) == 4
