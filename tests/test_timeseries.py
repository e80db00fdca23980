from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.timeseries import (
    max_concurrent,
    rolling_range_sum,
    scd2_intervals,
)


def test_rolling_range_sum_brute(spark):
    # key A: values at t=0,5,10,12 with window 10s (range (t-10, t])
    rows = [
        ("A", 0, 1.00),
        ("A", 5, 2.00),
        ("A", 10, 4.00),
        ("A", 12, 8.00),
        ("B", 0, 100.00),
        ("B", 100, 50.00),
    ]
    df = spark.createDataFrame(rows, "k string, sec long, v double").select(
        "k", F.timestamp_seconds("sec").alias("ts"), "v"
    )
    out = {
        (r["k"], r["ts_sec"]): r["roll"]
        for r in rolling_range_sum(df, "k", "ts", "v", 10, "roll").collect()
    }
    assert out[("A", 0)] == 1.0
    assert out[("A", 5)] == 3.0
    assert out[("A", 10)] == 7.0  # 0 is INSIDE [-10, 0] of t=10
    assert out[("A", 12)] == 14.0  # 5,10,12 in (2, 12]; 0 is out
    assert out[("B", 100)] == 50.0


def test_rolling_equal_ts_peers(spark):
    # two rows at the same second are RANGE peers: both see both
    df = spark.createDataFrame(
        [("A", 7, 1.25), ("A", 7, 2.50)], "k string, sec long, v double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "v")
    vals = [
        r["roll"]
        for r in rolling_range_sum(df, "k", "ts", "v", 5, "roll").collect()
    ]
    assert vals == [3.75, 3.75]


def test_scd2_islands(spark):
    rows = [
        (1, 0, "a", 10),
        (1, 10, "a", 11),
        (1, 20, "b", 12),
        (1, 30, "a", 13),
        (2, 0, "x", 20),
    ]
    df = spark.createDataFrame(
        rows, "u long, sec long, attr string, eid long"
    ).select("u", F.timestamp_seconds("sec").alias("ts"), "attr", "eid")
    out = scd2_intervals(df, "u", "ts", "attr", "eid").collect()
    got = sorted(
        (r["u"], r["attr"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in out
    )
    assert got == [
        (1, "a", 0, 20, 2),
        (1, "a", 30, None, 1),
        (1, "b", 20, 30, 1),
        (2, "x", 0, None, 1),
    ]


def test_scd2_same_second_tiebreak(spark):
    # two events in the same second order by the tiebreak id
    rows = [(1, 5, "a", 1), (1, 5, "b", 2), (1, 9, "b", 3)]
    df = spark.createDataFrame(
        rows, "u long, sec long, attr string, eid long"
    ).select("u", F.timestamp_seconds("sec").alias("ts"), "attr", "eid")
    out = sorted(
        (r["attr"], r["valid_from"], r["valid_to"], r["n_events"])
        for r in scd2_intervals(df, "u", "ts", "attr", "eid").collect()
    )
    assert out == [("a", 5, 5, 1), ("b", 5, None, 2)]


def test_max_concurrent_halfopen(spark):
    # [0,10) [5,15) [10,20): at t=10 the first closed -> peak 2
    rows = [("k", 0, 10), ("k", 5, 15), ("k", 10, 20)]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    r = max_concurrent(df, "g", "s", "e").collect()[0]
    assert (r["max_concurrent"], r["n_intervals"]) == (2, 3)


def test_max_concurrent_nested_and_touching(spark):
    rows = [
        ("k", 0, 100),
        ("k", 10, 20),
        ("k", 10, 20),  # duplicate interval
        ("k", 20, 30),  # starts exactly when two end
        ("q", 0, 1),
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    out = {
        r["g"]: (r["max_concurrent"], r["n_intervals"])
        for r in max_concurrent(df, "g", "s", "e").collect()
    }
    assert out["k"] == (3, 4)
    assert out["q"] == (1, 1)


def test_max_concurrent_brute_force(spark):
    # pseudo-random intervals vs an O(n^2) reference
    rows = [
        ("g", (i * 37) % 50, (i * 37) % 50 + (i * 13) % 17 + 1)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "g string, s long, e long")
    got = max_concurrent(df, "g", "s", "e").collect()[0]["max_concurrent"]
    best = max(
        sum(1 for s, e in [(r[1], r[2]) for r in rows] if s <= t < e)
        for t in range(0, 70)
    )
    assert got == best
