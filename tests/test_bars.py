from __future__ import annotations

import datetime as dt

import pytest

from geoharvest_spark.bars import ohlc_bars

SF001 = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _ev(i, typ, sec, us, val):
    return (i, dt.datetime(2024, 1, 1, 1, 0, sec, us), 1, typ, val, "{}")


def test_ohlc_semantics(spark):
    rows = [
        _ev(1, "a", 10, 0, 5.0),
        _ev(2, "a", 20, 0, 9.0),   # high
        _ev(3, "a", 30, 0, 1.0),   # low
        _ev(4, "a", 40, 0, 7.0),   # close
        # same-instant open tie -> lower event_id wins
        _ev(6, "b", 0, 0, 3.0),
        _ev(5, "b", 0, 0, 2.0),
        _ev(7, "b", 1, 0, 4.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["series"]: (r["open"], r["high"], r["low"], r["close"], r["n_events"])
        for r in ohlc_bars(df).collect()
    }
    assert got["a"] == (5.0, 9.0, 1.0, 7.0, 4)
    assert got["b"] == (2.0, 4.0, 2.0, 4.0, 3)


def test_bar_boundary_is_floor(spark):
    # events at exactly 02:00:00.000000 must open the NEXT hourly bar
    rows = [
        _ev(1, "a", 59, 999999, 1.0),
        (2, dt.datetime(2024, 1, 1, 2, 0, 0, 0), 1, "a", 2.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    bars = sorted(
        (r["bar"], r["n_events"]) for r in ohlc_bars(df).collect()
    )
    assert len(bars) == 2 and bars[0][0] + 1 == bars[1][0]


def test_partition_invariance(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    a = sorted(map(tuple, ohlc_bars(ev.repartition(1)).collect()))
    b = sorted(map(tuple, ohlc_bars(ev.repartition(16)).collect()))
    assert a == b and len(a) > 0


def test_validation(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    with pytest.raises(ValueError, match="bar_us"):
        ohlc_bars(ev, bar_us=0)
