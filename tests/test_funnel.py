from __future__ import annotations

import datetime as dt

import pytest

from geoharvest_spark.funnel import funnel_counts, funnel_depths

SF001 = "/root/testdata/sf0.001"
STEPS = ("view", "click", "purchase")


def _ev(i, user, typ, sec, us=0):
    return (
        i,
        dt.datetime(2024, 1, 1, 0, 0, sec, us),
        user,
        typ,
        0.0,
        "{}",
    )


SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_funnel_semantics(spark):
    rows = [
        # u1: full funnel in order
        _ev(1, 1, "view", 1),
        _ev(2, 1, "click", 2),
        _ev(3, 1, "purchase", 3),
        # u2: click BEFORE view never counts; no click after -> depth 1
        _ev(4, 2, "click", 1),
        _ev(5, 2, "view", 2),
        # u3: click at the SAME instant as view -> strict > rejects it
        _ev(6, 3, "view", 1),
        _ev(7, 3, "click", 1),
        # u4: same instant but click again later -> advances on the later
        _ev(8, 4, "view", 1),
        _ev(9, 4, "click", 1),
        _ev(10, 4, "click", 2),
        # u5: purchase without the middle step -> depth 1
        _ev(11, 5, "view", 1),
        _ev(12, 5, "purchase", 2),
        # u6: only noise event types -> no row at all (filtered)
        _ev(13, 6, "error", 1),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    depths = {r["user"]: r["depth"] for r in funnel_depths(df, STEPS).collect()}
    assert depths == {1: 3, 2: 1, 3: 1, 4: 2, 5: 1}
    got = {
        (r["step"], r["step_name"], r["n_users"])
        for r in funnel_counts(df, STEPS).collect()
    }
    assert got == {(1, "view", 5), (2, "click", 2), (3, "purchase", 1)}


def test_partition_invariance(spark):
    df = spark.read.parquet(f"{SF001}/events.parquet")
    a = sorted(map(tuple, funnel_depths(df.repartition(1), STEPS).collect()))
    b = sorted(map(tuple, funnel_depths(df.repartition(16), STEPS).collect()))
    assert a == b and len(a) > 0


def test_matches_independent_pandas(spark):
    # correlated-min reference (the oracle's algorithm) in pandas
    pdf = spark.read.parquet(f"{SF001}/events.parquet").toPandas()
    pdf = pdf[pdf.event_type.isin(STEPS)].copy()
    pdf["t"] = pdf.ts.astype("int64")  # ns; monotone with us
    exp = {}
    for user, g in pdf.groupby("user_id"):
        last, depth = None, 0
        for s in STEPS:
            cand = g[(g.event_type == s)]
            if last is not None:
                cand = cand[cand.t > last]
            if len(cand) == 0:
                break
            last = cand.t.min()
            depth += 1
        exp[user] = depth
    got = {
        r["user"]: r["depth"]
        for r in funnel_depths(
            spark.read.parquet(f"{SF001}/events.parquet"), STEPS
        ).collect()
    }
    # users with zero funnel events are absent from got; exp includes all
    assert got == {u: d for u, d in exp.items()}


def test_steps_validation(spark):
    df = spark.read.parquet(f"{SF001}/events.parquet")
    with pytest.raises(ValueError, match="steps"):
        funnel_depths(df, ())


def test_touch_attribution_semantics(spark):
    from geoharvest_spark.funnel import touch_attribution

    rows = [
        (1, "2024-01-01 00:00:00", 10, "ad"),
        (2, "2024-01-01 01:00:00", 10, "email"),
        (3, "2024-01-01 02:00:00", 10, "purchase"),
        (4, "2024-01-01 03:00:00", 10, "ad"),         # after conv: ignored
        (5, "2024-01-01 00:00:00", 20, "purchase"),   # no priors: direct
        (6, "2024-01-02 00:00:00", 30, "search"),
        (7, "2024-01-02 01:00:00", 30, "purchase"),
        (8, "2024-01-02 02:00:00", 40, "ad"),         # never converts
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    )
    out = {
        (r["first_touch"], r["last_touch"]): r["n_users"]
        for r in touch_attribution(df).collect()
    }
    assert out == {
        ("ad", "email"): 1, ("direct", "direct"): 1, ("search", "search"): 1
    }
