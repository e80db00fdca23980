from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.profile import profile_columns, skyline2d

SF001 = "/root/testdata/sf0.001"


def _brute_skyline(pts):
    out = []
    for p in pts:
        dominated = any(
            q[1] >= p[1]
            and q[2] >= p[2]
            and (q[1] > p[1] or q[2] > p[2])
            for q in pts
        )
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_brute_force(spark):
    pts = [
        (i, float((i * 37) % 100), float((i * 61) % 100)) for i in range(200)
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = sorted(
        (r["id"], r["x"], r["y"]) for r in skyline2d(df, "x", "y", "id").collect()
    )
    assert got == _brute_skyline(pts)


def test_skyline_duplicates_and_ties(spark):
    pts = [
        (1, 5.0, 5.0),
        (2, 5.0, 5.0),  # exact duplicate of the frontier point: survives
        (3, 5.0, 4.0),  # same x, lower y: dominated
        (4, 4.0, 5.0),  # same y, lower x: dominated
        (5, 6.0, 1.0),
        (6, 1.0, 6.0),
    ]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    ids = sorted(r["id"] for r in skyline2d(df, "x", "y", "id").collect())
    assert ids == [1, 2, 5, 6]


def test_skyline_partition_invariance(spark):
    pts = [(i, float(i % 13), float((i * 7) % 13)) for i in range(300)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    a = sorted(
        tuple(r) for r in skyline2d(df, "x", "y", "id", partitions=2).collect()
    )
    b = sorted(
        tuple(r) for r in skyline2d(df, "x", "y", "id", partitions=32).collect()
    )
    assert a == b == sorted(_brute_skyline(pts))


def test_profile_columns_orders(spark):
    df = spark.read.parquet(f"{SF001}/orders.parquet")
    prof = {
        r["column"]: r for r in profile_columns(df).collect()
    }
    n = df.count()
    assert set(prof) == set(df.columns)
    for c in df.columns:
        assert prof[c]["n_rows"] == n
        assert prof[c]["n_null"] == 0
    assert prof["o_orderkey"]["n_distinct"] == n
    assert prof["o_orderstatus"]["min_str"] is not None
    assert prof["o_orderstatus"]["min_num"] is None
    assert prof["o_totalprice"]["min_num"] == df.agg(
        F.min("o_totalprice")
    ).collect()[0][0]
    # timestamp min/max as epoch seconds
    lo = prof["o_orderdate"]["min_num"]
    assert lo == df.agg(
        F.min(F.col("o_orderdate").cast("timestamp").cast("long"))
    ).collect()[0][0]


def test_profile_nulls_counted(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None)], "k long, s string"
    )
    prof = {r["column"]: r for r in profile_columns(df).collect()}
    assert prof["s"]["n_null"] == 2
    assert prof["s"]["n_distinct"] == 1
    assert prof["k"]["n_distinct"] == 3


def test_check_constraints_counts_violations(spark):
    from geoharvest_spark.profile import check_constraints

    df = spark.createDataFrame(
        [
            (1, "a", 5, 100),
            (2, "b", 50, 200),
            (2, "c", -1, None),     # dup key, below range, null ref ok
            (3, None, 7, 999),      # null name, orphan ref
            (3, "d", 200, 100),     # dup key, above range
        ],
        "k long, name string, v long, fk long",
    )
    dim = spark.createDataFrame([(100,), (200,)], "dk long")
    got = {
        r["check"]: (r["passed"], r["n_violations"])
        for r in check_constraints(
            df,
            not_null=["name", "k"],
            unique=[["k"]],
            ranges=[("v", 0, 100)],
            ref=("fk", dim, "dk"),
        ).collect()
    }
    assert got == {
        "not_null(name)": (False, 1),
        "not_null(k)": (True, 0),
        "unique(k)": (False, 2),       # two keys carry one extra row each
        "range(v,0,100)": (False, 2),  # -1 and 200
        "ref(fk->dk)": (False, 1),     # 999; NULL fk exempt
    }


def test_check_constraints_all_pass(spark):
    from geoharvest_spark.profile import check_constraints

    df = spark.createDataFrame([(1, 5), (2, 6)], "k long, v long")
    rows = check_constraints(
        df, not_null=["k", "v"], unique=[["k"]], ranges=[("v", 0, 10)]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in rows)
    assert len(rows) == 4


def test_check_constraints_requires_checks(spark):
    import pytest as _pt

    from geoharvest_spark.profile import check_constraints

    df = spark.createDataFrame([(1,)], "k long")
    with _pt.raises(ValueError, match="no checks"):
        check_constraints(df)


def test_robust_outliers_matches_numpy(spark):
    import numpy as np

    from geoharvest_spark.profile import robust_outliers

    rows = []
    for i in range(200):
        key = f"k{i % 3}"
        v = (i * 37) % 50 + (5000 if i % 97 == 0 else 0)
        rows.append((i, key, v))
    df = spark.createDataFrame(rows, "rid long, key string, v long")
    got = {
        r["rid"]: (r["med"], r["mad"], r["is_outlier"])
        for r in robust_outliers(df, "key", "v", k=3.0).collect()
    }
    by_key = {}
    for _, key, v in rows:
        by_key.setdefault(key, []).append(v)
    med = {k: float(np.percentile(v, 50)) for k, v in by_key.items()}
    mad = {
        k: float(np.percentile([abs(x - med[k]) for x in v], 50))
        for k, v in by_key.items()
    }
    n_out = 0
    for rid, key, v in rows:
        out = abs(v - med[key]) > 3.0 * mad[key]
        assert got[rid] == (med[key], mad[key], out), rid
        n_out += out
    assert n_out >= 2  # the planted spikes flag


def test_trimmed_stats_small(spark):
    from geoharvest_spark.profile import trimmed_stats

    # 1..10 plus one huge outlier, single key
    df = spark.createDataFrame(
        [("a", v) for v in list(range(1, 11)) + [1000]],
        "k string, v long",
    )
    out = trimmed_stats(df, "k", "v", lo=0.1, hi=0.9).collect()[0]
    assert out["n"] == 11
    # h = (n-1)q = 1.0 / 9.0 -> p_lo = 2.0, p_hi = 10.0 (exact ranks)
    assert out["p_lo"] == 2.0 and out["p_hi"] == 10.0
    # in-range: 2..10 -> trimmed_n 9, mean 6.0
    assert out["trimmed_n"] == 9 and out["trimmed_mean"] == 6.0
    # winsorized: 1->2, 1000->10: (54 + 1*2 + 1*10)/11
    assert abs(out["winsorized_mean"] - 66.0 / 11.0) < 1e-12


def test_key_skew_profile_gini(spark):
    from geoharvest_spark.profile import key_skew_profile

    u = spark.createDataFrame([(i % 10,) for i in range(1000)], "k long")
    r = key_skew_profile(u, "k").collect()[0]
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (1000, 10, 100)
    assert r["gini"] == 0.0
    h = spark.createDataFrame(
        [(0,)] * 991 + [(i,) for i in range(1, 10)], "k long"
    )
    r = key_skew_profile(h, "k").collect()[0]
    assert r["max_count"] == 991 and r["gini"] > 0.85


def test_ks_statistic_exact(spark):
    from geoharvest_spark.profile import ks_statistic

    l = spark.createDataFrame([(v,) for v in [1, 2, 3, 4, 5] * 20], "v long")
    r = spark.createDataFrame([(v,) for v in [3, 4, 5, 6, 7] * 20], "v long")
    out = ks_statistic(l, r, "v").collect()[0]
    assert (out["n_left"], out["n_right"]) == (100, 100)
    assert out["ks"] == 0.4          # ECDFs differ most at v=2 (0.4 vs 0)
    same = ks_statistic(l, l, "v").collect()[0]
    assert same["ks"] == 0.0 and same["d_num"] == 0
