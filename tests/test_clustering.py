"""Distributed DBSCAN tests (grid-bucketed neighbor graph + CC)."""

from __future__ import annotations

import pytest

from geoharvest_spark.clustering import dbscan


def _run(spark, rows, eps, min_pts):
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    out = dbscan(df, eps=eps, min_pts=min_pts).collect()
    return {r["id"]: (r["role"], r["cluster"]) for r in out}


def test_dbscan_core_border_noise(spark):
    rows = [
        # cluster 1: four mutually-close cores + one border hanging off
        (1, 0.0, 0.0),
        (2, 0.3, 0.0),
        (3, 0.0, 0.3),
        (4, 0.3, 0.3),
        (5, 0.75, 0.0),   # within eps of 2 only -> border
        # cluster 2: triangle of cores
        (6, 10.0, 10.0),
        (7, 10.3, 10.0),
        (8, 10.0, 10.3),
        # isolated noise
        (9, 5.0, 5.0),
    ]
    got = _run(spark, rows, eps=0.5, min_pts=3)
    assert got[1] == ("core", 1)
    assert got[2] == ("core", 1)
    assert got[3] == ("core", 1)
    assert got[4] == ("core", 1)
    assert got[5] == ("border", 1)
    assert got[6] == ("core", 6)
    assert got[7] == ("core", 6)
    assert got[8] == ("core", 6)
    assert got[9] == ("noise", None)


def test_dbscan_chain_merges_across_cells(spark):
    # chain of points 0.4 apart spanning many grid cells: every interior
    # point is core (min_pts=3); one connected cluster despite the chain
    # crossing cell boundaries
    rows = [(i, 0.4 * i, 0.0) for i in range(10)]
    got = _run(spark, rows, eps=0.5, min_pts=3)
    # label = min CORE id (endpoints are borders, so 1 not 0)
    assert all(got[i][1] == 1 for i in range(10))
    assert got[3][0] == "core"
    # endpoints have one neighbor only -> border of the chain cluster
    assert got[0][0] == "border" and got[9][0] == "border"


def test_dbscan_border_ties_to_min_cluster(spark):
    # a border point within eps of cores from TWO clusters attaches to
    # the minimum cluster label (deterministic, not first-claimer-wins),
    # and the bridge (deg 2 + self < min_pts=5, so NOT core) must not
    # merge the clusters
    rows = [
        # cluster 1: five mutually-close cores
        (1, 0.0, 0.0), (2, 0.2, 0.0), (3, 0.0, 0.2),
        (4, 0.2, 0.2), (5, 0.1, 0.1),
        # cluster 10: five mutually-close cores, 1.2 to the right
        (10, 1.2, 0.0), (11, 1.4, 0.0), (12, 1.2, 0.2),
        (13, 1.4, 0.2), (14, 1.3, 0.1),
        # bridge: exactly eps from core 2 and core 10, nothing else
        (20, 0.7, 0.0),
    ]
    got = _run(spark, rows, eps=0.5, min_pts=5)
    assert got[1] == ("core", 1) and got[10] == ("core", 10)
    assert got[20] == ("border", 1)  # min of {1, 10}
    assert got[5][1] == 1 and got[14][1] == 10
    assert got[1][1] != got[10][1]  # clusters stay separate


def test_dbscan_validates_params(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], ["id", "x", "y"])
    with pytest.raises(ValueError):
        dbscan(df, eps=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(df, eps=1.0, min_pts=0)
