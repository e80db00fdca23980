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


def test_distance_join_self_dedup_and_exact_boundary(spark):
    from geoharvest_spark.clustering import distance_join

    # unit square corners + center; r=1.0: edges qualify (dist 1.0
    # exactly — boundary INCLUSIVE), diagonals (sqrt 2) do not
    pts = [(0, 0.0, 0.0), (1, 1.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 1.0),
           (4, 0.5, 0.5)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {(r.id_a, r.id_b): r.dist_sq for r in distance_join(df).collect()}
    assert set(got) == {(0, 1), (0, 2), (1, 3), (2, 3),
                        (0, 4), (1, 4), (2, 4), (3, 4)}
    assert got[(0, 1)] == 1.0 and got[(0, 4)] == 0.5


def test_distance_join_two_sets_and_both_directions(spark):
    from geoharvest_spark.clustering import distance_join

    a = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    b = spark.createDataFrame(
        [(1, 0.1, 0.0), (2, 5.0, 5.0)], "id long, x double, y double"
    )
    # two-set join: same id on both sides is a REAL pair, kept
    got = [(r.id_a, r.id_b) for r in distance_join(a, b, 1.0).collect()]
    assert got == [(1, 1)]
    # self-join without dedup emits both directions
    both = distance_join(b, None, 10.0, dedup_pairs=False).collect()
    assert sorted((r.id_a, r.id_b) for r in both) == [(1, 2), (2, 1)]


def test_distance_join_cross_cell_pairs_found_once(spark):
    from geoharvest_spark.clustering import distance_join

    # points straddling cell boundaries: each qualifying pair appears
    # exactly once (the 9-cell replication meets the B cell uniquely)
    pts = [(i, i * 0.9, 0.0) for i in range(10)]
    df = spark.createDataFrame(pts, "id long, x double, y double")
    rows = distance_join(df, radius=1.0).collect()
    assert sorted((r.id_a, r.id_b) for r in rows) == [
        (i, i + 1) for i in range(9)
    ]


def test_distance_join_validates_radius(spark):
    import pytest as _pytest

    from geoharvest_spark.clustering import distance_join

    df = spark.createDataFrame([(1, 0.0, 0.0)], "id long, x double, y double")
    with _pytest.raises(ValueError):
        distance_join(df, radius=0.0)
