from __future__ import annotations

from pyspark.sql import functions as F

from geoharvest_spark.geo import polygon_stats

VERT_DDL = "pid long, vertices array<struct<x: bigint, y: bigint>>"


def _poly(pid, pts):
    return (pid, [{"x": x, "y": y} for x, y in pts])


def test_square_area_and_centroid(spark):
    df = spark.createDataFrame(
        [_poly(1, [(0, 0), (10, 0), (10, 10), (0, 10)])], VERT_DDL
    )
    r = polygon_stats(df).collect()[0]
    assert r["area2"] == 200 and r["cx"] == 5.0 and r["cy"] == 5.0


def test_orientation_invariance(spark):
    pts = [(2, 1), (9, 3), (11, 8), (4, 12), (1, 6)]
    df = spark.createDataFrame(
        [_poly(1, pts), _poly(2, list(reversed(pts)))], VERT_DDL
    )
    rows = {r["pid"]: r for r in polygon_stats(df).collect()}
    assert rows[1]["area2"] == rows[2]["area2"] > 0
    assert rows[1]["cx"] == rows[2]["cx"]
    assert rows[1]["cy"] == rows[2]["cy"]


def test_octagon_closed_form(spark):
    # w x h rectangle with 45-degree corner cuts of leg a:
    # area = w*h - 2*a^2  ->  area2 = 2*w*h - 4*a^2
    w, h, a = 400, 300, 50
    pts = [
        (a, 0), (w - a, 0), (w, a), (w, h - a),
        (w - a, h), (a, h), (0, h - a), (0, a),
    ]
    df = spark.createDataFrame([_poly(1, pts)], VERT_DDL)
    r = polygon_stats(df).collect()[0]
    assert r["area2"] == 2 * w * h - 4 * a * a
    # symmetric in both axes -> centroid at the rectangle center
    assert r["cx"] == w / 2 and r["cy"] == h / 2


def test_triangle(spark):
    df = spark.createDataFrame([_poly(1, [(0, 0), (6, 0), (0, 6)])], VERT_DDL)
    r = polygon_stats(df).collect()[0]
    assert r["area2"] == 36 and r["cx"] == 2.0 and r["cy"] == 2.0


def test_idw_fill_exact_weights(spark):
    from pyspark.sql import functions as F

    from geoharvest_spark.geo import idw_fill
    from geoharvest_spark.index import ghcell_decode

    # one observed cell -> 12 filled neighbors, idw == the cell's sum
    pts = spark.createDataFrame(
        [(0.1, 0.1, 10.0), (0.1, 0.1, 20.0)],
        "lon double, lat double, value double",
    )
    rows = idw_fill(pts, res=6).collect()
    assert len(rows) == 12
    assert all(r["idw_value"] == 30.0 for r in rows)
    assert sorted(r["weight_sum"] for r in rows) == sorted(
        [4, 4, 4, 4, 2, 2, 2, 2, 1, 1, 1, 1]
    )
    # two observed cells two apart: the midpoint cell mixes 1:1 at w=1+1?
    # place second point 2 cells east: midpoint gets both at d^2=1 (w=4)
    pts2 = spark.createDataFrame(
        [(0.1, 0.1, 10.0), (0.1 + 2 * 360.0 / 512, 0.1, 40.0)],
        "lon double, lat double, value double",
    )
    out2 = idw_fill(pts2, res=6)
    mid = [r for r in out2.collect() if r["n_contributors"] == 2
           and r["weight_sum"] == 8]
    assert any(abs(r["idw_value"] - 25.0) < 1e-12 for r in mid)
