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


def test_rasterize_polygon_exact_square(spark):
    # unit square 2x2 cells at res 7 in 512-scale: vertices enclosing
    # exactly the centers of cells (512,256)..(513,257)
    from geoharvest_spark.geo import rasterize_polygon_cells

    # cell (cx,cy) center scaled = (cx*180+90-92160, cy*180+90-46080)
    # pick cx in {512,513}, cy in {256,257}: centers x in {90,270},
    # y in {90,270} (scaled). A square from -1..361 covers all four.
    verts = [(-1, -1), (361, -1), (361, 361), (-1, 361)]
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in verts])],
        "poly_id long, vertices array<struct<x:long,y:long>>",
    )
    out = rasterize_polygon_cells(df, res=7).collect()
    got = sorted((r["cell_x"], r["cell_y"]) for r in out)
    assert got == [(512, 256), (512, 257), (513, 256), (513, 257)]


def test_rasterize_matches_numpy_raycast(spark):
    # pentagon vs the module's independent numpy points_in_ring kernel
    import numpy as np

    from geoharvest_spark.geo import points_in_ring, rasterize_polygon_cells

    offs = [(4501, 3), (1353, 4255), (-3599, 2603), (-3601, -2601),
            (1355, -4251)]
    cx, cy = 10240, 5120
    verts = [(cx + dx, cy + dy) for dx, dy in offs]
    df = spark.createDataFrame(
        [(1, [{"x": x, "y": y} for x, y in verts])],
        "poly_id long, vertices array<struct<x:long,y:long>>",
    )
    got = sorted(
        (r["cell_x"], r["cell_y"])
        for r in rasterize_polygon_cells(df, res=7).collect()
    )
    ring = np.array(verts + [verts[0]], dtype=np.float64)
    xs = np.arange((min(v[0] for v in verts) + 92160) // 180,
                   (max(v[0] for v in verts) + 92160) // 180 + 1)
    ys = np.arange((min(v[1] for v in verts) + 46080) // 180,
                   (max(v[1] for v in verts) + 46080) // 180 + 1)
    gx, gy = np.meshgrid(xs, ys)
    px = gx.ravel() * 180 + 90 - 92160
    py = gy.ravel() * 180 + 90 - 46080
    inside = points_in_ring(px.astype(float), py.astype(float), ring)
    want = sorted(zip(gx.ravel()[inside].tolist(), gy.ravel()[inside].tolist()))
    assert got == want and len(got) > 100


def test_path_cells_dda(spark):
    from geoharvest_spark.geo import path_cells

    # horizontal segment spanning 4 cells at res 5 (cell width 1.40625)
    df = spark.createDataFrame(
        [(1, 0.1, 0.1, 5.0, 0.1), (2, 0.1, 0.1, 0.1, 0.1)],
        "path_id long, lon0 double, lat0 double, lon1 double, lat1 double",
    )
    out = path_cells(df, res=5).collect()
    p1 = sorted(r["step"] for r in out if r["path_id"] == 1)
    cells1 = {r["cell"] for r in out if r["path_id"] == 1}
    assert p1 == [0, 1, 2, 3]          # chebyshev span = 3 -> 4 samples
    assert len(cells1) == 4            # each sample in its own cell
    p2 = [r for r in out if r["path_id"] == 2]
    assert len(p2) == 1 and p2[0]["step"] == 0   # zero-length path


def test_clip_polygon_convex_exact_cases():
    from fractions import Fraction

    from geoharvest_spark.geo import (
        clip_polygon_convex,
        shoelace_area2_fraction,
    )

    # quarter-overlapping unit squares: area exactly 1
    out = clip_polygon_convex(
        [(0, 0), (2, 0), (2, 2), (0, 2)], [(1, 1), (3, 1), (3, 3), (1, 3)]
    )
    assert abs(shoelace_area2_fraction(out)) == 2
    # disjoint -> empty; contained -> itself
    assert clip_polygon_convex(
        [(0, 0), (1, 0), (1, 1)], [(5, 5), (6, 5), (6, 6), (5, 6)]
    ) == []
    t = clip_polygon_convex(
        [(0, 0), (4, 0), (0, 4)],
        [(-9, -9), (9, -9), (9, 9), (-9, 9)],
    )
    assert abs(shoelace_area2_fraction(t)) == 16
    # rational intersection: triangle clipped at x <= 1 -> trapezoid
    # (0,0),(1,0),(1,3/4)... vertices stay exact Fractions
    tri = clip_polygon_convex(
        [(0, 0), (4, 0), (0, 3)], [(-9, -9), (1, -9), (1, 9), (-9, 9)]
    )
    a2 = abs(shoelace_area2_fraction(tri))
    assert a2 == Fraction(21, 8) * 2  # area = 3/2*1 + ... = 21/8? verify:
    # area of triangle x<=1 slice: integral of y=3-3x/4 from 0..1 =
    # 3 - 3/8 = 21/8. 2*area = 21/4
    assert a2 == Fraction(21, 4)


def test_polygon_overlay_two_kernels_agree(spark):
    # the engine's edge-walking SH vs the oracle's half-plane cuts on
    # randomized integer rectangles x convex polygons
    import random
    from fractions import Fraction

    from geoharvest_spark import oracle_stage as osg
    from geoharvest_spark.geo import (
        clip_polygon_convex,
        polygon_intersection_area,
        shoelace_area2_fraction,
    )

    rng = random.Random(9)
    rows = []
    for i in range(40):
        cx, cy = rng.randint(-50, 50), rng.randint(-50, 50)
        subj = [(cx + dx, cy + dy) for dx, dy in
                ((9, 0), (3, 8), (-7, 5), (-7, -5), (3, -8))]
        x0, y0 = rng.randint(-60, 50), rng.randint(-60, 50)
        clp = [(x0, y0), (x0 + 12, y0), (x0 + 12, y0 + 9), (x0, y0 + 9)]
        rows.append((i, i, subj, clp))
    df = spark.createDataFrame(
        [(l, r, [{"x": x, "y": y} for x, y in s],
          [{"x": x, "y": y} for x, y in c]) for l, r, s, c in rows],
        "lid long, rid long, subject array<struct<x:long,y:long>>, "
        "clip array<struct<x:long,y:long>>",
    )
    got = {r["lid"]: (r["n_vertices"], r["inter_area2"])
           for r in polygon_intersection_area(df).collect()}
    for l, r, subj, clp in rows:
        out = clip_polygon_convex(subj, clp)
        want = float(abs(shoelace_area2_fraction(out))) if out else 0.0
        assert got[l][1] == want, l


def test_convex_hull_monotone_cases():
    from geoharvest_spark.geo import convex_hull_monotone

    # square + interior + collinear boundary points: hull is 4 corners
    pts = [(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (2, 0), (0, 2), (4, 2)]
    hull = convex_hull_monotone(pts)
    assert sorted(hull) == [(0, 0), (0, 4), (4, 0), (4, 4)]
    # degenerate: all collinear
    assert convex_hull_monotone([(0, 0), (1, 1), (2, 2), (3, 3)]) in (
        [(0, 0), (3, 3)], [(0, 0), (3, 3)],
    )
    assert convex_hull_monotone([(1, 1)]) == [(1, 1)]
