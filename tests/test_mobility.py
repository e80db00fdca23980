from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from geoharvest_spark.mobility import od_matrix

SF001 = "/root/testdata/sf0.001"
SCHEMA = "event_id long, ts timestamp, user_id long, lon double, lat double"


def _fx(i, user, sec, lon, lat):
    return (i, dt.datetime(2024, 1, 1, 0, 0, sec), user, lon, lat)


def test_od_semantics(spark):
    rows = [
        # u1 crosses three res-1 cells west->east along the equator:
        # (-170,..) -> (-100,..) -> (0,..) -> (0,..) again (self-loop)
        _fx(1, 1, 1, -170.0, 1.0),
        _fx(2, 1, 2, -100.0, 1.0),
        _fx(3, 1, 3, 0.5, 1.0),
        _fx(4, 1, 4, 0.6, 1.0),
        # u2 makes the SAME first hop -> that flow has n_trips=2
        _fx(5, 2, 1, -170.0, 1.0),
        _fx(6, 2, 2, -100.0, 1.0),
        # u3: single fix, no transition
        _fx(7, 3, 1, 10.0, 10.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["from_cell"], r["to_cell"]): r["n_trips"]
        for r in od_matrix(df).collect()
    }
    assert len(got) == 2  # self-loop dropped, single fix ignored
    assert sorted(got.values()) == [1, 2]
    with_self = {
        (r["from_cell"], r["to_cell"]): r["n_trips"]
        for r in od_matrix(df, include_self=True).collect()
    }
    # 3 transitions for u1 + 1 for u2 = 4 total across 3 distinct flows
    assert len(with_self) == 3 and sum(with_self.values()) == 4


def test_same_instant_tiebreak_by_id(spark):
    # two fixes at the same second: order must follow event_id
    rows = [
        _fx(10, 7, 1, -170.0, 1.0),
        _fx(11, 7, 1, -100.0, 1.0),
        _fx(12, 7, 2, 0.5, 1.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["from_cell"], r["to_cell"]) for r in od_matrix(df).collect()
    }
    # path is cell(-170) -> cell(-100) -> cell(0.5): exactly those 2 hops
    assert len(got) == 2


def test_partition_invariance(spark):
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    pts = ev.select(
        "event_id",
        "ts",
        "user_id",
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("event_id") * 104729 % 18000) / 100.0 - 90.0).alias("lat"),
    )
    a = sorted(map(tuple, od_matrix(pts.repartition(1)).collect()))
    b = sorted(map(tuple, od_matrix(pts.repartition(16)).collect()))
    assert a == b and len(a) > 0


def test_stay_points_semantics(spark):
    from geoharvest_spark.mobility import stay_points

    rows = [
        # u1: 3 fixes in one res-0 cell, then 1 away, then 2 back: two
        # runs in the SAME cell must stay separate islands
        _fx(1, 1, 1, 10.0, 10.0),
        _fx(2, 1, 2, 10.5, 10.2),
        _fx(3, 1, 3, 10.1, 10.9),
        _fx(4, 1, 4, -170.0, -80.0),
        _fx(5, 1, 5, 10.2, 10.3),
        _fx(6, 1, 6, 10.3, 10.4),
        # u2: never two consecutive fixes in one cell -> no stay points
        _fx(7, 2, 1, 10.0, 10.0),
        _fx(8, 2, 2, -170.0, -80.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(
        (r["user_id"], r["n_fixes"], r["enter_us"], r["leave_us"])
        for r in stay_points(df).collect()
    )
    base = 1704067200 * 1_000_000
    assert got == [
        (1, 2, base + 5_000_000, base + 6_000_000),
        (1, 3, base + 1_000_000, base + 3_000_000),
    ]


def test_stay_points_partition_invariance(spark):
    from geoharvest_spark.mobility import stay_points

    ev = spark.read.parquet(f"{SF001}/events.parquet")
    pts = ev.select(
        "event_id",
        "ts",
        "user_id",
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("event_id") * 104729 % 18000) / 100.0 - 90.0).alias("lat"),
    )
    a = sorted(map(tuple, stay_points(pts.repartition(1)).collect()))
    b = sorted(map(tuple, stay_points(pts.repartition(16)).collect()))
    assert a == b and len(a) > 0


def test_trajectory_lengths_known_track(spark):
    # equator hops: 1 deg lon at lat 0 = 111194.926 m (2*R*asin(sin(dlon/2)))
    rows = [
        (1, 0, 100, 0.0, 0.0),
        (1, 1, 101, 1.0, 0.0),
        (1, 2, 102, 2.0, 0.0),
        (2, 0, 200, 10.0, 10.0),  # single fix: no hops
    ]
    df = spark.createDataFrame(
        rows, "user_id long, t_us long, event_id long, lon double, lat double"
    )
    from geoharvest_spark.mobility import trajectory_lengths

    out = {
        r["user_id"]: (r["n_hops"], r["path_m"])
        for r in trajectory_lengths(df).collect()
    }
    assert set(out) == {1}
    n, m = out[1]
    assert n == 2
    assert abs(m - 2 * 111194) <= 2  # floored meters per hop


def test_trajectory_order_is_ts_then_id(spark):
    # same path visited in shuffled row order: ordering is (t_us, event_id)
    pts = [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0), (1.0, 0.0)]
    rows = [
        (7, t, t, lon, lat) for t, (lon, lat) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows[::-1],
        "user_id long, t_us long, event_id long, lon double, lat double",
    )
    from geoharvest_spark.mobility import trajectory_lengths

    r = trajectory_lengths(df).collect()[0]
    assert r["n_hops"] == 3
    # 3 hops of ~111 km (two meridian, one parallel at lat 1)
    assert 3 * 111000 < r["path_m"] < 3 * 111300


def test_grid_density_clusters_matches_python(spark):
    from geoharvest_spark.index import ghcell_nx, ghcell_ny
    from geoharvest_spark.mobility import grid_density_clusters

    import pyspark.sql.functions as F

    # min_pts=12 sits above the ~6/cell uniform scatter (max stray cell
    # is 9) and below the 20-point blobs, so exactly the blobs are dense
    res, min_pts = 2, 12
    nx, ny = ghcell_nx(res), ghcell_ny(res)
    # deterministic scatter with planted dense blobs
    pts = []
    for i in range(3000):
        lon = (i * 7919 % 36000) / 100.0 - 180.0
        lat = (i * 104729 % 18000) / 100.0 - 90.0
        pts.append((i, lon, lat))
    # blobs: lon 10 (x=16) and lon 12 (x=17) are ADJACENT cells that
    # must merge; lon 25 (x=18... not touching x=17? it is adjacent!)
    # -> use lon 36 (x=19+) for the isolated blob
    for j in range(20):
        pts.append((10000 + j, 10.0 + (j % 3) * 0.1, 10.0))
        pts.append((15000 + j, 12.0 + (j % 3) * 0.1, 10.0))
        pts.append((20000 + j, 36.0 + (j % 3) * 0.1, 10.0))
    df = spark.createDataFrame(pts, "pid long, lon double, lat double")
    got = {
        r["cell"]: (r["cluster"], r["n_points"])
        for r in grid_density_clusters(
            df, res=res, min_pts=min_pts
        ).collect()
    }

    # python replay
    import collections

    def cell_of(lon, lat):
        x = min(max(int((lon + 180.0) / 360.0 * nx), 0), nx - 1)
        y = min(max(int((lat + 90.0) / 180.0 * ny), 0), ny - 1)
        return res * 2**50 + x * 2**25 + y

    counts = collections.Counter(cell_of(lo, la) for _, lo, la in pts)
    dense = {c for c, n in counts.items() if n >= min_pts}

    def neighbors(c):
        rem = c % 2**50
        x, y = rem // 2**25, rem % 2**25
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                yy = y + dy
                if 0 <= yy < ny:
                    yield res * 2**50 + ((x + dx) % nx) * 2**25 + yy

    label = {}
    for c in sorted(dense):
        if c in label:
            continue
        comp, stack = [], [c]
        seen = {c}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in neighbors(u):
                if v in dense and v not in seen:
                    seen.add(v)
                    stack.append(v)
        m = min(comp)
        for u in comp:
            label[u] = m
    want = {c: (label[c], counts[c]) for c in dense}
    assert got == want
    # three dense cells, the adjacent pair merged: exactly two clusters
    assert len(got) == 3 and len({v[0] for v in got.values()}) == 2


def test_radius_of_gyration_exact(spark):
    from geoharvest_spark.mobility import radius_of_gyration

    # two fixes two cells apart in x (res 7 cell width 360/1024)
    fixes = spark.createDataFrame(
        [(1, 0.1, 0.1), (1, 0.1 + 2 * 360.0 / 1024, 0.1), (2, 10.0, 10.0)],
        "user_id long, lon double, lat double",
    )
    out = {r["user"]: r for r in radius_of_gyration(fixes, res=7).collect()}
    # x in {512, 514}: mean 513, sq devs 1+1 -> rog2 = 1.0 exactly
    assert out[1]["rog2_cell2"] == 1.0 and out[1]["n_cells"] == 2
    assert out[2]["rog2_cell2"] == 0.0 and out[2]["n_fixes"] == 1
