"""Integer PageRank (graph.pagerank): hand-computed fixtures, the
order-free-arithmetic determinism claim, and the overflow guard."""

from __future__ import annotations

import pytest

from geoharvest_spark.graph import pagerank

SCALE = 10**12
BASE = 15 * SCALE // 100


def _ranks(df):
    return {r.id: r.rank for r in df.collect()}


def test_ring_is_a_fixed_point(spark):
    # every node passes its full rank on: r stays exactly `scale`
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = _ranks(pagerank(edges, iters=7))
    assert got == {1: SCALE, 2: SCALE, 3: SCALE}


def test_star_one_iteration_hand_computed(spark):
    # 1 -> {2,3}; 2,3 dangling; 4 isolated. contrib(1) = scale div 2;
    # r1(2) = base + 85 * ((scale div 2) div 100)
    nodes = spark.createDataFrame([(1,), (2,), (3,), (4,)], "id long")
    edges = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = _ranks(pagerank(edges, nodes=nodes, iters=1))
    leaf = BASE + 85 * ((SCALE // 2) // 100)
    assert got == {1: BASE, 2: leaf, 3: leaf, 4: BASE}


def test_hub_accumulates_more_rank(spark):
    # bidirectional star: every spoke links the hub, hub links back.
    # The hub aggregates 39 full contributions vs 1/39th back, so it
    # dominates at EVERY iteration (an asymmetric 0<->1 cycle would
    # still be inside its damped period-2 oscillation at 10 rounds)
    n = 40
    rows = [(i, 0) for i in range(1, n)] + [(0, i) for i in range(1, n)]
    edges = spark.createDataFrame(rows, "src long, dst long")
    got = _ranks(pagerank(edges, iters=10))
    assert got[0] > 4 * max(v for k, v in got.items() if k != 0)
    assert min(got.values()) >= BASE


def test_bit_identical_across_partitionings(spark):
    # integer sums are order-free: 1 partition vs 16 partitions must
    # agree bit-for-bit (the property the float version cannot have)
    rows = [(i, (i * 7 + 3) % 50) for i in range(200) if i != (i * 7 + 3) % 50]
    one = spark.createDataFrame(rows, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(rows, "src long, dst long").repartition(16)
    assert _ranks(pagerank(one, iters=6)) == _ranks(pagerank(many, iters=6))


def test_overflow_guard_raises(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="overflow"):
        pagerank(edges, iters=1, scale=2**61)


def test_empty_edges_all_nodes_get_base(spark):
    nodes = spark.createDataFrame([(7,), (8,)], "id long")
    edges = spark.createDataFrame([], "src long, dst long")
    got = _ranks(pagerank(edges, nodes=nodes, iters=3))
    assert got == {7: BASE, 8: BASE}


def test_host_authority_linked_host_outranks(spark):
    from geoharvest_spark.graph import host_authority

    rows = [
        (f"https://WWW.A.com/p{i}", '<a href="https://b.com/x">l</a> text')
        for i in range(4)
    ] + [("https://b.com/home", "no links"), ("https://c.com/q", "none")]
    df = spark.createDataFrame(rows, "url string, html string")
    got = {r.host: r.authority for r in host_authority(df, iters=3).collect()}
    base9 = 15 * 10**9 // 100
    # canonicalization collapses WWW.A.com onto a.com; only b.com is
    # linked-to, so it alone rises above the teleport base
    assert set(got) == {"a.com", "b.com", "c.com"}
    assert got["a.com"] == base9 and got["c.com"] == base9
    assert got["b.com"] > base9


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_complete_k4(spark):
    from geoharvest_spark.graph import triangle_count

    import itertools

    k4 = list(itertools.combinations(range(4), 2))
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_edges_df(spark, k4)).collect()
    }
    # K4 has 4 triangles; every node sits in C(3,2) = 3 of them
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_triangles_cycle_has_none(spark):
    from geoharvest_spark.graph import triangle_count

    c5 = [(i, (i + 1) % 5) for i in range(5)]
    assert triangle_count(_edges_df(spark, c5)).count() == 0


def test_triangles_shared_edge_and_noise(spark):
    from geoharvest_spark.graph import triangle_count

    pairs = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (5, 6), (4, 4)]
    # duplicates + reversed directions + self loop must not change counts
    noisy = pairs + [(b, a) for a, b in pairs] + pairs
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_count(_edges_df(spark, noisy)).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangles_partition_invariance(spark):
    from pyspark.sql import functions as F

    from geoharvest_spark.graph import triangle_count

    i = F.col("id")
    ed = spark.range(300).select(i.alias("src"), ((i + 1) % 300).alias("dst"))
    ed = ed.unionAll(
        spark.range(300).select(i.alias("src"), ((i * 7 + 3) % 300).alias("dst"))
    ).unionAll(
        spark.range(300)
        .where(i % 3 == 0)
        .select(i.alias("src"), ((i + 2) % 300).alias("dst"))
    )
    a = sorted(map(tuple, triangle_count(ed.repartition(1)).collect()))
    b = sorted(map(tuple, triangle_count(ed.repartition(16)).collect()))
    assert a == b and len(a) > 0


def test_bfs_hops_chain_and_unreachable(spark):
    # 0->1->2->3, 5->6 island, 3->0 back edge
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0), (5, 6)], "src long, dst long"
    )
    from geoharvest_spark.graph import bfs_hops

    out = {r["node"]: r["hop"] for r in bfs_hops(edges, 0).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_hops_shortest_wins(spark):
    # two routes to 4: 0->4 direct and 0->1->4 — hop must be 1
    edges = spark.createDataFrame(
        [(0, 4), (0, 1), (1, 4), (4, 9)], "src long, dst long"
    )
    from geoharvest_spark.graph import bfs_hops

    out = {r["node"]: r["hop"] for r in bfs_hops(edges, 0).collect()}
    assert out == {0: 0, 4: 1, 1: 1, 9: 2}


def test_bfs_hops_max_hops_truncates(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src long, dst long"
    )
    from geoharvest_spark.graph import bfs_hops

    out = bfs_hops(edges, 0, max_hops=3)
    assert out.count() == 4 and out.agg({"hop": "max"}).collect()[0][0] == 3


def _py_dijkstra(edges, source):
    import heapq

    adj = {}
    for s, t, w in edges:
        adj.setdefault(s, []).append((t, w))
    dist = {source: 0}
    pq = [(0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def test_sssp_weighted_matches_dijkstra(spark):
    from geoharvest_spark.graph import sssp_weighted

    n = 60
    edges = []
    for i in range(n):
        edges.append((i, (i + 1) % n, 1 + (i * 3) % 9))
        edges.append((i, (i * 7 + 3) % n, 1 + (i * 5) % 7))
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {
        r["node"]: r["dist"]
        for r in sssp_weighted(df, source=0).collect()
    }
    want = _py_dijkstra(edges, 0)
    assert got == want


def test_sssp_unreachable_nodes_absent(spark):
    from geoharvest_spark.graph import sssp_weighted

    df = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 5), (7, 8, 1)], "src long, dst long, w long"
    )
    got = {r["node"]: r["dist"] for r in sssp_weighted(df, 0).collect()}
    assert got == {0: 0, 1: 5, 2: 10}  # 7/8 unreachable, absent


def test_sssp_raises_without_convergence(spark):
    import pytest as _pt

    from geoharvest_spark.graph import sssp_weighted

    # a long chain cannot converge in 2 rounds
    df = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(10)], "src long, dst long, w long"
    )
    with _pt.raises(RuntimeError, match="converge"):
        sssp_weighted(df, 0, max_rounds=2)


def _py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {u for u in alive if len(adj[u] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {u: len(adj[u] & alive) for u in alive}


def test_kcore_matches_python_peel(spark):
    from geoharvest_spark.graph import kcore

    # ring (deg 2) + chords: peeling cascades through low-degree nodes
    n = 80
    edges = [(i, (i + 1) % n) for i in range(n)]
    edges += [(i, (i * 7 + 3) % n) for i in range(0, n, 2)]
    edges += [(i, (i * 11 + 5) % n) for i in range(0, n, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["degree"] for r in kcore(df, k=3).collect()
    }
    want = _py_kcore(edges, 3)
    assert got == want
    assert len(want) > 0  # non-trivial core on this graph


def test_kcore_empty_core(spark):
    from geoharvest_spark.graph import kcore

    # a tree has no 2-core
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    assert kcore(df, k=2).count() == 0


def test_triangle_count_64bit_ids(spark):
    # the orientation key must totally order (degree, id) for FULL-range
    # long ids (xxhash64-style); the old scalar deg*2^32+id key overflows
    # and mis-orients. Triangle over huge/negative ids + a hub node.
    from geoharvest_spark.graph import triangle_count

    big = (1 << 62) + 12345
    neg = -(1 << 61) - 7
    edges = [
        (big, neg), (neg, 42), (42, big),          # triangle
        (big, 7), (big, 8), (big, 9),              # hub fan (no close)
        (7, 8),                                    # second triangle big-7-8
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert out == {big: 2, neg: 1, 42: 1, 7: 1, 8: 1}
