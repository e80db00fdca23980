"""Link-graph analytics over edge DataFrames — PageRank for crawl
prioritization and domain-authority scoring.

Web-curation pipelines rank pages/domains by link authority (Common
Crawl publishes harmonic-centrality and PageRank rankings per crawl) to
pick what to fetch next and to weight quality scores. The input here is
the edge list produced by `webops.extract_links` (src page -> dst page),
usually deduplicated and self-loop-free.

Why INTEGER arithmetic: floating-point PageRank sums are
order-dependent, so two runs (or Spark vs an oracle) disagree in the
last ulps and no exact correctness check is possible. This
implementation keeps every rank as a scaled BIGINT and every transfer
as integer floor division — sums of integers are associative, so the
result is bit-identical across partitionings, cluster sizes, AND
engines (the DuckDB oracle replays the same recurrence in SQL). The
cost is a deterministic rounding loss of < out_deg ulp per node per
iteration (mass leaks to the floor), which is orders of magnitude below
the damping teleport term and irrelevant for ranking.

Execution shape (the standard Pregel decomposition):
  per iteration = one broadcast-free equi-join (ranks x out-degree on
  src), one shuffle-join onto edges, one hash aggregate (sum by dst),
  one left join back to the node set. Lineage is truncated with an
  eager localCheckpoint per iteration (same discipline as
  textops.connected_components) so the plan does not grow with the
  iteration count; 10 iterations = 10 bounded-size shuffles, which is
  exactly how GraphX/Pregel schedules it on a real cluster.

Reference: the reference harvester has no graph operator; this extends
the engine's web-curation family (SURVEY §2 "beyond-reference" web ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 10,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Fixed-iteration integer PageRank.

    edges: DataFrame with ``src``/``dst`` columns (caller dedups and
    drops self-loops — multiplicity here means weighted edges).
    nodes: optional DataFrame with an ``id`` column giving the full
    vertex set (defaults to distinct src union dst; pass it explicitly
    when isolated pages must still receive the teleport rank).

    Recurrence (all BIGINT, both engines):
        r_0(v)   = scale
        contrib(u) = r(u) div out_deg(u)          -- per out-edge
        S(v)     = sum of contrib over in-edges    -- order-free int sum
        r_{t+1}(v) = ((den-num)*scale) div den
                     + num * (S(v) div den)
    Dangling nodes (out_deg 0) keep their rank but transfer nothing —
    their mass leaves the system, the deterministic variant of the
    usual "dangling mass" choice.

    Overflow guard: a hub can accumulate nearly all mass, so
    n_nodes * scale * damping_num must stay under 2^62 (DuckDB BIGINT
    multiply raises on overflow; numpy would silently wrap). Checked
    eagerly with one count job; shrink `scale` for bigger graphs.

    Returns (id, rank) — rank is the scaled BIGINT; divide by `scale`
    for the conventional per-node-mass-1 reading.
    """
    # Materialize the iteration-invariant inputs ONCE: edges often
    # derive from an expensive lineage (HTML link extraction, distinct)
    # and every eager checkpoint below would otherwise re-run it per
    # iteration. One localCheckpoint each for edges / out-degree /
    # nodes makes the per-iteration cost exactly one join + one hash
    # aggregate + one left join — the Pregel-cached-edges discipline.
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    nodes = nodes.select(
        F.col("id").cast("long").alias("id")
    ).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0).cast("long"))
    if n * scale * damping_num >= 2**62:
        raise ValueError(
            f"n_nodes*scale*damping_num = {n * scale * damping_num} "
            f"risks BIGINT overflow; lower scale (= {scale})"
        )
    base = ((damping_den - damping_num) * scale) // damping_den

    # Adjacency-list form (r8, guide §2.2): group the edge list ONCE into
    # (src, dsts array) — after that, every iteration shuffles only the
    # |nodes|-row rank table into the join and explodes the adjacency
    # in-task, instead of re-shuffling (and sort-merge-sorting) the full
    # |edges|-row table every round (measured: the edge table crossed the
    # wire once per iteration before; now once total). Out-adjacency rows
    # are bounded by per-node OUT-degree (page link counts — naturally
    # small even on web graphs whose IN-degree is unbounded; the in-side
    # is never collected). Edge multiplicity is preserved by collect_list
    # and each exploded element contributes exactly `rank div out_deg`,
    # an order-free integer sum — results stay bit-identical.
    # restricted to the vertex set ONCE (left_semi): the old per-round
    # ranks-join implicitly dropped contributions from srcs outside
    # `nodes` — the semi-join preserves exactly that
    adj = (
        e.groupBy("src")
        .agg(F.collect_list("dst").alias("_dsts"))
        .join(
            nodes.withColumnRenamed("id", "src"), "src", "left_semi"
        )
        .localCheckpoint(eager=True)
    )
    # r8: iterate on the IN-EDGE SUM table `s` instead of full ranks —
    # r_t(v) = base + num * (coalesce(s_t(v), 0) div den) for every
    # t >= 1 (nodes with no in-edges hold exactly the teleport base), so
    # the per-iteration work is ONE left join (adj x s) + the dst
    # aggregate, not two joins (ranks x adj, then nodes x s). Same
    # integer expressions, same values; the full rank table is
    # reconstructed once at the end. t = 0 needs no join at all
    # (every rank is `scale`).
    rank_of_s = (
        F.lit(int(base))
        + F.lit(int(damping_num))
        * F.expr(f"coalesce(s, 0L) div {int(damping_den)}")
    ).cast("long")
    if int(iters) <= 0:
        return nodes.select(
            "id", F.lit(int(scale)).cast("long").alias("rank")
        ).localCheckpoint(eager=True)
    s = None
    for t in range(int(iters)):
        if s is None:
            contrib_rank = F.lit(int(scale)).cast("long")
            src_rows = adj
        else:
            contrib_rank = rank_of_s
            src_rows = adj.join(
                s.withColumnRenamed("dst", "src"), "src", "left"
            )
        s = (
            src_rows.withColumn("r", contrib_rank)
            .select(
                F.explode("_dsts").alias("dst"),
                F.expr("r div size(_dsts)").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        # PageRank has NO per-iteration driver read (fixed iteration
        # count) and s_{t-1} is referenced exactly once per round, so
        # the rounds chain lazily into one action; periodic eager
        # checkpoints only bound plan depth for high iteration counts.
        if (t + 1) % int(checkpoint_every) == 0 and t + 1 < int(iters):
            s = s.localCheckpoint(eager=True)
    ranks = nodes.join(s, nodes["id"] == s["dst"], "left").select(
        "id", rank_of_s.alias("rank")
    )
    # the returned frame may be consumed by several actions — one final
    # checkpoint pins the result (and caps total plan depth)
    return ranks.localCheckpoint(eager=True)


def host_authority(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    iters: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Site-level link authority from the corpus's own hyperlinks —
    the composition curation pipelines use to weight or gate documents
    by where they live (Common Crawl publishes exactly this kind of
    host-level ranking per crawl).

    Edges are (host of page -> host of link) over canonicalized URLs
    (webops.extract_links + canonicalize_url, so "www." and case noise
    collapse onto one node), self-loops dropped, distinct. Hosts become
    graph ids via xxhash64 — collision odds ~n^2/2^64, negligible below
    billions of hosts. The vertex set is the CORPUS's hosts: links
    pointing off-corpus transfer their mass out of the system
    (deterministic, same convention as dangling nodes).

    Returns (host, authority): host is the canonical host string,
    authority the scaled integer rank (an unlinked host scores the
    teleport base, 0.15*scale). Default scale 1e9 keeps the overflow
    guard satisfied to ~50M hosts; lower it for bigger host sets."""
    from geoharvest_spark.webops import (
        canonicalize_url,
        extract_links,
        host_of,
    )

    def _h(col):
        return host_of(canonicalize_url(col))

    links = extract_links(
        pages.select(F.col(url_col).alias("_u"), F.col(html_col).alias("_h")),
        html_col="_h",
        base_col="_u",
        out_col="_link",
    )
    edges = (
        links.select(
            F.xxhash64(_h(F.col("_u"))).alias("src"),
            F.xxhash64(_h(F.col("_link"))).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    hosts = pages.select(_h(F.col(url_col)).alias("host")).distinct()
    nodes = hosts.select(F.xxhash64("host").alias("id"))
    pr = pagerank(edges, nodes=nodes, iters=iters, scale=scale)
    return hosts.join(pr, F.xxhash64("host") == F.col("id")).select(
        "host", F.col("rank").alias("authority")
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts via degree-ordered edge orientation
    (the MapReduce-era standard, Suri & Vassilvitskii 2011).

    The naive wedge join explodes on hubs (a degree-d node makes d^2
    wedges). Orienting every edge from the LOWER (degree, id) endpoint
    to the higher caps each node's out-degree at O(sqrt(|E|)), so the
    wedge self-join is bounded by arboricity — the difference between
    a web-scale run finishing and one hub node materializing 10^12
    wedge rows. Pipeline: canonical distinct undirected edges -> degree
    table -> orientation by the STRUCT key (deg, id) — lexicographic,
    a total order for the FULL long id range (the scalar deg*2^32+id
    form collides/inverts on 64-bit ids such as xxhash64 node ids)
    -> wedge self-join on the common source -> hash
    semi-join closing each wedge against the oriented edge set -> each
    triangle found EXACTLY once (its (deg,id)-minimum vertex is the
    wedge center) -> explode the 3 corners -> per-node count.

    Returns (node, n_triangles), nodes in >= 1 triangle. All joins are
    equi-joins on node ids; everything integer; no windows, no Python.
    """
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.where(F.col(src) != F.col(dst))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ka = deg.select(
        F.col("n").alias("a"), F.struct("d", "n").alias("ka")
    )
    kb = deg.select(
        F.col("n").alias("b"), F.struct("d", "n").alias("kb")
    )
    ek = e.join(ka, "a").join(kb, "b")
    oriented = ek.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a"))
        .otherwise(F.col("b"))
        .alias("lo"),
        F.when(F.col("ka") < F.col("kb"), F.col("b"))
        .otherwise(F.col("a"))
        .alias("hi"),
        F.least("ka", "kb").alias("klo"),
        F.greatest("ka", "kb").alias("khi"),
    )
    x = oriented.select(
        F.col("lo").alias("u"),
        F.col("hi").alias("v"),
        F.col("khi").alias("kv"),
    )
    y = oriented.select(
        F.col("lo").alias("u"),
        F.col("hi").alias("w"),
        F.col("khi").alias("kw"),
    )
    wedges = x.join(y, "u").where(F.col("kv") < F.col("kw"))
    closed = wedges.join(
        oriented.select(
            F.col("lo").alias("v"), F.col("hi").alias("w")
        ),
        ["v", "w"],
        "left_semi",
    )
    corners = closed.select(
        F.explode(F.array("u", "v", "w")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def bfs_hops(
    edges: DataFrame,
    source: int,
    max_hops: int = 12,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Single-source unweighted shortest paths (BFS hop counts) up to
    ``max_hops``, level-synchronous — the Pregel SSSP specialization
    crawl planners use for "how many clicks from the seed set".

    Per level: one equi-join of the CURRENT frontier onto the (cached)
    edge set, one anti-join against the visited set, one distinct —
    all shuffles keyed on node id, frontier-sized (not graph-sized),
    which is why level-synchronous BFS is the scalable formulation:
    total work is O(sum of frontier out-edges) = O(|E|) across all
    levels. Edges are localCheckpointed ONCE before the loop (pagerank
    discipline — never re-run the edge lineage per level) and the
    visited set is checkpointed per level so the plan stays flat.

    The loop exits when a frontier count hits zero — a per-level 1-row
    driver sync, same cost class as connected_components' convergence
    fingerprint. Returns (node, hop) with hop = exact BFS distance for
    every node reachable within max_hops (the source at hop 0).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(int(source), 0)], "node long, hop int"
    ).localCheckpoint(eager=True)
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        # union of already-checkpointed frames: lineage stays flat (one
        # union node over k checkpointed children), so re-checkpointing
        # the accumulated set every level would only copy it again
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def sssp_weighted(
    edges: DataFrame,
    source: int,
    max_rounds: int = 40,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Single-source shortest paths over non-negative INTEGER edge
    weights — frontier-based Bellman-Ford (the level-synchronous Pregel
    SSSP): each round relaxes only edges leaving nodes whose distance
    improved last round, so total work is O(rounds x frontier out-edges)
    and the round count is bounded by the hop-depth of the shortest-path
    tree, not |V|.

    Integer weights keep every distance an exact BIGINT: min() is
    order-free, results are bit-identical across partitionings and
    cluster sizes, and the whole iteration replays as unrolled SQL CTEs
    (the pagerank determinism discipline, graph.py:pagerank). Edges are
    localCheckpointed ONCE before the loop; the distance table is
    checkpointed per round to keep the plan flat. The per-round driver
    sync is a 1-row isEmpty fingerprint (connected_components cost
    class).

    Raises RuntimeError if ``max_rounds`` is exhausted before the fixed
    point — a truncated relaxation is NOT shortest paths (negative
    weights also never converge here; they are out of contract).

    Returns (node, dist) for every node reachable from ``source``.
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
        F.col(weight).cast("long").alias("w"),
    ).localCheckpoint(eager=True)
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(source), 0, True)], "node long, dist long, imp boolean"
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_rounds):
        # ONE full-outer merge carries both the new distance table and
        # the improved flag, so each round materializes a single eager
        # checkpoint; the convergence count and the next frontier are
        # cheap re-reads of the checkpointed blocks (the two-checkpoint
        # + isEmpty form cost ~2x the jobs per round, measured)
        frontier = dist.where(F.col("imp")).select("node", "dist")
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("d"),
            )
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        merged = (
            dist.select("node", "dist")
            .join(cand, "node", "full_outer")
            .select(
                "node",
                F.least(F.col("dist"), F.col("d")).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("d") < F.col("dist"))
                ).alias("imp"),
            )
            .localCheckpoint(eager=True)
        )
        dist = merged
        if merged.where(F.col("imp")).isEmpty():
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"sssp_weighted did not converge in {max_rounds} rounds"
        )
    return dist.select("node", "dist")


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node has degree >= k, computed by synchronous peeling —
    repeatedly drop nodes whose degree within the REMAINING subgraph is
    below k until a fixed point. The classic cohesion filter (spam-farm
    pruning, community seeding) and a standard Pregel benchmark.

    Per round: one degree aggregate + two semi-joins to restrict the
    edge set — all shuffles keyed on node id, edge-linear. Edges are
    canonicalized undirected (both directions emitted once) and
    localCheckpointed per round (lineage truncation; the loop re-derives
    the edge set each round so the frame shrinks monotonically).
    Convergence is a 1-row count sync per round; peeling rounds are
    graph-dependent (worst case a path peels one node per round — the
    documented adversarial case, same class as CC's star-forest bound).

    Raises RuntimeError if ``max_rounds`` is exhausted (a partial peel
    is not a k-core). Returns (node, degree) for k-core members with
    their final in-core degree.
    """
    und = (
        edges.select(
            F.col(src).cast("long").alias("a"),
            F.col(dst).cast("long").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    cur = (
        und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = cur.count()
    converged = False
    for _ in range(max_rounds):
        deg = cur.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("a")
        nxt = (
            cur.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_now = nxt.count()
        cur = nxt
        if n_now == n_prev:
            converged = True
            break
        n_prev = n_now
    if not converged:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    return cur.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
