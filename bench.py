"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Noise discipline (this host shows up to 1.6x run-to-run noise from
noisy neighbors — see BENCH/BASELINE.md): ALTERNATING CYCLES — every
workload is timed once per cycle, $SPARK_GRAFT_BENCH_CYCLES (default 3)
cycles total, and each query reports its MIN across cycles. A slow
neighbor burst then hits one cycle of every query instead of every rep
of one query, and the min recovers the quiet-host number. "value" is
the sum of per-query minima (the noise-robust suite metric);
"wall_clock_sec" is the raw timed-loop wall time.

Each query is fully materialized through the noop sink (so projection
pruning cannot skip work). Output:
  {"metric": "...", "value": <sum of per-query min sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "spatial_join_rows_per_sec": N, "pages_per_sec": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from geoharvest_spark.session import get_spark  # noqa: E402

# headline subset of the driver-contract queries (see __spark_entry__)
HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q3_topk_revenue",
    "tpch_q5_regional_revenue",
    "j3_pip_join_grid",
    "knn_haversine",
    "cell_assign_counts",
    "tile_pyramid_counts",
    "s2_cell_counts",
    "dedup_exact",
    "dedup_minhash_lsh",
    "doc_quality",
    "a4_last_event_per_key",
    "w_sessionization",
]

N_BENCH_PAGES = 6000


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


# Quiet-phase reference for the host-noise probe (min of 6 spaced
# idle-box samples, 2026-08-17). Only the DRAM kernel classifies: this
# host's noisy-neighbor phases are memory-bandwidth contention (the
# documented up-to-1.6x inflation), while single-thread ALU times swing
# 0.5-1.0s from burst-credit effects even on an idle box and carry no
# phase signal. min-of-3 reps rides out one-off reclaim spikes (an idle
# box shows a single 0.43s mem sample about 1 run in 6). The probe lets
# a bench sample carry its own phase evidence instead of a uniform
# inflation being misread as a code regression (see BENCH/BASELINE.md).
_QUIET_MEM = 0.24
# 8-thread parallel-sort floor measured the same way (min of repeated
# idle-box samples, 2026-08-17: 0.225/0.228/0.236). The multi-core probe
# exists because the single-thread kernel provably misses contention
# that only multi-core legs see (VERDICT r5 "What's wrong" #1): eight
# concurrent DRAM streams saturate the shared memory controllers the way
# a 32-thread Spark stage does, so neighbor pressure that leaves one
# stream untouched still inflates this one.
_QUIET_MEM8 = 0.22
_NOISY_RATIO = 1.5


def host_phase_probe() -> dict:
    """~2s DRAM probe, two kernels: single-thread (min of 3 reps of 10
    sorts of a 16 MB array) and 8-thread parallel (min of 3 reps, each
    thread 6 sorts of its own 16 MB array). The ratio of either kernel
    vs its pinned quiet-phase floor classifies the host phase."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    rs = np.random.RandomState(0)
    a = rs.rand(2_000_000)
    mem = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            np.sort(a)
        mem = min(mem, time.perf_counter() - t0)

    def _one(seed: int) -> None:
        arr = np.random.RandomState(seed).rand(2_000_000)
        for _ in range(6):
            np.sort(arr)

    mem8 = float("inf")
    with ThreadPoolExecutor(max_workers=8) as ex:
        for _ in range(3):
            t0 = time.perf_counter()
            list(ex.map(_one, range(8)))
            mem8 = min(mem8, time.perf_counter() - t0)
    return {
        "mem_sec": round(mem, 3),
        "mem8_sec": round(mem8, 3),
        "ratio_vs_quiet": round(
            max(mem / _QUIET_MEM, mem8 / _QUIET_MEM8), 2
        ),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    probe_pre = host_phase_probe()

    spark = get_spark("bench", cores=cpus)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm-up (untimed): first heavy python job pays a one-time worker-pool
    # spawn + import storm (~15s at 32 workers); production clusters
    # amortize it, so the timed numbers measure steady-state throughput
    from geoharvest_spark.pipeline import harvest_pages_fused as _hpf
    from geoharvest_spark.synth import web_pages_df as _wpd

    materialize(_hpf(_wpd(spark, 300, partitions=int(cpus) if str(cpus).isdigit() else 32)))
    materialize(qs["knn_haversine"](spark, sf_dir))

    # --- stage the non-query workloads' inputs (untimed) ---------------
    # scale-representative PIP: 2.4M replicated points vs 2000 synthetic
    # polygons (real ray-cast refine) — fixed overhead amortized
    import tempfile

    from pyspark.sql import functions as F

    from geoharvest_spark.joins import pip_join
    from geoharvest_spark.pipeline import harvest_pages_fused
    from geoharvest_spark.synth import polygons_df, web_pages_df

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li = li.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(4)])))
    big_pts = li.select(
        (F.col("l_orderkey") * 32 + F.col("l_linenumber") * 8 + F.col("r")).alias(
            "point_id"
        ),
        ((F.col("l_orderkey") * 7919 + F.col("l_linenumber") * 131 + F.col("r") * 101159)
         % 36000 / 100.0 - 180.0).alias("lon"),
        ((F.col("l_orderkey") * 104729 + F.col("l_linenumber") * 257 + F.col("r") * 35742)
         % 18000 / 100.0 - 90.0).alias("lat"),
    )
    n_big = big_pts.count()
    polys = polygons_df(spark, 2000)

    # fused extract+normalize over a real corpus (pages/sec headline).
    # Pages are STAGED to parquet untimed — production reads the table, so
    # synthetic generation must not count against harvest throughput.
    n_cores = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    import atexit
    import shutil

    atexit.register(shutil.rmtree, pages_dir, True)
    web_pages_df(spark, N_BENCH_PAGES, partitions=n_cores * 4).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    workloads: dict = {
        name: (lambda fn=qs[name]: fn(spark, sf_dir)) for name in HEADLINE
    }
    workloads["pip_join_big"] = lambda: pip_join(big_pts, polys, res=5)
    workloads["harvest_normalize_fused"] = lambda: harvest_pages_fused(pages)

    # --- webtext pipeline workloads (reported under separate keys so the
    # headline suite metric stays comparable across rounds) --------------
    from geoharvest_spark.textops import chunk_dedup, contamination_stats
    from geoharvest_spark.webops import extract_text_from_html
    from jobs.headroom import synth_docs

    N_BENCH_DOCS = 250_000
    docs_dir = tempfile.mkdtemp(prefix="bench_docs_")
    atexit.register(shutil.rmtree, docs_dir, True)
    synth_docs(spark, N_BENCH_DOCS).write.mode("overwrite").parquet(docs_dir)
    bench_docs = spark.read.parquet(docs_dir)
    bench_subset = bench_docs.where(F.col("doc_id") % 50 == 0)

    def _html_extract_wl():
        html = F.concat(
            F.lit("<html><head><style>p{}</style><script>var x=1;</script>"
                  "</head><body><nav>Home &gt; Docs</nav><p>"),
            F.col("text"),
            F.lit("</p><!-- f --></body></html>"),
        )
        return bench_docs.select(
            "doc_id", extract_text_from_html(html).alias("t")
        )

    from geoharvest_spark.retrieval import DRIVER_QUERIES as rt_queries
    from geoharvest_spark.retrieval import bm25_topk as rt_bm25
    from geoharvest_spark.textops import substring_span_dedup as tx_substring

    def _dbscan_workload():
        from geoharvest_spark.clustering import dbscan

        pts = spark.range(200_000).select(
            F.col("id"),
            (
                (F.col("id") % 4096 % 64) * 4
                + ((F.col("id") * 13) % 90) / F.lit(100.0)
                - 0.45
            ).alias("x"),
            (
                F.expr("(id % 4096) div 64") * 4
                + ((F.col("id") * 17) % 90) / F.lit(100.0)
                - 0.45
            ).alias("y"),
        )
        return dbscan(pts, eps=0.5, min_pts=4)

    def _pagerank_workload():
        # link-graph PageRank: 4 planted affine out-links per doc (~1M
        # edges, uniform in/out degree), 5 integer iterations at
        # scale=1e10 (250k nodes keeps n*scale*85 under the BIGINT
        # guard). Timing includes the driver-side Pregel loop — one
        # join + hash agg + left join per iteration is the cost shape.
        from geoharvest_spark.graph import pagerank

        n = N_BENCH_DOCS
        s = F.col("src")
        edges = (
            bench_docs.select(F.col("doc_id").alias("src"))
            .select(
                "src",
                F.explode(
                    F.array(
                        (s * 7 + 1) % n,
                        (s * 11 + 3) % n,
                        (s * 13 + 5) % n,
                        (s * 17 + 9) % n,
                    )
                ).alias("dst"),
            )
            .where(s != F.col("dst"))
        )
        nodes = bench_docs.select(F.col("doc_id").alias("id"))
        return pagerank(edges, nodes=nodes, iters=5, scale=10**10)

    def _cc_workload():
        # near-dup clustering: connected components over a planted
        # chain+star pair graph on the 250k doc ids (~140k edges, ~5
        # contraction rounds — the timing includes the driver-side
        # iteration, which IS the operator's cost shape)
        from geoharvest_spark.textops import connected_components

        a = F.col("doc_id")
        ids = bench_docs.select("doc_id")
        chain = ids.where(a % 10 < 3).select(
            a.alias("id_a"), (a + 1).alias("id_b")
        )
        star = ids.where((a % 37 != 0) & (a % 4 == 0)).select(
            a.alias("id_a"), (a - a % 37).alias("id_b")
        )
        return connected_components(chain.union(star))

    # BPE token accounting over the same 250k docs, both application
    # paths: the codegen replace-chain (oracle-able reference path) and
    # the Arrow rank-dict UDF with a per-executor word cache (the
    # large-merge-table production path). Merge-table training is
    # driver-side, untimed (tiny shared config, lru_cached).
    from geoharvest_spark.bpe import (
        corpus_merges,
        token_count_udf,
        with_bpe_token_count,
    )

    bpe_merges = list(corpus_merges(sf_dir, 200, 64))
    bpe_udf = token_count_udf(bpe_merges)
    from geoharvest_spark import lm as _lm

    _lm_model = _lm.corpus_lm(sf_dir)

    # raster -> vector throughput: 200 synthetic 256x256 GeoTIFFs
    # (13.1M pixels; 1 in 8 LZW-compressed to keep the codec on the
    # timed path) staged untimed; the timed leg is decode + per-cell
    # numpy partials + the two-stage merge
    from geoharvest_spark import raster as rst

    def _mk_rast(batches):
        import numpy as np

        from geoharvest_spark.raster import encode_tiff

        for pdf in batches:
            rows = []
            for rid in pdf["rid"]:
                rid = int(rid)
                rng = np.random.default_rng(rid)
                img = rng.integers(0, 256, (256, 256)).astype(np.uint8)
                rows.append(
                    (
                        rid,
                        encode_tiff(
                            img,
                            pixel_scale=(0.02, 0.02),
                            tiepoint=(
                                -175.0 + (rid % 50) * 7.0,
                                80.0 - (rid % 4) * 40.0,
                            ),
                            compression=5 if rid % 8 == 0 else 1,
                        ),
                    )
                )
            yield pd.DataFrame(rows, columns=["rid", "payload"])

    import pandas as pd

    rast_dir = tempfile.mkdtemp(prefix="bench_rast_")
    atexit.register(shutil.rmtree, rast_dir, True)
    spark.range(200).select(F.col("id").cast("int").alias("rid")).repartition(
        n_cores
    ).mapInPandas(_mk_rast, "rid int, payload binary").write.mode(
        "overwrite"
    ).parquet(rast_dir)
    bench_rasters = spark.read.parquet(rast_dir)

    webtext: dict = {
        "chunk_dedup_250k": lambda: chunk_dedup(bench_docs, chunk_tokens=20),
        "raster_cells_13M": lambda: rst.raster_cell_stats(
            bench_rasters, res=7
        ),
        "bpe_count_codegen_250k": lambda: with_bpe_token_count(
            bench_docs, bpe_merges
        ).select("doc_id", "n_tokens_bpe"),
        "bpe_count_udf_250k": lambda: bench_docs.select(
            "doc_id", bpe_udf(F.col("text")).alias("n_tokens_bpe")
        ),
        # perplexity filter scoring: explode bigrams -> broadcast join
        # vs the trained cost table -> two-stage integer aggregate
        "lm_score_250k": lambda: _lm.with_lm_score(bench_docs, _lm_model),
        # exact-substring span dedup (Lee et al.): ~25M 8-gram hashes
        # shuffled as ids-only rows, groupBy-min keeper, per-doc merge
        "substring_dedup_250k": lambda: tx_substring(
            bench_docs, k=8, emit_clean=False
        ),
        # BM25 retrieval: query-vocab-pruned postings (two corpus scans
        # + stats scan; AQE reuses the postings exchange), bucketed
        # two-stage top-k (no per-query window collapse)
        "bm25_search_250k": lambda: rt_bm25(
            bench_docs, list(rt_queries), k=10
        ),
        # spatial DBSCAN: 200k points in 4096 planted clusters; grid
        # self-join candidates + degree cores + CC rounds (the CC
        # driver-sync fixed cost dominates at this size — same shape as
        # connected_components_250k)
        "dbscan_200k": lambda: _dbscan_workload(),
        "pagerank_250k": _pagerank_workload,
        "decontaminate_250k": lambda: contamination_stats(
            bench_docs.where(F.col("doc_id") % 50 != 0), bench_subset, n=8
        ),
        "html_extract_250k": _html_extract_wl,
        "connected_components_250k": _cc_workload,
    }
    workloads.update(webtext)

    # --- timed loop: alternating cycles, min per (workload, cycle) -----
    # clamp: cycles <= 0 would leave timings at inf -> invalid JSON
    cycles = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CYCLES", "3")))
    timings = {name: float("inf") for name in workloads}
    t_total0 = time.perf_counter()
    for _cycle in range(cycles):
        for name, thunk in workloads.items():
            # drop internal operator caches (pip census, knn ranked frame,
            # minhash signatures): Spark's CacheManager matches
            # semantically-equal plans ACROSS invocations, so without this
            # later cycles of the same query would re-read cycle 1's cache
            # and report an artificially warm number
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(thunk())
            timings[name] = min(timings[name], time.perf_counter() - t0)
    timings = {k: round(v, 3) for k, v in timings.items()}
    wall = round(time.perf_counter() - t_total0, 3)
    probe_post = host_phase_probe()
    host_phase = (
        "noisy"
        if max(
            probe_pre["ratio_vs_quiet"], probe_post["ratio_vs_quiet"]
        )
        > _NOISY_RATIO
        else "quiet"
    )
    webtext_timings = {k: timings.pop(k) for k in webtext}
    total = round(sum(timings.values()), 3)

    # derived throughputs for the north-rule metric
    n_points = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pip_rps = round(n_big / timings["pip_join_big"], 1)
    pages_ps = round(N_BENCH_PAGES / timings["harvest_normalize_fused"], 1)
    tiles_ps = round(n_points * 3 / timings["tile_pyramid_counts"], 1)

    print(
        json.dumps(
            {
                "metric": "geoharvest_spark headline suite sec (sum of per-query min over alternating cycles)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "wall_clock_sec": wall,
                "cycles": cycles,
                "sf": sf,
                "spatial_join_rows_per_sec": pip_rps,
                "tiles_per_sec": tiles_ps,
                "pages_per_sec": pages_ps,
                "webtext_queries": webtext_timings,
                "webtext_docs": N_BENCH_DOCS,
                "dedup_docs_per_sec": round(
                    N_BENCH_DOCS / webtext_timings["chunk_dedup_250k"], 1
                ),
                "cpus": int(cpus) if str(cpus).isdigit() else cpus,
                "host_phase": host_phase,
                "host_probe_pre": probe_pre,
                "host_probe_post": probe_post,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
