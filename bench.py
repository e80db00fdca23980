"""Benchmark harness — prints ONE JSON line.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32).

Each query is fully materialized through the noop sink (so projection
pruning cannot skip work). Output:
  {"metric": "...", "value": <total sec>, "unit": "sec",
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

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

    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in HEADLINE:
        fn = qs[name]
        best = float("inf")
        for _rep in range(2):  # min-of-2: drops per-plan codegen warm-up
            t0 = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # scale-representative PIP: 2.4M replicated points vs 2000 synthetic
    # polygons (real ray-cast refine) — fixed overhead amortized
    from pyspark.sql import functions as F

    from geoharvest_spark.joins import pip_join
    from geoharvest_spark.synth import polygons_df

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
    t0 = time.perf_counter()
    materialize(pip_join(big_pts, polygons_df(spark, 2000), res=5))
    timings["pip_join_big"] = round(time.perf_counter() - t0, 3)

    # fused extract+normalize over a real corpus (pages/sec headline).
    # Pages are STAGED to parquet untimed — production reads the table, so
    # synthetic generation must not count against harvest throughput.
    import tempfile

    from geoharvest_spark.pipeline import harvest_pages_fused
    from geoharvest_spark.synth import web_pages_df

    n_cores = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    pages_dir = tempfile.mkdtemp(prefix="bench_pages_")
    web_pages_df(spark, N_BENCH_PAGES, partitions=n_cores * 4).write.mode(
        "overwrite"
    ).parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)
    best = float("inf")
    for _rep in range(2):
        t0 = time.perf_counter()
        materialize(harvest_pages_fused(pages))
        best = min(best, time.perf_counter() - t0)
    timings["harvest_normalize_fused"] = round(best, 3)
    total = round(time.perf_counter() - t_total0, 3)

    # derived throughputs for the north-rule metric
    n_points = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pip_rps = round(n_big / timings["pip_join_big"], 1)
    pages_ps = round(N_BENCH_PAGES / timings["harvest_normalize_fused"], 1)
    tiles_ps = round(n_points * 3 / timings["tile_pyramid_counts"], 1)

    print(
        json.dumps(
            {
                "metric": "geoharvest_spark headline suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "spatial_join_rows_per_sec": pip_rps,
                "tiles_per_sec": tiles_ps,
                "pages_per_sec": pages_ps,
                "cpus": int(cpus) if str(cpus).isdigit() else cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
