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
    timings: dict[str, float] = {}
    t_total0 = time.perf_counter()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    # fused extract+normalize over a real corpus size (pages/sec headline)
    from geoharvest_spark.pipeline import harvest_pages_fused
    from geoharvest_spark.synth import web_pages_df

    n_cores = int(cpus) if str(cpus).isdigit() else (os.cpu_count() or 8)
    pages = web_pages_df(spark, N_BENCH_PAGES, partitions=n_cores * 4)
    t0 = time.perf_counter()
    materialize(harvest_pages_fused(pages))
    timings["harvest_normalize_fused"] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_total0, 3)

    # derived throughputs for the north-rule metric
    n_points = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    pip_rps = round(n_points / timings["j3_pip_join_grid"], 1)
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
