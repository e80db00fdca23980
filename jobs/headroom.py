"""Scale-headroom check (one-off, local[32]): run the round-2 plans —
hierarchical tile rollup and IVF ANN — at bench volume and at ~8-20x it,
and report per-row cost. Flat per-row cost = the plan is linear in input
(no quadratic blowup hiding at small scale).

Prints one JSON line per (workload, volume).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from geoharvest_spark.session import get_spark  # noqa: E402


def synth_points(spark, n_base: int, mult: int):
    """Deterministic lon/lat points: n_base * mult rows, no parquet I/O."""
    df = spark.range(0, n_base * mult, 1, 128)
    return df.select(
        ((F.col("id") * 7919) % 36000 / 100.0 - 180.0).alias("lon"),
        ((F.col("id") * 104729) % 18000 / 100.0 - 90.0).alias("lat"),
    )


def synth_embeddings(spark, n: int, dim: int = 64):
    """Deterministic array<double> embeddings, JVM-side (no Python in the
    generator): element j of row i = fract(sin-free integer hash)."""
    df = spark.range(0, n, 1, 128).withColumnRenamed("id", "vec_id")
    arr = F.array(
        *[
            (((F.col("vec_id") * (7919 + 13 * j) + 104729 * j) % 10007)
             / 10007.0 - 0.5)
            for j in range(dim)
        ]
    )
    return df.select("vec_id", arr.alias("embedding"))


def time_noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("headroom", cores="32")
    from geoharvest_spark.simsearch import ivf_centroids_np, ivf_topk
    from geoharvest_spark.tiles import tile_pyramid_counts_rollup

    # warm-up: python worker pool + codegen
    time_noop(synth_points(spark, 100_000, 1))

    for n_pts in (2_400_000, 19_200_000):
        pts = synth_points(spark, n_pts, 1)
        best = min(
            time_noop(tile_pyramid_counts_rollup(pts)) for _ in range(2)
        )
        print(
            json.dumps(
                {
                    "workload": "tile_pyramid_rollup",
                    "rows": n_pts,
                    "levels": 5,
                    "sec": round(best, 3),
                    "rows_per_sec": round(n_pts / best, 1),
                    "ns_per_row": round(best / n_pts * 1e9, 1),
                }
            )
        )

    # IVF ANN: centroids trained once on a driver-side sample (standard IVF),
    # then distributed assignment + probe-join + re-rank over the corpus
    rs = np.random.RandomState(7)
    train = rs.normal(size=(20_000, 64))
    cents = ivf_centroids_np(train, n_lists=64)
    # warm the pandas-UDF worker pools (first heavy Python stage pays a
    # one-time ~15s spawn/import storm — see CLAUDE.md)
    time_noop(
        ivf_topk(
            synth_embeddings(spark, 100),
            synth_embeddings(spark, 10_000),
            cents,
            k=10,
            n_probe=4,
        )
    )
    for n_vec in (250_000, 2_000_000):
        corpus = synth_embeddings(spark, n_vec)
        queries = synth_embeddings(spark, 100)
        spark.catalog.clearCache()
        best = min(
            time_noop(ivf_topk(queries, corpus, cents, k=10, n_probe=4))
            for _ in range(2)
        )
        print(
            json.dumps(
                {
                    "workload": "ivf_ann",
                    "rows": n_vec,
                    "queries": 100,
                    "n_lists": 64,
                    "n_probe": 4,
                    "sec": round(best, 3),
                    "rows_per_sec": round(n_vec / best, 1),
                    "ns_per_row": round(best / n_vec * 1e9, 1),
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
