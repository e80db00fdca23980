"""Stage-isolation profiling harness (guide §1.4) — NOT the frozen bench.

Times individual operator stages through the noop sink so the hot part of
each headline query can be attributed (scan vs UDF vs join vs window).
Prints one JSON line. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [leg ...]

With no args runs every leg. Methodology mirrors bench.py: noop sink,
clearCache between legs, min over $SPARK_GRAFT_BENCH_CYCLES (default 2)
alternating cycles.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from geoharvest_spark.session import get_spark  # noqa: E402


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench_extra", cores=cpus)
    sc = spark.sparkContext
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    from geoharvest_spark import textops as tx
    from geoharvest_spark.joins import pip_join
    from geoharvest_spark.synth import polygons_df

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # pip_join_big staging (mirrors bench.py, untimed)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li4 = li.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(4)])))
    big_pts = li4.select(
        (F.col("l_orderkey") * 32 + F.col("l_linenumber") * 8 + F.col("r")).alias(
            "point_id"
        ),
        ((F.col("l_orderkey") * 7919 + F.col("l_linenumber") * 131 + F.col("r") * 101159)
         % 36000 / 100.0 - 180.0).alias("lon"),
        ((F.col("l_orderkey") * 104729 + F.col("l_linenumber") * 257 + F.col("r") * 35742)
         % 18000 / 100.0 - 90.0).alias("lat"),
    )
    polys = polygons_df(spark, 2000)

    legs = {
        # --- minhash decomposition ---
        "minhash_sig_only": lambda: tx.minhash_signatures(docs),
        "minhash_banded": lambda: _minhash_banded(tx, docs),
        "minhash_full": lambda: qs["dedup_minhash_lsh"](spark, sf_dir),
        # --- scans ---
        "scan_lineitem_count_star": lambda: li.select("l_orderkey"),
        "scan_lineitem_allcols": lambda: li,
        "docs_identity": lambda: docs,
        # --- headline suspects ---
        "doc_quality": lambda: qs["doc_quality"](spark, sf_dir),
        "tpch_q1": lambda: qs["tpch_q1_pricing"](spark, sf_dir),
        "tpch_q5": lambda: qs["tpch_q5_regional_revenue"](spark, sf_dir),
        "a4_last_event": lambda: qs["a4_last_event_per_key"](spark, sf_dir),
        "w_sessionization": lambda: qs["w_sessionization"](spark, sf_dir),
        "j3_pip_join_grid": lambda: qs["j3_pip_join_grid"](spark, sf_dir),
        "knn_haversine": lambda: qs["knn_haversine"](spark, sf_dir),
        "dedup_exact": lambda: qs["dedup_exact"](spark, sf_dir),
        "tile_pyramid": lambda: qs["tile_pyramid_counts"](spark, sf_dir),
        "s2_cell_counts": lambda: qs["s2_cell_counts"](spark, sf_dir),
        "cell_assign": lambda: qs["cell_assign_counts"](spark, sf_dir),
        "tpch_q3": lambda: qs["tpch_q3_topk_revenue"](spark, sf_dir),
        # --- pip_join_big decomposition ---
        "pip_big_pts_only": lambda: big_pts,
        "pip_join_big": lambda: pip_join(big_pts, polys, res=5),
    }

    wanted = sys.argv[1:] or list(legs)
    cycles = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_CYCLES", "2")))
    timings = {name: float("inf") for name in wanted}
    for _cycle in range(cycles):
        for name in wanted:
            spark.catalog.clearCache()
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            materialize(legs[name]())
            timings[name] = min(timings[name], time.perf_counter() - t0)
            sc.setJobDescription(None)
    print(json.dumps({k: round(v, 3) for k, v in timings.items()}))
    spark.stop()


def _minhash_banded(tx, docs):
    # signatures + banding, no joins: isolates the band/bucket expression
    sigs = tx.minhash_signatures(docs)
    rows_per_band = 4
    return sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                            ],
                        )
                    )
                    for b in range(16)
                ]
            )
        ).alias("band", "bucket"),
    )


if __name__ == "__main__":
    main()
