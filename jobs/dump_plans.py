"""Dump .explain('formatted') for headline queries to plans/<tag>/.

Usage: python jobs/dump_plans.py <round e.g. r08> <suffix e.g. before> [query ...]
Writes plans/<round>/<query>_<suffix>.txt.
Reads $SPARK_GRAFT_SF_DIR (default sf1.0 — the driver's measurement scale).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from geoharvest_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "dedup_minhash_lsh", "doc_quality", "s2_cell_counts",
    "j3_pip_join_grid", "knn_haversine", "tpch_q1_pricing",
    "tpch_q3_topk_revenue", "tpch_q5_regional_revenue",
    "cell_assign_counts", "tile_pyramid_counts", "a4_last_event_per_key",
    "w_sessionization", "dedup_exact", "harvest_normalize_fused",
    "pip_join_big",
]


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump_plans", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def pip_join_big(spark, sf_dir):
        from geoharvest_spark.joins import pip_join
        from geoharvest_spark.synth import polygons_df

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        li = li.withColumn("r", F.explode(F.array(*[F.lit(i) for i in range(4)])))
        big_pts = li.select(
            (F.col("l_orderkey") * 32 + F.col("l_linenumber") * 8 + F.col("r")).alias("point_id"),
            ((F.col("l_orderkey") * 7919 + F.col("l_linenumber") * 131 + F.col("r") * 101159)
             % 36000 / 100.0 - 180.0).alias("lon"),
            ((F.col("l_orderkey") * 104729 + F.col("l_linenumber") * 257 + F.col("r") * 35742)
             % 18000 / 100.0 - 90.0).alias("lat"),
        )
        return pip_join(big_pts, polygons_df(spark, 2000), res=5)

    def harvest_normalize_fused(spark, sf_dir):
        from geoharvest_spark.pipeline import harvest_pages_fused
        from geoharvest_spark.synth import web_pages_df

        return harvest_pages_fused(web_pages_df(spark, 600, partitions=32))

    extra = {"pip_join_big": pip_join_big, "harvest_normalize_fused": harvest_normalize_fused}

    for name in names:
        fn = qs.get(name) or extra.get(name)
        if fn is None:
            print("SKIP unknown", name)
            continue
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print("WROTE", name, len(txt))
    spark.stop()


if __name__ == "__main__":
    main()
