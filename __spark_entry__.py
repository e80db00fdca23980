"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship smoke query at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator correctness pairs run by the
driver at sf0.01 against DuckDB (row-count + schema + value-hash).

Implementation notes:
- every computed column is aliased identically in Spark and SQL;
- float outputs are avoided or produced by the *same single IEEE expression*
  in both engines (no transcendental outputs, no re-associated sums);
- money-ish aggregates cast to DECIMAL before summing so Spark's
  shuffle-order nondeterminism cannot change the value.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from geoharvest_spark import index as ix  # noqa: E402
from geoharvest_spark.pipeline import cell_counts  # noqa: E402
from geoharvest_spark.synth import web_pages_df  # noqa: E402


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Deterministic point derivation shared by Spark and the DuckDB oracle:
# pure integer arithmetic -> bit-identical doubles in both engines.
def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        ((F.col("event_id") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("event_id") * 104729 % 18000) / 100.0 - 90.0).alias("lat"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial cell-count pipeline.

    (a) synthesize the web_pages table (input_hint shape), extract embedded
    geo metadata, sniff bboxes, assign ghcell res-5 -> counts;
    (b) derive deterministic points from sf0.001 events and count per cell;
    union the two cell-count sources (U1 heterogeneous-union semantics).
    """
    sf_dir = "/root/testdata/sf0.001"
    pages = web_pages_df(spark, 300)
    a = cell_counts(pages, res=5).select(
        F.lit("pages").alias("source"), "cell", "n_records"
    )
    b = (
        _points(spark, sf_dir)
        .withColumn("cell", ix.ghcell(F.col("lon"), F.col("lat"), 5))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_records"))
        .select(F.lit("events").alias("source"), "cell", "n_records")
    )
    return a.unionByName(b).orderBy(F.col("n_records").desc(), "cell", "source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family (SURVEY.md §2 ids in names)."""

    def q_cell_assign_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        # index op: ghcell assignment at res 5 (JVM-side integer arithmetic)
        return (
            _points(spark, sf_dir)
            .withColumn("cell", ix.ghcell(F.col("lon"), F.col("lat"), 5))
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n_points"))
            .orderBy("cell")
        )

    return {
        "cell_assign_counts": q_cell_assign_counts,
    }


_POINTS_SQL = (
    "SELECT event_id, "
    "(event_id * 7919 % 36000) / 100.0 - 180.0 AS lon, "
    "(event_id * 104729 % 18000) / 100.0 - 90.0 AS lat FROM events"
)


def oracle_sql() -> dict[str, str]:
    cell5 = ix.ghcell_sql("lon", "lat", 5)
    return {
        "cell_assign_counts": (
            f"SELECT {cell5} AS cell, count(*) AS n_points "
            f"FROM ({_POINTS_SQL}) GROUP BY 1 ORDER BY 1"
        ),
    }
