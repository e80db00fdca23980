from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geoharvest_spark.bloom import (
    bloom_build,
    bloom_build_py,
    bloom_might_contain,
    bloom_prune,
)

SF001 = "/root/testdata/sf0.001"
M, K = 1 << 14, 3


@pytest.fixture(scope="module")
def dim(spark):
    return (
        spark.read.parquet(f"{SF001}/customer.parquet")
        .where("c_mktsegment = 'BUILDING'")
        .cache()
    )


def test_spark_build_equals_python_twin(spark, dim):
    hx = bloom_build(dim, "c_custkey", M, K)
    keys = [r["c_custkey"] for r in dim.select("c_custkey").collect()]
    assert hx == bloom_build_py(keys, M, K)


def test_no_false_negatives(spark, dim):
    hx = bloom_build(dim, "c_custkey", M, K)
    n = dim.count()
    passed = dim.where(
        bloom_might_contain(F.col("c_custkey"), hx, M, K)
    ).count()
    assert passed == n


def test_prune_preserves_exact_join(spark, dim):
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    pruned = bloom_prune(orders, "o_custkey", dim, "c_custkey", M, K)
    exact_after_prune = pruned.join(
        dim.select("c_custkey"),
        pruned["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    exact_plain = orders.join(
        dim.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    a = sorted(r["o_orderkey"] for r in exact_after_prune.collect())
    b = sorted(r["o_orderkey"] for r in exact_plain.collect())
    assert a == b and len(a) > 0


def test_pruning_actually_prunes(spark, dim):
    # ~20% of customers are BUILDING; with fp ~ (k*n/m)^k << 1 the
    # prefilter should keep well under half the orders
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    total = orders.count()
    kept = bloom_prune(orders, "o_custkey", dim, "c_custkey", M, K).count()
    assert kept < total * 0.5, (kept, total)


def test_validation(spark, dim):
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(dim, "c_custkey", m_bits=100)
    with pytest.raises(ValueError, match="k must"):
        bloom_build(dim, "c_custkey", k=0)


def test_bloom_edge_params_and_key_types(spark):
    # minimal table, max probes, unicode + negative keys
    df = spark.createDataFrame(
        [("héllo wörld",), ("-42",), ("",)], "k string"
    )
    hx = bloom_build(df, "k", m_bits=64, k=16)
    assert hx == bloom_build_py(["héllo wörld", "-42", ""], 64, 16)
    n = df.where(bloom_might_contain(F.col("k"), hx, 64, 16)).count()
    assert n == 3  # no false negatives even at saturation
