from __future__ import annotations

import pytest

SF001 = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_eliminates_exchange(spark, no_broadcast):
    """The co-located-join contract at 100 TB: write both sides
    bucketed on the join key and the sort-merge join reads buckets
    directly — NO Exchange on either side, the shuffle happened once at
    write time and every future join amortizes it. (The same write
    layout the z-order test proves for spatial pruning, here for join
    locality.)"""
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    cust = spark.read.parquet(f"{SF001}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS tb_orders")
    spark.sql("DROP TABLE IF EXISTS tb_customer")
    try:
        (
            orders.write.bucketBy(8, "o_custkey")
            .sortBy("o_custkey")
            .mode("overwrite")
            .saveAsTable("tb_orders")
        )
        (
            cust.write.bucketBy(8, "c_custkey")
            .sortBy("c_custkey")
            .mode("overwrite")
            .saveAsTable("tb_customer")
        )
        j = spark.table("tb_orders").join(
            spark.table("tb_customer"),
            spark.table("tb_orders")["o_custkey"]
            == spark.table("tb_customer")["c_custkey"],
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        # and the bucketed join returns exactly the plain join's rows
        plain = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        assert j.count() == plain.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS tb_orders")
        spark.sql("DROP TABLE IF EXISTS tb_customer")


def test_unbucketed_join_shuffles(spark, no_broadcast):
    # the control: the same join over plain parquet DOES exchange
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    cust = spark.read.parquet(f"{SF001}/customer.parquet")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
