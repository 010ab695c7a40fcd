"""Join-strategy utilities: salting equivalence, bucketed co-location,
forced broadcast — with plan-level witnesses."""

import pytest
from pyspark.sql import functions as F

from flink_infotheoretic_feature_selection_spark.datasets import load_table
from flink_infotheoretic_feature_selection_spark.operators.joins import (
    broadcast_dim_join,
    read_bucketed,
    salted_join,
    write_bucketed,
)
from flink_infotheoretic_feature_selection_spark.plans import broadcast_join_count, exchange_count


def test_salted_join_equals_plain_join(spark):
    # 90% of left rows share one hot key — the salting target.
    left = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = left.join(right, "k").groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    salted = salted_join(left, right, "k", n_salts=8).groupBy().agg(
        F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    ).collect()[0]
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_join_preserves_how_semantics(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    right = spark.createDataFrame([(1, 10), (2, 20)], "k int, w int")
    rows = sorted(
        tuple(r) for r in salted_join(left, right, "k", n_salts=4).select("k", "v", "w").collect()
    )
    assert rows == [(1, "a", 10), (2, "b", 20)]


def test_broadcast_dim_join_plan(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    q = broadcast_dim_join(orders, customer, orders.o_custkey == customer.c_custkey)
    assert broadcast_join_count(q) >= 1


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
        write_bucketed(
            li.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", 8, path=str(tmp_path / "bl"),
        )
        j = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"), "o_orderkey"
        )
        # co-located buckets: the join itself introduces no shuffle
        assert exchange_count(j) == 0
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_rejects_right_and_full(spark):
    left = spark.createDataFrame([(1, "a")], "k int, v string")
    right = spark.createDataFrame([(1, 10), (3, 30)], "k int, w int")
    for how in ("right", "full", "outer", "right_outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(left, right, "k", n_salts=4, how=how)
    # left_anti stays legal and correct: unmatched left rows survive once
    rows = salted_join(left, right.filter("k = 3"), "k", how="left_anti").collect()
    assert [(r.k, r.v) for r in rows] == [(1, "a")]


def test_salted_join_spreads_identical_hot_rows(spark):
    # A content hash gives fully-duplicate rows ONE salt (the straggler
    # survives); the content-independent salt must spread them.
    from flink_infotheoretic_feature_selection_spark.operators.joins import salted_join
    from pyspark.sql import functions as F

    hot = spark.createDataFrame([("k", 1)] * 400, "key string, payload int")
    dim = spark.createDataFrame([("k", "v")], "key string, val string")
    out = salted_join(hot.repartition(8), dim, on="key", n_salts=8)
    assert out.count() == 400
    # inspect the salt distribution the same way the join builds it
    salts = (
        hot.repartition(8)
        .select(F.pmod(F.monotonically_increasing_id(), F.lit(8)).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(salts) > 1, "identical rows all landed on one salt"
