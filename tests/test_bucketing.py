"""Bucketed co-located joins: identical bucketing on the join key makes the
join shuffle-free — the at-rest layout strategy for repeated 100 TB joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethical_data_ingestion_spark import catalog, plans
from ethical_data_ingestion_spark.io import load_table


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    catalog.save_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=8)
    catalog.save_bucketed(orders, "orders_bucketed", "l_orderkey", n_buckets=8)

    a = spark.table("li_bucketed")
    b = spark.table("orders_bucketed")
    # disable broadcast so the join must rely on the bucket layout
    joined = a.hint("merge").join(b, "l_orderkey")
    assert plans.shuffle_count(joined) == 0, plans.formatted_plan(joined)

    expected = li.join(orders, "l_orderkey").count()
    assert joined.count() == expected


def test_unbucketed_baseline_does_shuffle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = li.hint("merge").join(orders, "l_orderkey")
    assert plans.shuffle_count(joined) >= 2  # both sides repartition
