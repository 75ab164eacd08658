"""Bucketing: co-bucketed tables must join with ZERO shuffles, and produce
the same rows as the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from weather_data_warehouse_aws_spark.plans.inspect import count_op, physical_plan
from weather_data_warehouse_aws_spark.sources.bucketing import cobucketed_join, write_bucketed
from weather_data_warehouse_aws_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("bucketed_wh"))
    li = load_table(spark, sf_smoke_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    orders = load_table(spark, sf_smoke_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    write_bucketed(li, "li_b", ["orderkey"], n_buckets=8, sort_cols=["orderkey"],
                   location=f"{wh}/li_b")
    write_bucketed(orders, "orders_b", ["orderkey"], n_buckets=8,
                   sort_cols=["orderkey"], location=f"{wh}/orders_b")
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable auto-broadcast: at test scale the dim fits under the threshold
    # and Catalyst would broadcast, hiding the property under test (at 100 TB
    # neither side broadcasts — that's when bucketing is the difference
    # between a shuffle-free SMJ and moving both tables over the network)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = cobucketed_join(spark, left, right, ["orderkey"]).select(
            "orderkey", "l_quantity", "o_totalprice"
        )
        plan = physical_plan(joined)
        assert count_op(plan, "Exchange") == 0, "bucketed join still shuffles:\n" + plan
        assert count_op(plan, "SortMergeJoin") >= 1
        # (write-time sortBy only removes the per-task Sort when each bucket
        # is a single file; multi-file buckets still re-sort — acceptable,
        # the shuffle is the cost that matters at scale)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_rows_match_plain_join(spark, sf_smoke_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed = cobucketed_join(spark, left, right, ["orderkey"])
    li = load_table(spark, sf_smoke_dir, "lineitem")
    orders = load_table(spark, sf_smoke_dir, "orders")
    plain_n = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert bucketed.count() == plain_n
    b_sum = bucketed.agg(F.round(F.sum("l_extendedprice"), 2).alias("s")).collect()[0].s
    p_sum = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("s"))
        .collect()[0]
        .s
    )
    assert b_sum == p_sum