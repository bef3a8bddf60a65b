"""Bucketed co-located join: writing both sides bucketed by the join key
must eliminate every Exchange from the join plan — the property that makes
repeated fact-table joins affordable at 100 TB."""

import pytest
from pyspark.sql import functions as F

from etl_manager_spark.operators.bucketing import bucketed_tables_join, write_bucketed
from etl_manager_spark.plans import plan_report
from etl_manager_spark.workloads.tables import load_table


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    write_bucketed(orders, "b_orders", ["orderkey"], 8, sort_cols=["orderkey"])
    write_bucketed(lineitem, "b_lineitem", ["orderkey"], 8, sort_cols=["orderkey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    joined = bucketed_tables_join(spark, left, right, on=["orderkey"])
    r = plan_report(joined)
    assert r.shuffle_exchanges == 0, r.text[:2000]


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    left, right = bucketed_pair
    joined = bucketed_tables_join(spark, left, right, on=["orderkey"]).groupBy().agg(
        F.count(F.lit(1)).alias("n")
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).count()
    assert joined.collect()[0]["n"] == plain


def test_bucketed_agg_has_no_exchange(spark, bucketed_pair):
    # aggregation on the bucket key also reuses the on-disk partitioning
    _, right = bucketed_pair
    agg = spark.table(right).groupBy("orderkey").agg(F.count(F.lit(1)).alias("n"))
    r = plan_report(agg)
    assert r.shuffle_exchanges == 0, r.text[:2000]
