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


def test_sorted_buckets_single_file_and_enforcement(spark, tmp_path):
    """sortBy only survives the bucketed scan when each bucket is ONE
    file (write repartitions by the bucket key first), and
    bucketed_tables_join refuses mismatched bucket specs instead of
    silently planning the shuffle it exists to avoid."""
    import os

    from etl_manager_spark.operators.bucketing import (
        bucketed_tables_join,
        write_bucketed,
    )

    df = spark.range(200).selectExpr("id % 20 as k", "id as v").repartition(8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(df, "bt_sf_l", ["k"], 4, sort_cols=["k"])
        write_bucketed(df, "bt_sf_r", ["k"], 4, sort_cols=["k"])
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED bt_sf_l")
            .filter("col_name='Location'")
            .collect()[0]["data_type"]
        )
        parts = [
            f
            for f in os.listdir(loc.replace("file:", ""))
            if f.startswith("part-")
        ]
        assert len(parts) == 4  # one file per bucket
        j = bucketed_tables_join(spark, "bt_sf_l", "bt_sf_r", ["k"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        write_bucketed(df, "bt_sf_8", ["k"], 8, sort_cols=["k"])
        with pytest.raises(ValueError, match="bucket counts differ"):
            bucketed_tables_join(spark, "bt_sf_l", "bt_sf_8", ["k"])
        with pytest.raises(ValueError, match="join on"):
            bucketed_tables_join(spark, "bt_sf_l", "bt_sf_r", ["v"])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        for t in ("bt_sf_l", "bt_sf_r", "bt_sf_8"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
