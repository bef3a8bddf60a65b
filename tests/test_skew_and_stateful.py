"""Skew helpers correctness + stateful streaming counters vs batch."""

from pyspark.sql import functions as F

from etl_manager_spark.operators.skew import salted_join, two_phase_agg
from etl_manager_spark.streaming.stateful import run_user_counters_to_memory
from etl_manager_spark.workloads.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(customer, on="o_custkey")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_join(orders, customer, on="o_custkey", salt_factor=4)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_two_phase_agg_matches_single_phase(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    single = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    )
    double = two_phase_agg(
        events,
        ["event_type"],
        {"n": "count(*)", "min_v": "min(value)", "max_v": "max(value)"},
        salt_factor=4,
    )
    assert sorted(map(tuple, single.collect())) == sorted(map(tuple, double.collect()))


def test_stateful_counters_match_batch(spark, sf_dir):
    out = run_user_counters_to_memory(spark, sf_dir, name="t_stateful")
    got = {r.user_id: (r.n_events, r.total_cents) for r in out.collect()}
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("long")
            .alias("cents"),
        )
    )
    want = {r.user_id: (r.n, r.cents) for r in batch.collect()}
    assert got == want


def test_streaming_funnel_equals_batch_funnel(spark, sf_dir):
    """The streaming state machine and the batch min-after-previous
    funnel must agree on per-step user counts — backfill/live parity."""
    from pyspark.sql import functions as F

    from etl_manager_spark.operators.behavior import funnel
    from etl_manager_spark.streaming.stateful import run_funnel_to_memory
    from etl_manager_spark.workloads.tables import load_tables

    steps = ("view", "click", "purchase")
    stream_final = run_funnel_to_memory(
        spark, sf_dir, steps, name="test_stream_funnel"
    )
    stream_counts = {
        i + 1: stream_final.filter(F.col("stage_reached") >= i + 1).count()
        for i in range(len(steps))
    }
    batch = funnel(load_tables(spark, sf_dir)["events"], list(steps))
    batch_counts = {r.step: r.n_users for r in batch.collect()}
    assert stream_counts == batch_counts
