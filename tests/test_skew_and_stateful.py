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


def _hot_events(spark, sf_dir):
    """Events with a deliberately hot key: every 10th event remapped to
    user 1, so one key owns ~10% of the table (VERDICT r4 ask #6)."""
    events = load_table(spark, sf_dir, "events")
    return events.withColumn(
        "user_id",
        F.when(F.col("event_id") % 10 == 0, F.lit(1).cast("long")).otherwise(
            F.col("user_id")
        ),
    )


def test_hotkey_fixture_is_actually_skewed(spark, sf_dir):
    hot = _hot_events(spark, sf_dir)
    total = hot.count()
    top = hot.groupBy("user_id").count().orderBy(F.desc("count")).first()
    assert top["user_id"] == 1
    assert top["count"] >= 0.08 * total, (
        f"hot key holds {top['count']}/{total} rows — fixture not skewed"
    )


def test_salting_levels_hotkey_buckets(spark, sf_dir):
    """The point of salting: after adding the salt, the max (key, salt)
    bucket must be ~1/salt_factor of the hot key's rows, not all of them."""
    hot = _hot_events(spark, sf_dir)
    hot_rows = hot.filter(F.col("user_id") == 1).count()
    salted = hot.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(8)).cast("int")
    )
    buckets = (
        salted.groupBy("user_id", "_salt").count().orderBy(F.desc("count")).first()
    )
    assert buckets["count"] <= 0.5 * hot_rows, (
        f"largest salted bucket {buckets['count']} vs hot key {hot_rows} — "
        "salt did not spread the hot key"
    )


def test_hotkey_salted_join_and_agg_match_plain(spark, sf_dir):
    hot = _hot_events(spark, sf_dir).select(
        "user_id", F.col("value").cast("decimal(18,2)").alias("v")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    plain = (
        hot.join(customer, on="user_id")
        .groupBy("user_id", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
    )
    mitigated = two_phase_agg(
        salted_join(hot, customer, on="user_id", salt_factor=16),
        ["user_id", "c_nationkey"],
        {"n": "count(*)", "total": "sum(v)"},
        salt_factor=16,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, mitigated.collect())
    )


def test_aqe_skew_join_enabled(spark):
    """The session-level backstop: AQE skew-join splitting must be on so
    sort-merge joins the helpers don't cover still split hot partitions."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


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
