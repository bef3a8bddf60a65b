"""Streaming/batch equivalence: the same logical aggregation must agree
between Structured Streaming (availableNow) and the batch plan — the
property a backfill at 100 TB relies on."""

from pyspark.sql import functions as F

from etl_manager_spark.streaming.windows import (
    hourly_rollup,
    read_events_stream,
    run_to_memory,
    session_rollup,
    sliding_rollup,
)
from etl_manager_spark.workloads.tables import load_table


def _batch_events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_hourly_rollup_matches_batch(spark, sf_dir):
    stream_result = run_to_memory(
        hourly_rollup(read_events_stream(spark, sf_dir)), spark, "t_hourly"
    )
    batch = (
        _batch_events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("hour_start"), "n_events")
    )
    s = {(r.hour_start, r.n_events) for r in stream_result.select("hour_start", "n_events").collect()}
    b = {(r.hour_start, r.n_events) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_sliding_rollup_runs_and_overlaps(spark, sf_dir):
    out = run_to_memory(
        sliding_rollup(read_events_stream(spark, sf_dir)), spark, "t_sliding"
    )
    rows = out.collect()
    assert len(rows) > 0
    # every event lands in 2 sliding windows (2h size, 1h slide) → total
    # n_events across windows ≈ 2× the hourly total
    total = sum(r.n_events for r in rows)
    n_events = _batch_events(spark, sf_dir).count()
    assert total == 2 * n_events


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir):
    from etl_manager_spark.workloads import load_registry

    out = load_registry()["streaming_dedup_user_event_types"].fn(spark, sf_dir)
    s = {(r.user_id, r.event_type) for r in out.collect()}
    b = {
        (r.user_id, r.event_type)
        for r in _batch_events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert s == b and len(s) > 0
    # dedup means no key appears twice in the streamed output
    assert out.count() == len(s)


def test_session_windows_match_batch_sessionization(spark, sf_dir):
    stream_result = run_to_memory(
        session_rollup(read_events_stream(spark, sf_dir)), spark, "t_session"
    )
    # batch gap-based sessionization (30 min) must produce the same number
    # of sessions per user
    from etl_manager_spark.workloads import load_registry

    batch = load_registry()["events_sessionization"].fn(spark, sf_dir)
    stream_counts = {
        r.user_id: r.n for r in stream_result.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch_counts = {r.user_id: r.n_sessions for r in batch.collect()}
    assert stream_counts == batch_counts
