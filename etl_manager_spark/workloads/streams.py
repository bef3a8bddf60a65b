"""Streaming workloads — executed with availableNow triggers so the driver
can call them like batch queries. Rows-only checks (streaming plans aren't
SQL-expressible for DuckDB); batch-equivalence is asserted in
tests/test_streaming.py instead.
"""

from __future__ import annotations

from etl_manager_spark.streaming.windows import (
    hourly_rollup,
    read_events_stream,
    run_to_memory,
    session_rollup,
    sliding_rollup,
)
from etl_manager_spark.workloads import workload


@workload("streaming_hourly_rollup", None, category="streaming")
def streaming_hourly_rollup(spark, sf_dir):
    stream = hourly_rollup(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, spark, "stream_hourly_rollup_result")


@workload("streaming_session_windows", None, category="streaming")
def streaming_session_windows(spark, sf_dir):
    stream = session_rollup(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, spark, "stream_session_windows_result")


@workload("streaming_sliding_windows", None, category="streaming")
def streaming_sliding_windows(spark, sf_dir):
    """2-hour windows sliding by 1 hour (each event lands in 2 windows).
    Rows-only; batch equivalence asserted in tests/test_streaming.py."""
    stream = sliding_rollup(read_events_stream(spark, sf_dir))
    return run_to_memory(stream, spark, "stream_sliding_windows_result")


@workload(
    "streaming_dedup_user_event_types",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    category="streaming",
)
def streaming_dedup_user_event_types(spark, sf_dir):
    """Streaming deduplication: dropDuplicates keeps the first occurrence
    of each (user_id, event_type) across micro-batches via keyed state.
    Unbounded state by design here (exact global dedup, so the result
    matches batch DISTINCT regardless of micro-batching); production
    streams bound state with dropDuplicatesWithinWatermark at the cost of
    re-admitting keys older than the watermark."""
    stream = (
        read_events_stream(spark, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"])
    )
    return run_to_memory(
        stream, spark, "stream_dedup_result", output_mode="append"
    )


@workload("streaming_stateful_user_counters", None, category="streaming")
def streaming_stateful_user_counters(spark, sf_dir):
    """Custom per-key state machine via applyInPandasWithState (rows-only:
    double accumulation order differs from SQL SUM, so no hash oracle;
    batch equivalence is asserted in tests/test_skew_and_stateful.py)."""
    from etl_manager_spark.streaming.stateful import run_user_counters_to_memory

    return run_user_counters_to_memory(spark, sf_dir, name="stream_stateful_counters")
