"""Streaming windowed aggregations over an events-shaped source.

Design: the same logical aggregation runs in batch (workloads/relational
``events_hourly_rollup``) and streaming (here) — Structured Streaming's
incremental execution of the identical DataFrame plan. Tests assert
batch/stream equivalence, which is the property that matters at scale
(a backfill and the live stream must agree).

Watermarking: ``withWatermark(ts, delay)`` bounds state: late rows beyond
the delay are dropped in append mode. State-store size is then
O(active windows × groups), independent of stream length.

PRE-EPOCH CAVEAT: Spark initializes the event-time watermark to epoch 0
(1970-01-01), so rows whose event time predates the epoch are "older
than the watermark" in the FIRST micro-batch and are silently
late-dropped before any stateful operator sees them. Event times before
1970 (placeholder dates, data errors) are therefore OUTSIDE the
batch == stream equivalence contract of this module — scrub or clamp
them upstream, or run the batch twin, which processes them correctly.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from etl_manager_spark.functions.exact import dec, dec_sum

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def read_events_stream(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """File-source stream over the events parquet. The stream schema is
    derived from the batch read of the SAME file (never hardcoded — the
    fixture's physical ts encoding has drifted between NANOS-as-long and
    MICROS across testdata generations, and a forced ``ts long`` schema
    silently read µs values as if they were ns, corrupting every streaming
    timestamp 1000×). ts normalization is the shared ``adapt_ts`` helper,
    so batch and stream cannot diverge."""
    from etl_manager_spark.workloads.tables import adapt_ts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Physical schema as Spark resolves it for batch — the source of truth.
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # file-source streams require a directory path; select just the events
    # file from the shared sf dir with a glob filter
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    # TIMESTAMP (not NTZ): EventTimeWatermark requires it; session TZ is
    # pinned to UTC so values line up with the batch NTZ variant.
    adapted = adapt_ts(raw).withColumn("ts", F.col("ts").cast("timestamp"))
    # ENFORCED batch==stream contract (round 10): Spark initializes the
    # event-time watermark at epoch 0, so a pre-1970 row is "late" in the
    # very first micro-batch and is dropped before any stateful operator —
    # engine semantics, not a bug (verified bit-exactly on the fuzz6 edge
    # dataset). Rather than adjudicating that divergence per query, the
    # reader makes the precondition real: pre-epoch event time is outside
    # the contract and is filtered here; every streaming oracle mirrors
    # this filter (workloads/streams.py:_contract). NULL ts passes through
    # unchanged — its handling is per-operator and already oracle-pinned.
    return adapted.filter(
        F.col("ts").isNull()
        | (F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )


def hourly_rollup(events: "DataFrame", watermark: str = "1 hour") -> "DataFrame":
    """Tumbling 1-hour window aggregation (streaming form of the batch
    ``events_hourly_rollup``). Uses ``F.window`` so the plan is watermark-
    aware; ``window.start`` is exposed as ``hour_start`` to match batch."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value").alias("total_value"),
            # exact distinct: COUNT(DISTINCT) is unsupported in streaming
            # aggs, but collect_set is — state per window is O(distinct
            # users in that window), bounded by the watermark horizon.
            # Swap to approx_count_distinct if per-window cardinality is
            # unbounded at your scale.
            F.size(F.collect_set("user_id")).alias("active_users"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
            "n_events",
            "total_value",
            "active_users",
        )
    )


_DURATION_UNITS = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1.0,
    "minute": 60.0, "hour": 3600.0, "day": 86400.0, "week": 604800.0,
}


def _duration_seconds(spec: str) -> int:
    """Seconds in a Spark interval string like '10 minutes' / '1 hour'
    (the CalendarInterval subset window() accepts). Sub-second components
    must still sum to whole seconds for the rollup-multiple check."""
    total = 0.0
    parts = spec.strip().lower().split()
    if len(parts) % 2 != 0 or not parts:
        raise ValueError(f"unparseable interval: {spec!r}")
    for qty, unit in zip(parts[::2], parts[1::2]):
        unit = unit.rstrip("s")
        if unit not in _DURATION_UNITS:
            raise ValueError(f"unparseable interval unit in {spec!r}: {unit}")
        total += float(qty) * _DURATION_UNITS[unit]
    if total != int(total):
        raise ValueError(f"interval {spec!r} is not a whole-second duration")
    return int(total)


def two_level_rollup(
    events: "DataFrame",
    small: str = "10 minutes",
    big: str = "1 hour",
    watermark: str = "1 hour",
) -> "DataFrame":
    """Chained stateful aggregation (Spark ≥3.4 multiple-stateful-operator
    support): a fine-grained tumbling rollup per (window, event_type)
    re-aggregated into coarse windows — the pre-aggregation cascade every
    metrics pipeline wants, because the second level consumes one row per
    closed small window instead of re-reading events.

    Both levels are watermark-aware in one query (``window_time`` keys the
    second window off the first's event-time column). Emission semantics:
    a coarse window reaches the sink once ``window.end <= watermark``
    (non-strict — verified against a crafted boundary fixture), and all
    its fine windows necessarily closed by then, so emitted rows are
    complete and final. State: level 1 holds O(open small windows ×
    types), level 2 O(open big windows × types) — both bounded by the
    watermark horizon, not the stream length.

    ``big`` must be an integer multiple of ``small``: the level-2 window
    keys off ``window_time`` (= small-window end − 1µs), so a small
    window STRADDLING a big boundary would be wholly assigned to the
    LATER big window — silently moving its head events across the
    boundary relative to the batch single-level rollup. Refused loudly."""
    small_s = _duration_seconds(small)
    big_s = _duration_seconds(big)
    if small_s <= 0 or big_s % small_s != 0:
        raise ValueError(
            f"two_level_rollup: big ({big!r}) must be an integer multiple "
            f"of small ({small!r}) — a straddling small window would be "
            "wholly assigned to the later big window, silently "
            "misaggregating the boundary"
        )
    lvl1 = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", small), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # keep the partial sums DECIMAL so level 2 re-sums exactly;
            # the single double conversion happens once, at the end
            F.sum(dec("value")).alias("v"),
        )
    )
    return (
        lvl1.groupBy(F.window(F.window_time("window"), big), "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rollup(events: "DataFrame", size: str = "2 hours", slide: str = "1 hour") -> "DataFrame":
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", size, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("window_start"),
            F.col("window.end").cast("timestamp_ntz").alias("window_end"),
            "n_events",
        )
    )


def session_rollup(events: "DataFrame", gap: str = "30 minutes") -> "DataFrame":
    """Session windows (gap-based) per user — the streaming counterpart of
    the batch sessionization workload."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(
    stream_df: "DataFrame",
    spark: "SparkSession",
    name: str,
    output_mode: str = "complete",
    state_partitions: int | None = 8,
) -> "DataFrame":
    """Execute a streaming aggregation with availableNow (process all data
    now, then stop) into an in-memory sink; returns the result table.

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` for the
    query's lifetime (restored after): a stateful query's state-store
    partition count is FIXED at first start by the checkpoint, and every
    partition pays store init/commit per micro-batch — size it to key
    cardinality, not to the session's relational default. Pass ``None``
    to inherit the session setting (e.g. for genuinely large key spaces).
    Default 8 is measured, not guessed: fewer partitions cut JVM
    state-store init/commit but SERIALIZE the Python workers of
    applyInPandasWithState queries (4 partitions cost +40% on the
    per-user counter fixture); 8 balances both families here, and a
    production deployment sizes it with the key space — the
    ``SPARK_GRAFT_STATE_PARTITIONS`` env override (round 10) is the
    deployment knob for that, with the measured local default
    unchanged."""
    import os

    env = os.environ.get("SPARK_GRAFT_STATE_PARTITIONS")
    if env is not None and state_partitions is not None:
        state_partitions = int(env)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def interval_join(
    left: "DataFrame",
    right: "DataFrame",
    gap: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> "DataFrame":
    """Watermarked stream-stream join: each left event pairs with the
    right events of the same user inside ``[left.ts, left.ts + gap]`` —
    the click→conversion attribution shape.

    Both sides carry watermarks and the join predicate bounds event-time
    distance, so Spark can expire join state: per-key buffers hold only
    rows inside watermark ± gap, keeping state size proportional to the
    time horizon instead of the stream length — the property that makes
    stream-stream joins feasible at 100 TB/day.

    ``how="left_outer"`` additionally emits each unmatched click with
    null purchase columns — but only at state eviction: with W the
    global watermark (the MIN across both inputs' max event time,
    truncated to milliseconds, minus the delay), a click's state expires
    when ``click_ts <= W - gap - 1ms`` — Spark's join-state value
    watermark subtracts one extra millisecond beyond the match-window
    arithmetic (StreamingJoinHelper; pinned to the microsecond by the
    boundary test). Clicks whose window the final watermark never
    clears stay in state and are not emitted — late-data safety over
    completeness, the standard streaming trade.

    ``how="full_outer"`` adds the mirrored bound for the right side:
    ``purchase_ts >= click_ts`` means a purchase can only match clicks
    at or before it, so its state expires — and its null-extended row
    emits — once ``purchase_ts <= W - 1ms`` (no ``gap`` term: the
    purchase side's value watermark comes from the lower join bound)."""
    if how not in (
        "inner",
        "left_outer",
        "leftouter",
        "left",
        "full_outer",
        "fullouter",
        "full",
    ):
        raise ValueError(
            f"interval_join supports inner/left_outer/full_outer, got {how!r}"
        )
    if how in ("full_outer", "fullouter", "full"):
        how = "full_outer"
    elif how != "inner":
        how = "left_outer"
    c = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    return (
        c.join(
            p,
            F.expr(
                f"user_id = p_user_id AND purchase_ts >= click_ts "
                f"AND purchase_ts <= click_ts + INTERVAL {gap}"
            ),
            how,
        )
        .select(
            "click_id",
            "purchase_id",
            # the join key survives on whichever side is present — for
            # inner/left_outer this is always the click side's value;
            # full_outer's right-eviction rows carry only p_user_id
            F.coalesce(F.col("user_id"), F.col("p_user_id")).alias(
                "user_id"
            ),
            F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
            F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
        )
    )


def session_rollup_dynamic(events: "DataFrame") -> "DataFrame":
    """Session windows with a PER-EVENT gap (Spark ≥3.2 dynamic
    ``session_window``): purchases close a session after 10 minutes,
    every other event keeps the usual 30 — the "conversion ends the
    visit" sessionization marketing funnels use. Each event proposes
    the interval [ts, ts+gap); overlapping proposals merge, so
    ``session_end`` is the max proposed end, not last-event + constant."""
    # session_window's dynamic form wants CalendarIntervalType: string
    # gaps are parsed per row; ANSI INTERVAL literals (DayTimeInterval)
    # are rejected
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("10 minutes")
    ).otherwise(F.lit("30 minutes"))
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
            F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
