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


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics (established empirically against Spark 4.1 —
    subtler than 'older than watermark is dropped'):

    * a window is FINALIZED (emitted, state evicted) during the first batch
      whose starting watermark strictly exceeds the window's end;
    * a late row arriving while its window is still open merges into it —
      even if the row's own event time is behind the watermark;
    * a late row arriving AFTER its window was finalized is dropped
      (numRowsDroppedByWatermark) and the emitted result never changes.

    Three single-file micro-batches (maxFilesPerTrigger=1, modification
    times pinned to fix ordering): batch 0 seeds the watermark to 11:30,
    batch 1 finalizes the 10:00 window, batch 2 delivers a 10:30 straggler
    that must be dropped."""
    import os
    import time

    src = tmp_path / "late_src"
    os.makedirs(src)

    def write_batch(name, rows, mtime):
        spark.createDataFrame(rows, "id long, ts string").selectExpr(
            "id", "CAST(ts AS TIMESTAMP) AS ts"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        # file-source batch order follows modification time — pin it
        for root, _, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    now = time.time()
    # batch 0: 10:00 event + 12:30 event → watermark after commit = 11:30
    write_batch(
        "b0", [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:30:00")], now - 100
    )
    # batch 1: runs with watermark 11:30 > 11:00 → finalizes the 10:00
    # window (emits n=1)
    write_batch("b1", [(5, "2024-01-01 13:00:00")], now - 50)
    # batch 2: 10:30 straggler for the already-finalized window → dropped;
    # 14:00 keeps the stream moving
    write_batch(
        "b2", [(3, "2024-01-01 10:30:00"), (4, "2024-01-01 14:00:00")], now
    )

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("w"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    counts = {r.w.hour: r.n for r in spark.table("t_late").collect()}
    # the straggler was dropped, and the finalized 10:00 window holds only
    # the on-time event — emitted once, never revised
    assert dropped == 1, [p["batchId"] for p in q.recentProgress]
    assert counts.get(10) == 1, counts
    assert list(counts.values()).count(1) == len(counts), counts


def test_drop_duplicates_within_watermark_bounds_state(spark, sf_dir):
    """Bounded-state streaming dedup: dropDuplicatesWithinWatermark keeps
    state only for the watermark horizon, so state size is O(keys per
    horizon) instead of O(all keys ever) — the 100 TB dedup path, at the
    cost that a key recurring beyond the horizon is re-admitted. Here the
    whole file lands in one availableNow micro-batch, so no key outlives
    the horizon mid-stream and the output is exactly the distinct set."""
    from etl_manager_spark.streaming.windows import read_events_stream, run_to_memory

    stream = (
        read_events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
    )
    out = run_to_memory(stream, spark, "t_dedup_wm", output_mode="append")
    pairs = [(r.user_id, r.event_type) for r in out.collect()]
    exact = {
        (r.user_id, r.event_type)
        for r in _batch_events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert len(pairs) == len(set(pairs)) and set(pairs) == exact


def test_apply_cdc_stream_multibatch_upsert_and_delete(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1) applied as MERGEs: batch 2
    must update keys from batch 1, insert new ones, and drop delete-
    flagged rows; a delete for an absent key is a no-op, and the per-batch
    last-writer-wins reduce must pick the highest (ver) per key."""
    import os
    import time

    from etl_manager_spark.streaming.enrich import apply_cdc_stream

    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    schema = "k long, ver long, val string, is_deleted boolean"
    b1 = spark.createDataFrame(
        [(1, 1, "a1", False), (1, 2, "a2", False), (2, 1, "b1", False)], schema
    )
    b2 = spark.createDataFrame(
        [(2, 2, None, False), (3, 1, "c1", False), (1, 3, None, True),
         (99, 1, "zz", True)],
        schema,
    )
    f1, f2 = str(changes_dir / "b1.parquet"), str(changes_dir / "b2.parquet")
    b1.coalesce(1).write.parquet(f1)
    time.sleep(0.05)
    b2.coalesce(1).write.parquet(f2)
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(changes_dir) + "/*.parquet")
    )
    final = apply_cdc_stream(
        spark,
        stream,
        key=["k"],
        order_cols=["ver"],
        state_path=str(tmp_path / "state"),
        checkpoint_path=str(tmp_path / "ckpt"),
        delete_col="is_deleted",
    )
    got = {r.k: (r.ver, r.val) for r in final.collect()}
    # k=1: updated to ver 2 in batch 1, deleted in batch 2 → gone
    # k=2: ver 2 nulls val out (updates take the source row verbatim)
    # k=3: inserted; k=99: delete of absent key is a no-op
    assert got == {2: (2, None), 3: (1, "c1")}


def test_interval_join_rejects_unsupported_outer_sides(spark, sf_dir):
    from etl_manager_spark.streaming.windows import interval_join, read_events_stream

    clicks = read_events_stream(spark, sf_dir).filter("event_type = 'click'")
    purchases = read_events_stream(spark, sf_dir).filter("event_type = 'purchase'")
    import pytest

    with pytest.raises(ValueError, match="inner/left_outer/full_outer"):
        interval_join(clicks, purchases, how="right_outer")


def test_leftouter_interval_join_null_rows_bounded_by_watermark(spark, sf_dir):
    """Every null-extended click must sit strictly below the state-eviction
    point (ms-truncated min-of-inputs watermark − gap), and the matched
    subset must equal the inner join — the two halves of the left-outer
    contract."""
    from pyspark.sql import functions as F

    from etl_manager_spark.streaming.windows import (
        interval_join,
        read_events_stream,
        run_to_memory,
    )
    from etl_manager_spark.workloads.tables import load_table

    clicks = read_events_stream(spark, sf_dir).filter("event_type = 'click'")
    purchases = read_events_stream(spark, sf_dir).filter("event_type = 'purchase'")
    out = run_to_memory(
        interval_join(clicks, purchases, how="left_outer"),
        spark,
        "t_loj_bounds",
        output_mode="append",
    ).collect()

    ev = load_table(spark, sf_dir, "events")
    maxes = ev.groupBy("event_type").agg(F.max("ts").alias("m")).collect()
    per_type = {r.event_type: r.m for r in maxes}
    watermark = min(per_type["click"], per_type["purchase"]).replace(
        microsecond=min(per_type["click"], per_type["purchase"]).microsecond // 1000 * 1000
    )
    from datetime import timedelta

    eviction = watermark - timedelta(hours=2)  # delay 1h + gap 1h
    nulls = [r for r in out if r.purchase_id is None]
    assert nulls, "fixture should produce unmatched clicks"
    for r in nulls:
        assert r.click_ts < eviction, (r.click_ts, eviction)

    inner = run_to_memory(
        interval_join(clicks, purchases, how="inner"),
        spark,
        "t_loj_inner",
        output_mode="append",
    ).collect()
    matched = sorted(tuple(r) for r in out if r.purchase_id is not None)
    assert matched == sorted(tuple(r) for r in inner)


def test_two_level_rollup_window_close_is_nonstrict(spark, tmp_path):
    """A coarse window whose end equals the final watermark EXACTLY must
    emit (the close predicate is window.end <= watermark) — pins the
    boundary semantics the streaming_two_level_rollup oracle encodes."""
    import os

    from pyspark.sql import functions as F

    from etl_manager_spark.streaming.windows import run_to_memory, two_level_rollup

    # hour [01:00, 02:00) closes at watermark = 03:00 - 1h = 02:00 exactly;
    # hour [02:00, 03:00) must stay open
    df = spark.createDataFrame(
        [
            ("2024-01-01 01:10:00", "view", 1.0),
            ("2024-01-01 01:50:00", "view", 2.0),
            ("2024-01-01 02:30:00", "view", 4.0),
            ("2024-01-01 03:00:00", "view", 8.0),
        ],
        "ts string, event_type string, value double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
    path = os.path.join(str(tmp_path), "evts")
    df.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = run_to_memory(
        two_level_rollup(stream), spark, "t_two_level_bnd", output_mode="append"
    ).collect()
    got = {(r.hour_start.isoformat(), r.event_type): (r.n_events, r.total_value) for r in out}
    assert got == {("2024-01-01T01:00:00", "view"): (2, 3.0)}, got


def test_checkpointed_aggregation_resumes_exactly_once(spark, tmp_path):
    """Stop/restart correctness: a checkpointed streaming aggregation that
    is stopped and restarted over a source that grew in between must
    produce the same totals as one uninterrupted batch pass — no row
    double-counted (offsets replay from the checkpoint), none lost."""
    import os

    from pyspark.sql import functions as F

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "user_id long, value long"

    def run_pass(name):
        stream = (
            spark.readStream.schema(schema)
            .parquet(src)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        )
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            r.user_id: (r.n, r.total)
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], schema
    ).write.mode("append").parquet(src)
    first = run_pass("t_resume_a")
    assert first == {1: (2, 30), 2: (1, 5)}

    # source grows while the query is DOWN; restart must pick up only
    # the delta on top of the recovered state
    spark.createDataFrame(
        [(1, 100), (3, 7)], schema
    ).write.mode("append").parquet(src)
    second = run_pass("t_resume_b")
    assert second == {1: (3, 130), 2: (1, 5), 3: (1, 7)}

    # batch over everything agrees — stream-with-restart == one-shot batch
    batch = {
        r.user_id: (r.n, r.total)
        for r in spark.read.schema(schema)
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert second == batch


def test_leftouter_interval_join_eviction_boundary_is_strict(spark, tmp_path):
    """Exact-boundary pin for the streaming_leftouter_attribution oracle:
    an unmatched click emits iff ``click_ts <= W - gap - 1ms``, where
    W = ms-truncated min-of-inputs max event time minus the delay —
    Spark's join-state value watermark subtracts one extra millisecond
    (StreamingJoinHelper), and the max is FLOORED to the millisecond
    (the sub-ms tail on the max rows below must not round up)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_manager_spark.streaming.windows import (
        interval_join,
        read_events_stream,
        run_to_memory,
    )

    rows = [
        # W = 04:00:00.000 -> eviction cutoff 02:59:59.999000 inclusive
        (1, dt.datetime(2024, 1, 1, 2, 59, 59, 999000), 101, "click"),  # == cutoff
        (2, dt.datetime(2024, 1, 1, 2, 59, 59, 999001), 102, "click"),  # 1µs past
        (3, dt.datetime(2024, 1, 1, 3, 0, 0), 103, "click"),
        # matched canary pair
        (800, dt.datetime(2024, 1, 1, 2, 0, 0), 800, "click"),
        (801, dt.datetime(2024, 1, 1, 2, 10, 0), 800, "purchase"),
        # max event times: sub-ms tail exercises the ms truncation
        (900, dt.datetime(2024, 1, 1, 5, 0, 0, 500), 900, "click"),
        (901, dt.datetime(2024, 1, 1, 5, 0, 0, 500), 901, "purchase"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    clicks = read_events_stream(spark, str(tmp_path)).filter("event_type='click'")
    purchases = read_events_stream(spark, str(tmp_path)).filter(
        "event_type='purchase'"
    )
    out = run_to_memory(
        interval_join(clicks, purchases, how="left_outer"),
        spark,
        "t_loj_strict",
        output_mode="append",
    ).collect()
    assert [(r.click_id, r.purchase_id) for r in out if r.purchase_id is not None] == [
        (800, 801)
    ]
    nulls = sorted(r.click_id for r in out if r.purchase_id is None)
    # 1 == cutoff -> emits; 2 is 1µs past -> held; 3 -> held
    assert nulls == [1], nulls


def test_fullouter_interval_join_right_eviction_boundary(spark, tmp_path):
    """Mirror boundary pin for the purchase (right) side of the FULL
    OUTER interval join: ``purchase_ts >= click_ts`` is the lower join
    bound, so a purchase's state expires — and its null-extended row
    emits — iff ``purchase_ts <= W - 1ms`` (no gap term on this side)."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_manager_spark.streaming.windows import (
        interval_join,
        read_events_stream,
        run_to_memory,
    )

    rows = [
        # W = 03:00:00.000 -> purchase cutoff 02:59:59.999000 inclusive
        (11, dt.datetime(2024, 1, 1, 2, 59, 59, 999000), 201, "purchase"),
        (12, dt.datetime(2024, 1, 1, 2, 59, 59, 999001), 202, "purchase"),
        (13, dt.datetime(2024, 1, 1, 3, 0, 0), 203, "purchase"),
        # matched canary pair
        (800, dt.datetime(2024, 1, 1, 2, 0, 0), 800, "click"),
        (801, dt.datetime(2024, 1, 1, 2, 10, 0), 800, "purchase"),
        # max event times (sub-ms tail exercises ms truncation)
        (900, dt.datetime(2024, 1, 1, 4, 0, 0, 500), 900, "click"),
        (901, dt.datetime(2024, 1, 1, 4, 0, 0, 500), 901, "purchase"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    clicks = read_events_stream(spark, str(tmp_path)).filter("event_type='click'")
    purchases = read_events_stream(spark, str(tmp_path)).filter(
        "event_type='purchase'"
    )
    out = run_to_memory(
        interval_join(clicks, purchases, how="full_outer"),
        spark,
        "t_foj_strict",
        output_mode="append",
    ).collect()
    assert [
        (r.click_id, r.purchase_id)
        for r in out
        if r.click_id is not None and r.purchase_id is not None
    ] == [(800, 801)]
    # click cutoff is 01:59:59.999 — no unmatched click is that early
    assert [r for r in out if r.purchase_id is None] == []
    null_clicks = sorted(r.purchase_id for r in out if r.click_id is None)
    # 11 == cutoff -> emits; 12 is 1µs past -> held; 13/901 -> held
    assert null_clicks == [11], null_clicks


def test_cdc_swap_crash_recovery_and_empty_stream(spark, tmp_path):
    """A crash BETWEEN the two state-swap moves (current renamed away,
    _next not yet promoted) must not silently rebuild from an empty
    table: _recover promotes the complete _next. And a change stream
    with zero micro-batches returns a typed empty table, not a
    PATH_NOT_FOUND crash."""
    import os
    import shutil

    from etl_manager_spark.streaming.enrich import apply_cdc_stream

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, 1, "a", False), (2, 1, "b", False)],
        "k long, seq long, v string, deleted boolean",
    ).write.mode("overwrite").json(str(src))
    schema = "k long, seq long, v string, deleted boolean"
    out = apply_cdc_stream(
        spark,
        spark.readStream.schema(schema).json(str(src)),
        ["k"], ["seq"], str(tmp_path / "state"), str(tmp_path / "ckpt"),
        delete_col="deleted",
    )
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]
    # simulate the crash window
    state = tmp_path / "state"
    shutil.copytree(state / "current", state / "_next")
    shutil.move(str(state / "current"), str(state / "_old"))
    spark.createDataFrame(
        [(3, 2, "c", False)], schema
    ).write.mode("append").json(str(src))
    out2 = apply_cdc_stream(
        spark,
        spark.readStream.schema(schema).json(str(src)),
        ["k"], ["seq"], str(state), str(tmp_path / "ckpt2"),
        delete_col="deleted",
    )
    assert sorted((r.k, r.v) for r in out2.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    # zero micro-batches
    empty = tmp_path / "empty"
    empty.mkdir()
    out3 = apply_cdc_stream(
        spark,
        spark.readStream.schema("k long, v string, deleted boolean").json(str(empty)),
        ["k"], ["v"], str(tmp_path / "state3"), str(tmp_path / "ckpt3"),
        delete_col="deleted",
    )
    assert out3.count() == 0 and out3.columns == ["k", "v"]
    # reserved internal name refused
    import pytest as _pytest

    bad = spark.readStream.schema("k long, _cdc_rank long").json(str(empty))
    with _pytest.raises(ValueError, match="_cdc_rank"):
        apply_cdc_stream(
            spark, bad, ["k"], ["_cdc_rank"],
            str(tmp_path / "s4"), str(tmp_path / "c4"),
        )
