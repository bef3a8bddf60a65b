"""transformWithStateInPandas first-seen tracker (streaming/tws.py).

The API's Python state protocol requires protobuf, which this container
lacks (pyspark ships without it) — the functional test skips with
reason, mirroring the avro policy. The construction-level test still
runs: the processor and plan must build, so schema/typing regressions
surface even where the runtime protocol is unavailable."""

import pytest

from etl_manager_spark.streaming.tws import (
    first_seen_per_type,
    run_first_seen_to_memory,
    transform_with_state_available,
)


def test_first_seen_plan_builds(spark):
    from etl_manager_spark.streaming.windows import read_events_stream

    stream = first_seen_per_type(
        read_events_stream(spark, "/root/testdata/sf0.001")
    )
    names = [f.name for f in stream.schema.fields]
    assert names == ["user_id", "event_type", "first_seen_us"]
    assert stream.isStreaming


@pytest.mark.skipif(
    not transform_with_state_available(),
    reason="protobuf not installed — transformWithStateInPandas state "
    "protocol unavailable in this container",
)
def test_first_seen_matches_batch_min(spark, sf_dir):
    import duckdb

    out = run_first_seen_to_memory(spark, sf_dir).collect()
    got = {(r.user_id, r.event_type): str(r.first_seen) for r in out}
    exp_rows = duckdb.connect().execute(
        f"SELECT user_id, event_type, MIN(ts) FROM '{sf_dir}/events.parquet' "
        "GROUP BY user_id, event_type"
    ).fetchall()
    exp = {(u, t): str(m) for u, t, m in exp_rows}
    assert got == exp
