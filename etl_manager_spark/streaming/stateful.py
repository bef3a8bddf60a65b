"""Custom stateful streaming operator via ``applyInPandasWithState``.

Example operator: per-user running counters (events seen, value sum, last
event time) maintained as explicit state across micro-batches, with
optional idle-timeout eviction. This is the escape hatch for semantics
Spark's built-in windowed aggregations can't express (per-key state
machines, custom eviction, enrichment caches).

Scale notes: state lives in the state store partitioned by the grouping
key — the same hash layout as a streaming aggregation; Arrow batches move
rows into Python per key-group. Keep state values small and bounded.

Timeout caveat (discovered the hard way): with
``GroupStateTimeout.ProcessingTimeTimeout`` the micro-batch engine keeps
scheduling timeout-processing batches after the data is exhausted, so an
``availableNow`` run never terminates. Idle-key eviction is therefore
opt-in (``idle_timeout_ms``) and meant for continuous triggers; bounded
backfills use ``NoTimeout``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterable, Iterator, Optional

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "user_id long, n_events long, total_cents long, last_seen timestamp"
)
STATE_SCHEMA = "n_events long, total_cents long, last_seen_us long"


def _make_update_fn(idle_timeout_ms: Optional[int]):
    """Closure so the state function knows whether eviction is on without
    relying on driver-side globals surviving pickling."""

    def update_user_counters(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        # last-seen sentinel is None, NOT 0: epoch 0 silently wins max()
        # against every pre-1970 event (negative unix micros), clamping
        # last_seen to 1970-01-01 for users whose events predate epoch
        n, cents, last_us = state.get if state.exists else (0, 0, None)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(pdf["value_cents"].sum())
            ts_ns = pdf["ts"].dropna().astype("int64")  # NaT would poison max
            if len(ts_ns):
                m = int(ts_ns.max()) // 1000
                last_us = m if last_us is None else max(last_us, m)
        state.update((n, cents, last_us))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "last_seen": [
                    pd.Timestamp(last_us, unit="us")
                    if last_us is not None
                    else pd.NaT
                ],
            }
        )

    return update_user_counters


def user_counters(
    events: "DataFrame", idle_timeout_ms: Optional[int] = None
) -> "DataFrame":
    """events stream → per-user stateful counters (update mode).

    ``idle_timeout_ms`` turns on ProcessingTime eviction of idle users —
    use only with continuous triggers (see module docstring)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    # double → integer cents JVM-side (codegen), so the Python state
    # function only sums int64: exact, accumulation-order-independent (the
    # property that lets this operator carry a full SQL oracle), and ~100×
    # cheaper than per-row decimal conversion inside the state worker.
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    return (
        events.select("user_id", "ts", cents.alias("value_cents"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )


def _run_to_memory(spark, stream, name: str, state_partitions: int | None):
    """availableNow runner for the stateful wrappers — delegates to
    ``windows.run_to_memory`` (one copy of the shuffle-partition
    pin/restore logic) in update mode."""
    from etl_manager_spark.streaming.windows import run_to_memory

    return run_to_memory(
        stream,
        spark,
        name,
        output_mode="update",
        state_partitions=state_partitions,
    )


def run_user_counters_to_memory(
    spark,
    sf_dir: str,
    name: str = "stateful_user_counters",
    state_partitions: int | None = 8,
):
    """availableNow execution of the stateful counters over the events file
    stream; returns the final per-user counter table (see
    :func:`_run_to_memory` for the shuffle-partition pinning rationale)."""
    from etl_manager_spark.streaming.windows import read_events_stream

    stream = user_counters(read_events_stream(spark, sf_dir))
    _run_to_memory(spark, stream, name, state_partitions)
    # update-mode memory sink may hold one row per micro-batch per user;
    # keep the latest per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# --------------------------------------------------------------------- #
# Streaming funnel: per-user ordered step state machine

FUNNEL_OUTPUT_SCHEMA = "user_id long, stage_reached int, arrived_us long"
FUNNEL_STATE_SCHEMA = "stage int, arrived_us long"


def _make_funnel_fn(steps: tuple[str, ...]):
    def update_funnel(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterable["pd.DataFrame"]:
        import pandas as pd

        stage, arrived_us = state.get if state.exists else (0, 0)
        batch = pd.concat(list(pdfs))
        # within a micro-batch, replay this user's events in event-time
        # order; the state machine itself is advance-only (min-after-
        # previous semantics, same as the batch funnel operator)
        batch = batch.sort_values("ts", kind="stable")
        ts_us = batch["ts"].astype("int64") // 1000
        for t, us in zip(batch["event_type"], ts_us):
            if stage < len(steps) and t == steps[stage]:
                if stage == 0 or us > arrived_us:
                    stage += 1
                    arrived_us = int(us)
        state.update((stage, arrived_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage_reached": [stage],
                "arrived_us": [arrived_us],
            }
        )

    return update_funnel


def funnel_stages(events: "DataFrame", steps: tuple[str, ...]) -> "DataFrame":
    """Streaming ordered funnel: per-user advance-only state machine over
    the step sequence (strictly-later arrivals advance the stage — the
    same min-after-previous semantics as the batch ``behavior.funnel``,
    so a backfill and the live stream agree; the batch-equivalence test
    pins it).

    Non-step events are filtered JVM-side before the Arrow boundary, so
    the Python state worker sees only candidate rows. State per user is
    two ints — bounded regardless of stream length. Correctness requires
    per-user in-order delivery ACROSS micro-batches (within a batch the
    worker sorts); feed out-of-order sources through a watermark-sorted
    stage first."""
    return (
        events.select("user_id", "ts", "event_type")
        # an unidentified (NULL user) or timeless row cannot advance a
        # per-user ordered state machine; SQL backfills agree since
        # NULL keys never equi-join
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin(list(steps))
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_funnel_fn(tuple(steps)),
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_funnel_to_memory(
    spark,
    sf_dir: str,
    steps: tuple[str, ...],
    name: str = "stateful_funnel",
    state_partitions: int | None = 8,
):
    """availableNow execution of the streaming funnel; returns the final
    per-user (user_id, stage_reached, arrived) table with arrived as
    TIMESTAMP_NTZ (NULL while stage 0)."""
    from etl_manager_spark.streaming.windows import read_events_stream

    stream = funnel_stages(read_events_stream(spark, sf_dir), steps)
    _run_to_memory(spark, stream, name, state_partitions)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("stage_reached"), F.desc("arrived_us")
    )
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "stage_reached",
            F.when(
                F.col("stage_reached") > 0,
                F.timestamp_micros(F.col("arrived_us")).cast("timestamp_ntz"),
            ).alias("arrived"),
        )
    )
