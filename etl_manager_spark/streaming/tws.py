"""Stateful streaming on the transformWithStateInPandas API (Spark 4).

The successor to ``applyInPandasWithState``: typed state variables
(ValueState / ListState / MapState) with per-state TTL, timers, and
initial-state seeding, managed per grouping key in the state store.
This module carries the engine's reference usage: a per-(user, type)
first-seen tracker over MapState — the "when did this user first do X"
table that product analytics and feature stores both maintain
incrementally.

Scale notes: state is partitioned by the grouping key exactly like a
streaming aggregation; MapState entries live in the state store (RocksDB
in production), so per-key map size should stay bounded — here it is
bounded by the event-type vocabulary. Output rows are emitted only for
keys whose map changed in the batch, so steady-state output volume
tracks novelty, not traffic.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

from pyspark.sql import functions as F
from pyspark.sql.streaming import StatefulProcessor
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessorHandle,
    TimerValues,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame

FIRST_SEEN_OUTPUT_SCHEMA = "user_id long, event_type string, first_seen_us long"


class FirstSeenProcessor(StatefulProcessor):
    """MapState[event_type -> first event-time] per user; emits the
    (user, type, first_seen) rows that changed in this micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._first_seen = handle.getMapState(
            "first_seen", "event_type string", "first_us long"
        )

    def handleInputRows(
        self, key: Any, rows: Iterator["pd.DataFrame"], timerValues: TimerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # reduce the batch FIRST (pandas min per event_type), then touch
        # state once per distinct type: the per-row form cost 2-3 state-
        # server RPCs per input row (containsKey + getValue + update) —
        # tens of thousands of round trips for a busy user's micro-batch
        # where a handful suffice. getValue alone suffices for the probe
        # (it returns None for an absent key).
        mins: dict[str, int] = {}
        for pdf in rows:
            us = pdf["ts"].astype("int64") // 1000
            # dropna=False: SQL GROUP BY keeps a NULL group; pandas'
            # default dropna=True would silently skip NULL-typed events,
            # breaking batch/stream first-seen equivalence
            batch_min = us.groupby(pdf["event_type"].values, dropna=False).min()
            for et, t in batch_min.items():
                t = int(t)
                if et not in mins or t < mins[et]:
                    mins[et] = t
        changed: dict[str, int] = {}
        for et, t in mins.items():
            k = (et,)
            got = self._first_seen.getValue(k)
            prev = got[0] if got is not None else None
            if prev is None or t < prev:
                self._first_seen.updateValue(k, (t,))
                changed[et] = t
        if changed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(changed),
                    "event_type": list(changed.keys()),
                    "first_seen_us": list(changed.values()),
                }
            )

    def close(self) -> None:
        pass


def first_seen_per_type(events: "DataFrame") -> "DataFrame":
    """events stream → incremental first-seen table via MapState."""
    return (
        events.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            FirstSeenProcessor(),
            outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )


def run_first_seen_to_memory(
    spark,
    sf_dir: str,
    name: str = "tws_first_seen",
    state_partitions: int | None = 8,
):
    """availableNow execution; returns the final (user_id, event_type,
    first_seen) table with the event time as TIMESTAMP_NTZ."""
    from etl_manager_spark.streaming.windows import read_events_stream

    from etl_manager_spark.streaming.stateful import _run_to_memory

    stream = first_seen_per_type(read_events_stream(spark, sf_dir))
    _run_to_memory(spark, stream, name, state_partitions)
    from pyspark.sql import Window

    # update-mode sink may carry one row per micro-batch per key; the
    # true first-seen is the minimum emitted value
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc("first_seen_us"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.timestamp_micros(F.col("first_seen_us"))
            .cast("timestamp_ntz")
            .alias("first_seen"),
        )
    )


def transform_with_state_available() -> bool:
    """transformWithStateInPandas needs the protobuf package for its
    state-server protocol (pyspark imports
    ``google.protobuf.descriptor`` lazily at stream start). Absent in
    this container — same permanent-skip policy as the avro jar."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
