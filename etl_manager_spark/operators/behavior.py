"""Event-sequence analytics: ordered funnels and cohort retention.

The two queries every product-analytics engine ships (and the reference's
events workloads stop short of): how far users progress through an
ordered step sequence, and how cohorts retain over time. Both are
expressed as same-key joins + hash aggregates on the user id — every
shuffle is on ``user_id``, so a source pre-partitioned/bucketed by user
executes them with ONE exchange total, and AQE coalesces the rest.
No windows over unbounded partitions, no collect_list of whole event
histories; state per user is O(steps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: a user reaches step i+1 only with an event of that
    type STRICTLY AFTER their step-i arrival time (min-after-previous
    semantics — the standard product-analytics definition; simultaneous
    events don't advance the funnel).

    Per step: one filtered aggregation min(ts) per user + one join back
    to the previous step's arrivals — k steps → k same-key shuffles on
    ``user_id``, each input smaller than the last (funnels only narrow).
    Each step's arrival table is persisted while the funnel is computed:
    it is consumed twice (as the next step's join input and by its own
    count), and without the pin every downstream branch would replay the
    whole upstream chain — O(k²) scans of the events table instead of k.
    Arrival tables are per-user rows (bounded by distinct users,
    spill-to-disk storage level), far below event volume.

    The per-step counts are materialized EAGERLY (each is a one-row
    aggregate) and every arrival table is unpersisted before returning, so
    a long-lived session running many funnels never accumulates cached
    blocks. The k-row result comes back as a local relation — at any data
    scale the driver traffic is k longs.

    Returns one row per step: (step, step_name, n_users), where n_users
    counts users whose funnel reached at least that step."""
    assert steps, "funnel needs at least one step"
    arrivals = funnel_step_arrivals(events, steps, id_col, ts_col, type_col)
    try:
        # persist BEFORE any action: later steps reference the same
        # analyzed plans, so the cache manager serves them the pinned
        # arrival tables during the counts below
        for cur in arrivals:
            cur.persist()
        rows = [
            (i + 1, s, cur.agg(F.count(F.lit(1))).collect()[0][0])
            for i, (s, cur) in enumerate(zip(steps, arrivals))
        ]
    finally:
        for cur in arrivals:
            cur.unpersist()
    return events.sparkSession.createDataFrame(
        rows, "step int, step_name string, n_users long"
    )


def funnel_step_arrivals(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """The lazy per-step arrival plans behind :func:`funnel` — step i's
    frame is one row per user who reached step i, with their arrival time.
    Exposed separately so plan-quality tests (and callers wanting the
    per-user detail rather than the counts) can inspect/reuse the plans;
    ``funnel`` persists each while counting, then unpersists."""
    arrivals: list[DataFrame] = []
    prev: DataFrame | None = None
    for s in steps:
        matching = events.filter(F.col(type_col) == s).select(
            F.col(id_col).alias("id"), F.col(ts_col).alias("_ts")
        )
        if prev is None:
            cur = matching.groupBy("id").agg(F.min("_ts").alias("arrived"))
        else:
            cur = (
                matching.join(
                    prev.select("id", F.col("arrived").alias("_prev")), on="id"
                )
                .filter(F.col("_ts") > F.col("_prev"))
                .groupBy("id")
                .agg(F.min("_ts").alias("arrived"))
            )
        arrivals.append(cur)
        prev = cur
    return arrivals


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the calendar day of
    their FIRST event; each later active day counts them into
    (cohort_day, day_offset). The classic triangle view feeding retention
    curves.

    Two hash shuffles: first-seen per user (min agg on id), then
    distinct (user, offset) pairs — the join carrying cohort_day back to
    events is on the same ``user_id`` key, so a bucketed-by-user layout
    runs it exchange-free. Output size is O(days²), independent of row
    count.

    Returns (cohort_day date, day_offset int, n_users) with day_offset 0
    being the cohort's own first day."""
    first_seen = events.groupBy(F.col(id_col).alias("id")).agg(
        F.date_trunc("day", F.min(ts_col)).cast("date").alias("cohort_day")
    )
    return (
        events.select(
            F.col(id_col).alias("id"),
            F.date_trunc("day", F.col(ts_col)).cast("date").alias("_day"),
        )
        .join(first_seen, on="id")
        .select(
            "id",
            "cohort_day",
            F.datediff(F.col("_day"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
