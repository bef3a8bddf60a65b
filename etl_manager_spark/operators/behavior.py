"""Event-sequence analytics: ordered funnels and cohort retention.

The two queries every product-analytics engine ships (and the reference's
events workloads stop short of): how far users progress through an
ordered step sequence, and how cohorts retain over time. ``funnel`` is a
single-shuffle sorted-walk (one hash exchange on ``user_id``, then a
JVM higher-order-function scan of each user's funnel events); the
``funnel_step_arrivals`` chain keeps the equivalent join-based plan for
callers needing per-user arrival timestamps. ``cohort_retention`` is
same-key joins + hash aggregates on the user id — a source
pre-partitioned/bucketed by user executes it with ONE exchange total.
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

    ONE scan of the events table and ONE data-sized shuffle (hash on
    ``user_id``): each user's funnel events are gathered into a
    time-sorted array and walked with a JVM higher-order ``aggregate``
    whose state is just (steps reached, last arrival ts). The greedy
    earliest-arrival walk is exactly the classic min-after-previous
    chain: after reaching step i at time t, the first step-i+1 event
    strictly after t in the sorted stream IS min(ts > t). Everything
    after the per-user walk is k-row-sized (a conditional count per
    step), so the remaining exchanges move bytes proportional to the
    number of steps, not the data.

    State per user is bounded by that user's FUNNEL-STEP events (the
    ``event_type`` filter pushes to the scan; non-funnel traffic never
    shuffles). For adversarial per-user volumes — or when per-user
    arrival timestamps are the deliverable — ``funnel_step_arrivals``
    keeps the equivalent k-join chain whose state is O(1) per user per
    step.

    Returns one row per step: (step, step_name, n_users), where n_users
    counts users whose funnel reached at least that step — including
    zero-count rows for steps nobody reached.

    Step names must be DISTINCT: the walk tags each event with
    ``array_position`` (first occurrence), so a repeated step name could
    never match its later position and that step would silently report
    0 users — refused loudly instead (``funnel_step_arrivals`` handles
    repeated names via its per-step join chain)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError(
            f"funnel steps must be distinct, got {steps!r} — "
            "array_position tags events with the FIRST occurrence, so a "
            "repeated step name can never be reached; use "
            "funnel_step_arrivals for repeated-step funnels"
        )
    ts_type = events.schema[ts_col].dataType
    steps_arr = F.array(*[F.lit(s) for s in steps])
    # NULL-ts events can't arrive anywhere — and worse, the null-ts
    # struct sorts FIRST, advances step 1 with last=NULL, and every later
    # strict ev.ts > NULL comparison is NULL, permanently freezing the
    # walk at step 1. funnel_step_arrivals' min(ts) ignores NULLs; the
    # filter keeps the two formulations equivalent.
    per_event = events.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(id_col).alias("id"),
        F.struct(
            F.col(ts_col).alias("ts"),
            # 1-based position in the declared step order; struct sort is
            # (ts, idx) so same-instant events order deterministically
            # (and can never advance past the strict-> gate anyway)
            F.array_position(steps_arr, F.col(type_col)).cast("int").alias("idx"),
        ).alias("e"),
    )
    walk = F.aggregate(
        F.array_sort(F.collect_list("e")),
        F.struct(
            F.lit(0).alias("k"), F.lit(None).cast(ts_type).alias("last")
        ),
        lambda acc, ev: F.when(
            (ev["idx"] == acc["k"] + F.lit(1))
            & ((acc["k"] == F.lit(0)) | (ev["ts"] > acc["last"])),
            F.struct((acc["k"] + F.lit(1)).alias("k"), ev["ts"].alias("last")),
        ).otherwise(acc),
    )
    reached = per_event.groupBy("id").agg(walk["k"].alias("reached"))
    # conditional count per step over the per-user rows: k tiny columns,
    # one partial-agg pass — no second data-sized shuffle
    counts = reached.agg(
        *[
            F.sum(F.when(F.col("reached") >= i + 1, 1).otherwise(0))
            .cast("long")
            .alias(f"_s{i + 1}")
            for i in range(len(steps))
        ]
    )
    steps_df = events.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step int, step_name string"
    )
    unpivoted = counts.selectExpr(
        "stack({n}, {args}) AS (step, n_users)".format(
            n=len(steps),
            args=", ".join(f"{i + 1}, _s{i + 1}" for i in range(len(steps))),
        )
    )
    return steps_df.join(unpivoted, on="step", how="left").select(
        "step",
        "step_name",
        F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users"),
    )


def funnel_step_arrivals(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-step arrival plans as a chained min-after-previous join —
    step i's frame is one row per user who reached step i, with their
    arrival time. The O(1)-state-per-user-per-step alternative to
    :func:`funnel`'s sorted-walk (which gathers each user's funnel
    events into one array): use this form for per-user arrival detail,
    repeated step names, or adversarial per-user event volumes."""
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
