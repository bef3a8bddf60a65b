"""As-of (nearest-previous) join — an operator Spark lacks natively.

Implemented as the **union-sort-window** composition (SURVEY §2 custom-
operator rule (a): composition of built-in ops): tag both sides, union by
key+time, and carry the most recent right-side payload forward with
``last(..., ignorenulls=True)`` over an ordered window. One shuffle on
(key), one sort within partitions — the same cost profile as a sort-merge
join, with no range-explosion, so it scales to 100 TB the way a regular
join does (skewed keys salt the same way).

The payload travels as ONE struct column, so every carried field comes
from the same right row — carrying columns independently would let a NULL
in one payload field backfill from an older right row, silently mixing
fields of different rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS_FIELD = "_asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row with the same
    ``on`` key and ``right_ts`` <= ``left_ts`` (``direction="backward"``,
    the default), or the EARLIEST right row with ``right_ts`` >=
    ``left_ts`` (``direction="forward"`` — pandas ``merge_asof``'s
    forward mode; "next scheduled maintenance", "next order after this
    event").

    In both directions an exactly concurrent right row IS visible to the
    left row (the union sort places right rows on the probed side of the
    tie), matching standard ASOF JOIN semantics. All carried fields come
    from that single right row; a NULL payload field stays NULL (no
    backfill from older rows).

    ``tolerance`` (an SQL interval literal body, e.g. ``"7 DAYS"``) bounds
    match distance: backward, a carried right row older than ``left_ts −
    tolerance`` is treated as no match (all payload fields NULL) — the
    max-staleness guard of sensor/market-data joins; forward, one later
    than ``left_ts + tolerance``. Applied as a post-carry mask, so the
    plan shape (one union, one keyed sort-window) is unchanged.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    for reserved in ("_side", "_ts", "_asof_payload", "_asof_carried"):
        if reserved in left.columns:
            raise ValueError(
                f"asof_join: left may not contain {reserved!r} (internal "
                "working column — it would be overwritten and emitted "
                "corrupted)"
            )
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    if _TS_FIELD in right_payload:
        raise ValueError(f"asof_join: payload column {_TS_FIELD!r} is reserved")
    out_names = [f"{c}{suffix}" for c in right_payload] + [f"{right_ts}{suffix}"]
    clash = set(out_names) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: output columns {sorted(clash)} collide with left "
            f"columns — pass a different suffix"
        )
    payload = F.struct(
        *[F.col(c).alias(c) for c in right_payload],
        F.col(right_ts).alias(_TS_FIELD),
    )
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    # SQL ASOF JOIN / pandas merge_asof semantics on NULLs: a right row
    # with a NULL timestamp satisfies no <=/>= predicate (drop it before
    # the union — the ascending sort would otherwise place it FIRST and
    # backward mode would carry it as a "match"), and NULL join keys
    # never match (the window's partitionBy would group them together).
    rhs = right.filter(
        F.col(right_ts).isNotNull() & F.col(on).isNotNull()
    ).select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_asof_payload"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    if direction == "backward":
        # right (side 0) sorts BEFORE left at equal ts → visible to the
        # backward-looking frame ending at the left row
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "_asof_carried", F.last("_asof_payload", ignorenulls=True).over(w)
        )
    else:
        # forward lookup as a RUNNING frame over the REVERSED order:
        # first(...) over [currentRow, unboundedFollowing] is a shrinking
        # frame Spark re-aggregates from every row to partition end —
        # O(rows²) per key, quadratic on a hot key. last(...) over
        # (_ts DESC, _side ASC) with [unboundedPreceding, currentRow] is
        # the same "nearest right row at-or-after" in O(rows): at equal
        # ts the right row (side 0) sorts BEFORE the left row in the
        # reversed order, so it stays visible to the left row's frame —
        # the same equal-ts match the forward formulation had.
        w = (
            Window.partitionBy(on)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "_asof_carried", F.last("_asof_payload", ignorenulls=True).over(w)
        )
    # a NULL-ts or NULL-key left row matches nothing. Without this mask
    # the window formulations would still carry a payload to it: in
    # backward mode a NULL ts sorts FIRST (asc) — harmless there — but in
    # forward mode's reversed order (desc NULLS LAST) it sorts LAST, so
    # last(ignorenulls) would hand it the SMALLEST-ts right payload
    carried = carried.withColumn(
        "_asof_carried",
        F.when(
            F.col("_ts").isNotNull() & F.col(on).isNotNull(),
            F.col("_asof_carried"),
        ),
    )
    if tolerance is not None:
        if direction == "backward":
            fresh = F.col(f"_asof_carried.{_TS_FIELD}") >= (
                F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
            )
        else:
            fresh = F.col(f"_asof_carried.{_TS_FIELD}") <= (
                F.col("_ts") + F.expr(f"INTERVAL {tolerance}")
            )
        carried = carried.withColumn(
            "_asof_carried", F.when(fresh, F.col("_asof_carried"))
        )
    out_cols = (
        [F.col(c) for c in left.columns]
        + [
            F.col(f"_asof_carried.{c}").alias(f"{c}{suffix}")
            for c in right_payload
        ]
        + [F.col(f"_asof_carried.{_TS_FIELD}").alias(f"{right_ts}{suffix}")]
    )
    return carried.filter(F.col("_side") == 1).select(*out_cols)
