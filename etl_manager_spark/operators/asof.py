"""As-of (nearest-previous) join — an operator Spark lacks natively.

Implemented as the **union-sort-window** composition (SURVEY §2 custom-
operator rule (a): composition of built-in ops): tag both sides, union by
key+time, and carry the most recent left-side payload forward with
``last(..., ignorenulls=True)`` over an ordered window. One shuffle on
(key), one sort within partitions — the same cost profile as a sort-merge
join, with no range-explosion, so it scales to 100 TB the way a regular
join does (skewed keys salt the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row with the same
    ``on`` key and ``right_ts`` <= ``left_ts``.

    Right rows sort before left rows at equal timestamps (so an exactly
    concurrent right row IS visible to the left row, matching standard
    ASOF JOIN semantics).
    """
    right_payload = right_payload or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ts", F.col(left_ts))
    rhs = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in right_payload],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_payload
        ],
        F.last(F.col(f"{right_ts}{suffix}"), ignorenulls=True)
        .over(w)
        .alias(f"_{right_ts}{suffix}_carried"),
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"{c}{suffix}") for c in right_payload
    ] + [F.col(f"_{right_ts}{suffix}_carried").alias(f"{right_ts}{suffix}")]
    return carried.filter(F.col("_side") == 1).select(*out_cols)
