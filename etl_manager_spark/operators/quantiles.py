"""Distributed exact interpolated percentiles for FEW-but-HUGE groups.

Spark's exact ``percentile``/``median`` aggregate buffers every distinct
value of a group in one task's memory (an ObjectHashAggregate counts-map
that is sorted at evaluation). With continuous (e.g. nano-quantized)
values, distinct ≈ rows, so the per-group buffer grows linearly with the
data — a single-executor OOM at 100 TB whenever the group count is small
(per-type / per-label / global statistics), even though the shuffle
shape looks clean. That regime — a handful of groups, each spanning a
large fraction of the table — is exactly where this module applies.

:func:`grouped_exact_percentiles` reproduces the aggregate's answer
bit-for-bit from the DISTINCT value-count table instead:

1. hash-agg to (group, value, count) — the only pass over the fact rows;
2. range-partition on (group, value); per-partition cumulative counts
   via a window PARTITIONED by (partition, group) — no task ever sorts
   more than its own range slice;
3. per-(partition, group) totals are collected (O(partitions + groups)
   rows — the few-groups contract) and prefix-summed on the driver into
   broadcast offsets, giving exact per-group cumulative ranks
   (the ``operators.prefix.ordered_cumsum`` idiom, grouped);
4. each requested percentile needs at most TWO ranks (floor/ceil of the
   0-based position ``p·(n-1)``); a broadcast rank table joins the CDF
   and a conditional-min hash-agg finds the two bracketing values;
5. interpolation replays Spark's ``Percentile.getPercentile`` formula
   exactly — ``(higher - pos)·lower_val + (pos - lower)·higher_val``
   with the ``lower == higher`` and equal-key short-circuits — so
   results are IEEE-identical to the built-in aggregate (and therefore
   to DuckDB's ``quantile_cont``, which the catalog oracles use).

NOT for high-cardinality groups (per-user, per-key): there the driver
offset table is O(groups) and the built-in percentile's per-group buffer
is small anyway — use the plain aggregate or ``percentile_approx``.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_value_cdf(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_partitions: int | None = None,
    max_groups: int = 100_000,
) -> tuple[DataFrame, dict[tuple, int]]:
    """(group…, _qv double, _qc long, _cum long) — distinct-value counts
    with EXACT per-group cumulative counts in value order, plus the
    per-group totals as a driver-side dict (keyed by group tuple).

    Scale shape: one hash-agg over the fact rows, one range shuffle of
    the distinct-value table, a window partitioned by (partition, group)
    so no task sorts beyond its own slice, and an O(partitions + groups)
    driver collect for the offsets (each group's range is contiguous, so
    the totals table has at most partitions + groups rows). Values are
    compared as doubles: exact for integral inputs up to 2^53 — the
    nano-quantized catalog domain — and for native float/double columns.
    """
    spark = df.sparkSession
    parts = n_partitions or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    vc = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, F.col(value_col).cast("double").alias("_qv"))
        .agg(F.count(F.lit(1)).cast("long").alias("_qc"))
    )
    base = (
        vc.repartitionByRange(parts, *gcols, "_qv")
        .withColumn("_qp", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = base.groupBy("_qp", *gcols).agg(
        F.sum("_qc").cast("long").alias("_qn")
    )
    # the few-groups contract, enforced by bounding the collect itself
    # (no extra job, driver memory capped even when violated): totals has
    # at most partitions + groups rows, so anything past the cap means
    # too many groups — offsets and the rank table are driver-side
    # O(groups); at high group cardinality use the plain partitioned
    # window/aggregate instead (each group is small there, so the
    # builtin buffer is fine too)
    cap = max_groups + parts
    rows = totals.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"grouped percentiles: more than ~{max_groups} groups "
            f"(totals exceeded {cap} rows) — this operator is for FEW "
            "huge groups (driver offsets are O(groups)); with many "
            "small groups the built-in percentile/percentile_approx "
            "per group is the right shape"
        )
    per_group: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for r in rows:
        gk = tuple(r[g] for g in gcols)
        if any(v is None for v in gk):
            # the offset/rank attachment joins are equi-joins, which would
            # silently DROP a null group where groupBy+percentile keeps it
            # — refuse loudly rather than diverge from the aggregate
            raise ValueError(
                f"grouped percentiles: null group key {dict(zip(gcols, gk))} "
                "— coalesce or filter null group keys before calling"
            )
        per_group[gk].append((r["_qp"], r["_qn"]))
    off_rows, n_by_group = [], {}
    for gk, lst in per_group.items():
        acc = 0
        for p, n in sorted(lst):
            off_rows.append((p, *gk, acc))
            acc += n
        n_by_group[gk] = acc
    gfields = base.select(*gcols).schema.fields
    off_schema = T.StructType(
        [T.StructField("_qp", T.IntegerType(), False)]
        + list(gfields)
        + [T.StructField("_off", T.LongType(), False)]
    )
    off = spark.createDataFrame(off_rows, off_schema)
    local_w = (
        Window.partitionBy("_qp", *gcols)
        .orderBy("_qv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = (
        base.join(F.broadcast(off), ["_qp", *gcols])
        .withColumn(
            "_cum", (F.sum("_qc").over(local_w) + F.col("_off")).cast("long")
        )
        .drop("_qp", "_off")
    )
    return cdf, n_by_group


def grouped_exact_percentiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: dict[str, float],
    count_name: str | None = None,
    n_partitions: int | None = None,
    max_groups: int = 100_000,
) -> DataFrame:
    """One row per group with a DOUBLE column per requested percentile
    (``percentiles`` maps output column name → fraction in [0, 1]),
    bit-identical to ``F.expr(f"percentile({value_col}, p)")`` per group
    — but with memory bounded by the range-partition slice instead of
    the group size. Optional ``count_name`` adds the per-group row count
    (exact, from the same pass). See the module docstring for the scale
    contract (few-but-huge groups)."""
    gcols = list(group_cols)
    names = list(percentiles)
    cdf, n_by_group = grouped_value_cdf(
        df, gcols, value_col, n_partitions, max_groups
    )
    spark = df.sparkSession

    # rank plan: for each (group, percentile), the two 1-based cum ranks
    # bracketing the 0-based position p·(n-1), plus Spark's interpolation
    # weights computed driver-side in the same double arithmetic
    rank_rows = []
    for gk, n in n_by_group.items():
        for i, name in enumerate(names):
            pos = percentiles[name] * (n - 1)
            lo0, hi0 = math.floor(pos), math.ceil(pos)
            rank_rows.append(
                (*gk, i, int(lo0) + 1, int(hi0) + 1,
                 float(hi0 - pos), float(pos - lo0))
            )
    gfields = cdf.select(*gcols).schema.fields
    rank_schema = T.StructType(
        list(gfields)
        + [
            T.StructField("_qi", T.IntegerType(), False),
            T.StructField("_klo", T.LongType(), False),
            T.StructField("_khi", T.LongType(), False),
            T.StructField("_wlo", T.DoubleType(), False),
            T.StructField("_whi", T.DoubleType(), False),
        ]
    )
    ranks = spark.createDataFrame(rank_rows, rank_schema)
    brackets = (
        cdf.join(F.broadcast(ranks), gcols)
        .groupBy(*gcols, "_qi")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_klo"), F.col("_qv"))).alias("_lov"),
            F.min(F.when(F.col("_cum") >= F.col("_khi"), F.col("_qv"))).alias("_hiv"),
        )
        .join(F.broadcast(ranks), [*gcols, "_qi"])
    )
    # Percentile.getPercentile replay: return lower when the two ranks
    # coincide OR both ranks land on the same key; else interpolate with
    # the exact (higher - pos) / (pos - lower) weights
    val = (
        F.when(F.col("_klo") == F.col("_khi"), F.col("_lov"))
        .when(F.col("_lov") == F.col("_hiv"), F.col("_lov"))
        .otherwise(
            F.col("_wlo") * F.col("_lov") + F.col("_whi") * F.col("_hiv")
        )
    )
    wide = brackets.select(*gcols, "_qi", val.alias("_val")).groupBy(*gcols).agg(
        *[
            F.min(F.when(F.col("_qi") == i, F.col("_val"))).alias(name)
            for i, name in enumerate(names)
        ]
    )
    if count_name is not None:
        n_schema = T.StructType(
            list(gfields) + [T.StructField(count_name, T.LongType(), False)]
        )
        n_df = spark.createDataFrame(
            [(*gk, n) for gk, n in n_by_group.items()], n_schema
        )
        wide = wide.join(F.broadcast(n_df), gcols)
    return wide
