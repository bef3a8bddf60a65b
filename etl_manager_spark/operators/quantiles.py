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

1. hash-agg to (group, value, count) — the only pass over the fact rows.
   Group keys ride in a STRUCT so null group keys group and join
   null-safely, exactly like ``groupBy`` treats them;
2. range-partition on (group, value); per-partition cumulative counts
   via a window PARTITIONED by (partition, group) — no task ever sorts
   more than its own range slice;
3. per-(partition, group) totals are collected (O(partitions + groups)
   rows, LIMIT-bounded by ``max_groups`` — the few-groups contract) and
   prefix-summed on the driver into broadcast offsets, giving exact
   per-group cumulative ranks (the ``operators.prefix.ordered_cumsum``
   idiom, grouped);
4. each requested percentile needs at most TWO ranks (floor/ceil of the
   0-based position ``p·(n-1)``); a broadcast rank table joins the CDF
   and a conditional-min hash-agg finds the two bracketing values;
5. interpolation replays Spark's ``Percentile.getPercentile`` formula
   exactly — ``(higher - pos)·lower_val + (pos - lower)·higher_val``
   with the ``lower == higher`` and equal-key short-circuits — so
   results are IEEE-identical to the built-in aggregate (and therefore
   to DuckDB's ``quantile_cont``, which the catalog oracles use).

Null semantics match the builtin: null VALUES are ignored for the
percentile but counted by ``count_name`` (a true COUNT(*)); a group
whose values are ALL null still emits its row, with NULL percentiles;
null GROUP KEYS form their own group.

NOT for high-cardinality groups (per-user, per-key): there the driver
offset table is O(groups) — enforced by ``max_groups`` — and the
built-in percentile's per-group buffer is small anyway; use the plain
aggregate or ``percentile_approx``.
"""

from __future__ import annotations

import math
import threading
from collections import defaultdict

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_GK = "_qg"  # struct-wrapped group key: null-safe in groupBy AND joins

_NAN = float("nan")  # one shared NaN object — see _canon_key

# spark.sql.limit.initialNumPartitions is session-global: the pinned
# value must not leak into a concurrent query's LIMIT, and two CDF calls
# racing the set/restore could restore each other's "previous" value.
_LIMIT_CONF_LOCK = threading.Lock()


def _canon_key(row) -> tuple:
    """Group-key Row → dict key. Spark normalizes NaN in groupBy/join
    (every NaN is the same group), but CPython dicts match NaN keys by
    object IDENTITY (NaN != NaN), so each collected row's fresh NaN
    object would open a NEW dict entry — a NaN group spanning several
    range partitions then gets per-partition offsets that never merge:
    wrong cumulative ranks and duplicated output rows. Pinning every NaN
    to one shared object makes the dicts agree with Spark's grouping."""
    return tuple(
        _NAN if isinstance(v, float) and math.isnan(v) else v for v in row
    )


def grouped_value_cdf(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    n_partitions: int | None = None,
    max_groups: int = 100_000,
) -> tuple[DataFrame, dict[tuple, int], dict[tuple, int]]:
    """(_qg struct, _qv double, _qc long, _cum long) — distinct-value
    counts with EXACT per-group cumulative counts in value order, plus
    two driver-side dicts keyed by group tuple: non-null value count
    (the percentile N) and total row count (COUNT(*)). Groups whose
    values are all null appear in the dicts (n=0) but have no CDF rows.

    Scale shape: one hash-agg over the fact rows, one range shuffle of
    the distinct-value table, a window partitioned by (partition, group)
    so no task sorts beyond its own slice, and an O(partitions + groups)
    LIMIT-bounded driver collect for the offsets (each group's range is
    contiguous, so the totals table has at most partitions + groups
    rows). Values are compared as doubles: exact for integral inputs up
    to 2^53 — the nano-quantized catalog domain — and for native
    float/double columns.
    """
    spark = df.sparkSession
    parts = n_partitions or spark.sparkContext.defaultParallelism
    gcols = list(group_cols)
    vc = df.groupBy(
        F.struct(*gcols).alias(_GK), F.col(value_col).cast("double").alias("_qv")
    ).agg(F.count(F.lit(1)).cast("long").alias("_qc"))
    # null rows ride the range shuffle and are split off AFTER the
    # checkpoint (an optimizer barrier), for two reasons: (a) filtering
    # vc on _qv lets Catalyst push isNotNull(<derived value expr>) below
    # the aggregate — even into an upstream join's condition, where an
    # ANSI-throwing expression (x/y guarded by the join predicate) is
    # then evaluated on rows its guard excluded (theil_sen's pairwise
    # slopes hit exactly this: isnotnull(a/b) reordered before a<b);
    # (b) both branches reading one materialization means ONE pass over
    # the fact rows instead of re-running the hash-agg for the null side.
    base_all = (
        vc.repartitionByRange(parts, _GK, "_qv")
        .withColumn("_qp", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    base = base_all.filter(F.col("_qv").isNotNull())
    # ONE bounded collect serves both the per-partition offsets and the
    # null-side counts (round 9: this was two separate jobs against the
    # checkpoint; fusing them saves a job per CDF call across the whole
    # median/MAD/winsorize/conformal family). The few-groups contract is
    # enforced by bounding the collect itself (no extra job, driver
    # memory capped even when violated): the non-null slice has at most
    # partitions + groups rows (each group's range is contiguous) and
    # the null slice at most one row per group (vc aggregates per
    # (group, value), so each group has a single NULL-value row, landing
    # in exactly one range partition) — anything
    # past the caps means too many groups; offsets and the rank table
    # are driver-side O(groups); at high group cardinality use the plain
    # partitioned window/aggregate instead (each group is small there,
    # so the builtin buffer is fine too)
    cap = max_groups + parts
    bounded = (
        base_all.groupBy("_qp", _GK, F.col("_qv").isNull().alias("_qvnull"))
        .agg(F.sum("_qc").cast("long").alias("_qn"))
        .limit(cap + max_groups + 2)
    )
    # CollectLimit executes incrementally (1 partition, then scaleUpFactor
    # more, ...) — on a contract-respecting input the first probe job
    # never satisfies this large limit, so the bound costs 2-3 extra jobs.
    # Pinning initialNumPartitions to the partition count keeps the bound
    # AND makes it one job; restore is safe here because collect() is
    # eager (unlike the lazy-DataFrame conf in workloads/relational.py).
    with _LIMIT_CONF_LOCK:
        try:
            prev_init = spark.conf.get("spark.sql.limit.initialNumPartitions")
        except Exception:  # noqa: BLE001 - conf unset (it has no default)
            prev_init = None
        try:
            spark.conf.set("spark.sql.limit.initialNumPartitions", str(parts))
            all_rows = bounded.collect()
        finally:
            if prev_init is None:
                spark.conf.unset("spark.sql.limit.initialNumPartitions")
            else:
                spark.conf.set(
                    "spark.sql.limit.initialNumPartitions", prev_init
                )
    rows = [r for r in all_rows if not r["_qvnull"]]
    null_rows = [r for r in all_rows if r["_qvnull"]]
    if len(rows) > cap or len(null_rows) > max_groups:
        raise ValueError(
            f"grouped percentiles: more than ~{max_groups} groups — this "
            "operator is for FEW huge groups (driver offsets are "
            "O(groups)); with many small groups the built-in "
            "percentile/percentile_approx per group is the right shape"
        )
    per_group: dict[tuple, list[tuple[int, int]]] = defaultdict(list)
    for r in rows:
        per_group[_canon_key(r[_GK])].append((r["_qp"], r["_qn"]))
    off_rows, n_by_group, rows_by_group = [], {}, {}
    for gk, lst in per_group.items():
        acc = 0
        for p, n in sorted(lst):
            off_rows.append((p, gk, acc))
            acc += n
        n_by_group[gk] = acc
        rows_by_group[gk] = acc
    for r in null_rows:
        gk = _canon_key(r[_GK])
        n_by_group.setdefault(gk, 0)
        rows_by_group[gk] = rows_by_group.get(gk, 0) + r["_qn"]
    gk_type = T.StructType(
        [
            T.StructField(f.name, f.dataType, f.nullable)
            for f in df.select(*gcols).schema.fields
        ]
    )
    off_schema = T.StructType(
        [
            T.StructField("_qp", T.IntegerType(), False),
            T.StructField(_GK, gk_type, False),
            T.StructField("_off", T.LongType(), False),
        ]
    )
    off = spark.createDataFrame(off_rows, off_schema)
    local_w = (
        Window.partitionBy("_qp", _GK)
        .orderBy("_qv")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cdf = (
        base.join(F.broadcast(off), ["_qp", _GK])
        .withColumn(
            "_cum", (F.sum("_qc").over(local_w) + F.col("_off")).cast("long")
        )
        .drop("_qp", "_off")
    )
    return cdf, n_by_group, rows_by_group


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
    the group size. Optional ``count_name`` adds the per-group TOTAL row
    count (COUNT(*), null values included — matching the count column
    the queries this replaces computed alongside the percentile). See
    the module docstring for the scale contract and null semantics."""
    bad = {k: v for k, v in percentiles.items() if not 0.0 <= float(v) <= 1.0}
    if bad:
        # the builtin percentile() aggregate this claims bit-parity with
        # raises on out-of-range fractions; silently returning NULL (rank
        # beyond every cumulative count) would hide the caller's bug
        raise ValueError(
            f"percentile fractions must be in [0, 1], got {bad!r}"
        )
    gcols = list(group_cols)
    names = list(percentiles)
    cdf, n_by_group, rows_by_group = grouped_value_cdf(
        df, gcols, value_col, n_partitions, max_groups
    )
    spark = df.sparkSession
    gk_type = cdf.schema[_GK].dataType

    # rank plan: for each (group, percentile), the two 1-based cum ranks
    # bracketing the 0-based position p·(n-1), plus Spark's interpolation
    # weights computed driver-side in the same double arithmetic. Groups
    # with zero non-null values get no rank rows: their percentiles are
    # NULL (builtin behavior), restored by the left join below.
    rank_rows = []
    for gk, n in n_by_group.items():
        if n == 0:
            continue
        for i, name in enumerate(names):
            pos = percentiles[name] * (n - 1)
            lo0, hi0 = math.floor(pos), math.ceil(pos)
            rank_rows.append(
                (gk, i, int(lo0) + 1, int(hi0) + 1,
                 float(hi0 - pos), float(pos - lo0))
            )
    rank_schema = T.StructType(
        [
            T.StructField(_GK, gk_type, False),
            T.StructField("_qi", T.IntegerType(), False),
            T.StructField("_klo", T.LongType(), False),
            T.StructField("_khi", T.LongType(), False),
            T.StructField("_wlo", T.DoubleType(), False),
            T.StructField("_whi", T.DoubleType(), False),
        ]
    )
    ranks = spark.createDataFrame(rank_rows, rank_schema)
    brackets = (
        cdf.join(F.broadcast(ranks), _GK)
        .groupBy(_GK, "_qi")
        .agg(
            F.min(F.when(F.col("_cum") >= F.col("_klo"), F.col("_qv"))).alias("_lov"),
            F.min(F.when(F.col("_cum") >= F.col("_khi"), F.col("_qv"))).alias("_hiv"),
        )
        .join(F.broadcast(ranks), [_GK, "_qi"])
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
    pivoted = brackets.select(_GK, "_qi", val.alias("_val")).groupBy(_GK).agg(
        *[
            F.min(F.when(F.col("_qi") == i, F.col("_val"))).alias(name)
            for i, name in enumerate(names)
        ]
    )
    # the authoritative group list (includes all-null-value groups) comes
    # from the driver dicts; left join restores NULL percentiles for
    # groups that have no bracket rows
    g_fields = [T.StructField(_GK, gk_type, False)]
    g_rows: list[tuple] = [(gk,) for gk in rows_by_group]
    if count_name is not None:
        g_fields.append(T.StructField(count_name, T.LongType(), False))
        g_rows = [(gk, rows_by_group[gk]) for gk in rows_by_group]
    groups_df = spark.createDataFrame(g_rows, T.StructType(g_fields))
    wide = groups_df.join(F.broadcast(pivoted), _GK, "left")
    return wide.select(
        *[F.col(f"{_GK}.{g}").alias(g) for g in gcols],
        *names,
        *([count_name] if count_name is not None else []),
    )
