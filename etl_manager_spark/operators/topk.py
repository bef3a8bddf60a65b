"""Grouped top-k — the scalable formulation.

``ORDER BY x LIMIT k`` globally is cheap (Spark's TakeOrderedAndProject —
per-partition heaps + single-driver merge of k·partitions rows). Grouped
top-k uses a rank window; partial aggregation doesn't apply, so the whole
group shuffles — fine when groups are numerous/small (the common case).
For few giant groups, pre-filter with an approximate per-partition top-k
first (``partial_topk_prefilter``) to bound shuffle volume.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group by ``order_by`` (include a unique tiebreak
    column in ``order_by`` for deterministic results)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def rank_bounded(
    df: DataFrame,
    sort_keys: list[tuple[str, str]],
    rank_name: str = "rnk",
) -> DataFrame:
    """1-based global rank for a BOUNDED frame (post-``limit(k)``)
    WITHOUT a Window — ``row_number() OVER (ORDER BY …)`` would plan an
    Exchange SinglePartition even over 10 rows, tripping the
    single-partition-window lint. Instead: collect the k rows into one
    array (1-row aggregate), ``sort_array`` for the total order,
    ``posexplode`` back out; rank = position + 1.

    ``sort_keys`` is ``[(col, "asc"|"desc"), …]`` and must be a total
    order; ``desc`` keys must be numeric (they are negated to ride the
    ascending struct sort). NULL ordering matches the window it
    replaces: asc → NULLS FIRST (the struct sort's native order), desc →
    NULLS LAST via an explicit isNull flag field — a bare negation would
    leave NULL ranked FIRST on desc keys, silently shifting every real
    rank down one. ONLY for frames already bounded to ~k rows — the
    whole frame materializes in one aggregation buffer."""
    keys = []
    for i, (c, d) in enumerate(sort_keys):
        col = F.col(c)
        if d == "desc":
            keys.append(col.isNull().alias(f"_n{i}"))  # False < True → nulls last
            keys.append((-col).alias(f"_k{i}"))
        else:
            keys.append(col.alias(f"_k{i}"))
    arr = df.groupBy().agg(
        F.sort_array(
            F.collect_list(
                F.struct(*keys, F.struct(*df.columns).alias("_p"))
            )
        ).alias("_a")
    )
    return arr.select(F.posexplode("_a").alias("_pos", "_s")).select(
        (F.col("_pos") + 1).cast("int").alias(rank_name),
        F.col("_s._p.*"),
    )


def partial_topk_prefilter(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int,
    descending: bool = True,
) -> DataFrame:
    """Salted two-stage prefilter for grouped top-k over few giant groups:
    rank within (group, input-partition-id) first — the salt spreads a giant
    group over all reducers — keeping the top k VALUES per (group,
    partition). A final :func:`grouped_topk` then ranks only
    ~k·num_partitions rows per group instead of the whole group.

    Uses ``rank()`` (not ``row_number``): value ties at the local k
    boundary ALL survive, so the kept set is a superset of the true
    top-k under ANY downstream tiebreak — a row_number cut would break
    ties arbitrarily per partition and could drop true winners whenever
    the caller's final order tiebreaks differently (nondeterministic
    results on tied values). Heavy ties keep more rows; the prefilter is
    a bound, not the answer."""
    part = df.withColumn("_pid", F.spark_partition_id())
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w = Window.partitionBy(*group_cols, "_pid").orderBy(order)
    return (
        part.withColumn("_lr", F.rank().over(w))
        .filter(F.col("_lr") <= k)
        .drop("_pid", "_lr")
    )
