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
    array (1-row aggregate), ``array_sort`` with a comparator over the
    SORT KEYS ONLY for the total order, ``posexplode`` back out;
    rank = position + 1.

    ``sort_keys`` is ``[(col, "asc"|"desc"), …]`` and must be a total
    order. NULL ordering matches the window it replaces: asc → NULLS
    FIRST, desc → NULLS LAST (via an explicit isNull flag field). Desc
    numeric keys are order-reversed per type: integral keys by bitwise
    NOT (monotone reversal with no LONG_MIN negation overflow — ``-col``
    throws ARITHMETIC_OVERFLOW under ANSI), float/double keys by a
    NaN-first flag plus negation (Spark ranks NaN above every double, so
    desc puts NaN FIRST — negation alone would leave NaN last),
    decimal/interval by plain negation (symmetric ranges). Other desc
    types are refused. The comparator never reads the payload struct, so
    non-orderable payload columns (maps) pass through, and key ties
    never silently tiebreak on arbitrary payload fields. ONLY for frames
    already bounded to ~k rows — the whole frame materializes in one
    aggregation buffer."""
    dtypes = dict(df.dtypes)
    keys: list = []
    key_fields: list[str] = []

    def _add(col, name):
        keys.append(col.alias(name))
        key_fields.append(name)

    for i, (c, d) in enumerate(sort_keys):
        col = F.col(c)
        t = dtypes[c]
        if d == "desc":
            # False < True → nulls last (window desc default)
            _add(col.isNull(), f"_n{i}")
            if t in ("tinyint", "smallint", "int", "bigint"):
                _add(F.bitwise_not(col), f"_k{i}")
            elif t in ("float", "double"):
                # NaN ranks ABOVE every number in Spark → desc = NaN first
                _add(F.when(F.isnan(col), 0).otherwise(1), f"_f{i}")
                _add(-col, f"_k{i}")
            elif t.startswith("decimal") or t.endswith("interval"):
                _add(-col, f"_k{i}")
            else:
                raise ValueError(
                    f"rank_bounded: desc key {c!r} has type {t} — only "
                    "numeric/interval desc keys have an order-reversing "
                    "encode; sort asc or pre-encode the column"
                )
        else:
            _add(col, f"_k{i}")

    def _cmp(a, b):
        # ascending null-safe comparison over the encoded key fields,
        # innermost tiebreak outward; the payload field never participates
        expr = F.lit(0)
        for name in reversed(key_fields):
            av, bv = a[name], b[name]
            expr = (
                F.when(av.eqNullSafe(bv), expr)
                .when(av.isNull(), F.lit(-1))  # asc native: NULLS FIRST
                .when(bv.isNull(), F.lit(1))
                .when(av < bv, F.lit(-1))
                .otherwise(F.lit(1))
            )
        return expr

    arr = df.groupBy().agg(
        F.array_sort(
            F.collect_list(
                F.struct(*keys, F.struct(*df.columns).alias("_p"))
            ),
            _cmp,
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
    # operator-prefixed internal names: bare _pid/_lr would silently
    # overwrite (then drop) same-named user columns
    part = df.withColumn("_ptk_pid", F.spark_partition_id())
    order = F.col(value_col).desc() if descending else F.col(value_col).asc()
    w = Window.partitionBy(*group_cols, "_ptk_pid").orderBy(order)
    return (
        part.withColumn("_ptk_lr", F.rank().over(w))
        .filter(F.col("_ptk_lr") <= k)
        .drop("_ptk_pid", "_ptk_lr")
    )
