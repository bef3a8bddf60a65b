"""Keyed upsert (MERGE) and SCD2 history — the write-side ETL operators a
Glue-job user of the reference writes by hand inside ``job.py`` (the
reference only stages such jobs, it has no merge primitive; cf.
/root/reference/example/glue_jobs/simple_etl_job/job.py:30-35). Here they
are first-class DataFrame transforms.

Scale design:

* ``merge_upsert`` is one full-outer-join shuffle on the key, plus one
  source-side window shuffle for MERGE's matched-uniqueness check (the
  join hashes null-safe normalized keys, so the window exchange is not
  reusable; ``assume_unique_source=True`` skips it for pre-deduplicated
  sources). No broadcast requirement — both sides may be arbitrarily
  large; with bucketed tables on the key the join side is zero-exchange
  (see operators/bucketing.py). Column-wise COALESCE keeps everything
  in whole-stage codegen.
* ``scd2_from_events`` is ONE shuffle: window over (key ORDER BY ts).
  At 100 TB the state per task is one key-group at a time — no skew
  beyond the hottest key's history length.
* Storage rewrite strategy belongs to the sink, not the operator: pair
  with ``partitionBy`` + dynamic partition overwrite so only partitions
  containing merged keys are rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: list[str],
    delete_col: str | None = None,
    assume_unique_source: bool = False,
) -> DataFrame:
    """SQL MERGE semantics as a batch transform: rows whose key exists in
    ``source`` take the source's non-key columns verbatim — including NULLs,
    so an update CAN null a column out — source-only keys are inserted,
    target-only keys pass through. If ``delete_col`` names a boolean column
    on ``source``, rows with it true are dropped (MERGE ... WHEN MATCHED
    AND <del> THEN DELETE; a delete-flagged source row whose key is absent
    from the target is a no-op, not an insert).

    Source-side presence is detected with a sentinel marker column, not a
    key-NULL test, so NULL join keys (the join is null-safe) get correct
    update/delete semantics. Both relations must share a schema (same
    columns); the result keeps the target's column order.

    MERGE's matched-uniqueness contract is enforced at execution time:
    multiple source rows matching the SAME target row raise "multiple
    source rows matched" (SQL MERGE / Delta behavior) instead of silently
    fanning the target row out. Duplicate source keys that match NO
    target row legally insert, exactly like MERGE's WHEN NOT MATCHED.
    The assert lives in the JOIN CONDITION — join conditions are
    evaluated on every key-matched pair and can never be column-pruned
    away, so the check fires for count()-only consumers too, and it
    never evaluates for unmatched rows. The per-key source count it
    reads costs one source-side window shuffle; callers whose source is
    key-unique by construction (e.g. a CDC batch already reduced with
    row_number()==1 over the same key) pass ``assume_unique_source=True``
    to skip it."""
    cols = target.columns
    expected = set(cols) | ({delete_col} if delete_col else set())
    if set(source.columns) != expected:
        raise ValueError(
            f"merge_upsert: schema mismatch target={cols} source={source.columns}"
        )
    marker = "_merge_s_present"
    count_col = "_merge_key_n"
    for reserved in (marker, count_col):
        if reserved in source.columns or reserved in cols:
            raise ValueError(
                f"merge_upsert: input may not contain {reserved!r}"
            )
    t = target.alias("t")
    s = source.withColumn(marker, F.lit(True))
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in key]
    if not assume_unique_source:
        key_w = Window.partitionBy(*[F.col(k) for k in key])
        s = s.withColumn(count_col, F.count(F.lit(1)).over(key_w))
        dup_msg = F.concat(
            F.lit("merge_upsert: multiple source rows matched key ("),
            F.concat_ws(
                ", ", *[F.col(f"s.{k}").cast("string") for k in key]
            ),
            F.lit(") — deduplicate the source first"),
        )
        cond = cond + [
            F.assert_true(F.col(f"s.{count_col}") <= 1, dup_msg).isNull()
        ]
    s = s.alias("s")
    joined = t.join(s, on=cond, how="full_outer")
    s_present = F.col(f"s.{marker}").isNotNull()
    if delete_col is not None:
        joined = joined.filter(
            ~(s_present & F.coalesce(F.col(f"s.{delete_col}"), F.lit(False)))
        )
    out = [
        F.when(s_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in cols
        if c != delete_col
    ]
    return joined.select(*out)


def scd2_from_events(
    df: DataFrame,
    key: list[str],
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: each row becomes a
    validity interval ``[valid_from, valid_to)`` per key, where
    ``valid_to`` is the next row's timestamp (NULL on the current row,
    which also gets ``is_current = true``).

    ``order_cols`` breaks timestamp ties deterministically — pass an id
    column whenever timestamps can tie."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*key).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )


def table_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot reconciliation: classify every key as ``added`` /
    ``removed`` / ``changed`` / ``unchanged`` between two versions of a
    table — the audit step after any MERGE/backfill, and the generator
    for a CDC event stream out of plain snapshots.

    One full-outer join on the key columns; change detection compares
    ``compare_cols`` (default: all shared non-key columns) with
    null-safe equality (``<=>``), so NULL→value and value→NULL count as
    changes while NULL→NULL does not. The join shuffles both sides on
    the key once — at scale, point both snapshots at the same bucketed
    layout (operators/bucketing.py) and the Exchange disappears.

    Returns key columns + ``diff_status`` string; callers wanting the
    values join back by key on the side the status names."""
    if not keys:
        raise ValueError("table_diff needs at least one key column")
    if compare_cols is None:
        shared = [c for c in before.columns if c in set(after.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    # keys ride in a struct so the full-outer join is NULL-SAFE on key
    # columns too (struct equality treats null fields as equal, like
    # merge_upsert's explicit <=> at line 57): with a plain on=keys join
    # a NULL-keyed row never matches itself and reports as both 'added'
    # AND 'removed'
    b = before.select(
        F.struct(*keys).alias("_td_k"),
        *[F.col(c).alias(f"_b_{c}") for c in compare_cols],
        F.lit(True).alias("_in_b"),
    )
    a = after.select(
        F.struct(*keys).alias("_td_k"),
        *[F.col(c).alias(f"_a_{c}") for c in compare_cols],
        F.lit(True).alias("_in_a"),
    )
    joined = b.join(a, on="_td_k", how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_b_{c}").eqNullSafe(F.col(f"_a_{c}"))
    status = (
        F.when(F.col("_in_b").isNull(), F.lit("added"))
        .when(F.col("_in_a").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *[F.col(f"_td_k.{k}").alias(k) for k in keys],
        status.alias("diff_status"),
    )
