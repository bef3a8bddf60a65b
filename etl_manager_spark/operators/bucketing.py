"""Bucketed (pre-shuffled) tables for co-located joins.

The 100 TB play: a fact table joined repeatedly on the same key should be
written ONCE bucketed by that key. Spark's bucketed scan then satisfies
the join's hash-partitioning requirement straight off disk — no Exchange
on either side, which at scale removes the dominant cost of every
subsequent join/aggregation on that key. (The reference delegates physical
layout entirely to Hive partitioning; bucketing is the Spark-native
complement for high-cardinality keys where directory partitioning would
explode — reference meta.py:166-176 covers only the directory case.)

Bucket pruning: equality predicates on the bucket column scan only the
matching bucket files. Sorted buckets additionally enable merge-join
without a sort step.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: "DataFrame",
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.

    ``num_buckets`` should be sized so one bucket ≈ one task's worth of
    data at full scale (e.g. 100 TB / 256 MB ≈ 400k → cap by cluster
    parallelism; buckets too few = skewed tasks, too many = tiny files).

    When ``sort_cols`` is given, the frame is first repartitioned by the
    bucket columns into ``num_buckets`` partitions so each bucket is
    written as ONE file: Spark's bucketed scan only reports its
    outputOrdering when every bucket has at most one file, so a
    many-partition upstream would write P files per bucket and
    downstream merge-joins would silently re-insert the Sort the
    sortBy was paid to avoid. Without sort_cols the repartition is
    skipped — multi-file buckets still satisfy hash-partitioning."""
    if sort_cols:
        df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def _bucket_spec(spark: "SparkSession", table: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_cols) from the catalog, (0, []) if unbucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    n, cols = 0, []
    for r in rows:
        if r["col_name"] == "Num Buckets":
            n = int(r["data_type"])
        elif r["col_name"] == "Bucket Columns":
            cols = [
                c.strip(" `")
                for c in r["data_type"].strip("[]").split(",")
                if c.strip(" `")
            ]
    return n, cols


def bucketed_tables_join(
    spark: "SparkSession",
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> "DataFrame":
    """Join two same-bucketed catalog tables on their bucket key with the
    no-Exchange contract ENFORCED: both sides must be bucketed, with the
    same bucket count, on exactly the join columns, and bucketed scans
    must be enabled in the session — otherwise this raises instead of
    silently planning the full shuffle the function exists to avoid.
    (Verify the resulting plan any time with
    ``plans.plan_report(df).shuffle_exchanges == 0``.)"""
    ln, lcols = _bucket_spec(spark, left_table)
    rn, rcols = _bucket_spec(spark, right_table)
    key = sorted(str(c) for c in on)
    problems = []
    if ln == 0 or rn == 0:
        problems.append(
            f"not bucketed: {left_table if ln == 0 else ''} "
            f"{right_table if rn == 0 else ''}".strip()
        )
    elif ln != rn:
        problems.append(f"bucket counts differ ({ln} vs {rn})")
    if ln and sorted(lcols) != key:
        problems.append(f"{left_table} bucketed on {lcols}, join on {key}")
    if rn and sorted(rcols) != key:
        problems.append(f"{right_table} bucketed on {rcols}, join on {key}")
    if spark.conf.get("spark.sql.sources.bucketing.enabled", "true") != "true":
        problems.append("spark.sql.sources.bucketing.enabled is false")
    if problems:
        raise ValueError(
            "bucketed_tables_join would silently shuffle: "
            + "; ".join(problems)
        )
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
