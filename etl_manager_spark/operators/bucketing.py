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
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_tables_join(
    spark: "SparkSession",
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> "DataFrame":
    """Join two same-bucketed catalog tables on their bucket key. When
    both sides share bucket count and key, the plan contains NO Exchange —
    assert via plans.plan_report(df).shuffle_exchanges == 0."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on), how=how)
