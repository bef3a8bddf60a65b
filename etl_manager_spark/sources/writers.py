"""Schema-conformed writers (SURVEY §2.B B9).

The reference never writes data itself (its example job calls a bare
``df.write`` — ``example/glue_jobs/simple_etl_job/job.py:35``); here writes
are first-class: conform the DataFrame to the declared schema (order, types,
partitions-last), then write with the declared format + partitioning.

Scale notes: ``partitionBy`` on declared partition columns gives Hive-style
layouts that enable partition pruning downstream; callers control file
sizing with ``df.repartition(n, *cols)`` before write — we deliberately do
not inject a shuffle here.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F

from etl_manager_spark.sources.formats import spark_format_and_options

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

    from etl_manager_spark.meta.table import TableMeta


def conform(df: "DataFrame", table: "TableMeta") -> "DataFrame":
    """Project/cast ``df`` onto the table's declared schema. Missing nullable
    columns become typed nulls; extra columns are dropped; order is the
    declared order (partitions last).

    Column matching is CASE-INSENSITIVE, like Spark's own resolution
    (default spark.sql.caseSensitive=false): a frame carrying 'USER_ID'
    conforms onto a declared 'user_id' instead of being silently
    replaced by a typed-null column (nullable) or refused (non-null) —
    the present column is selected by its actual name and aliased to
    the declared one. Two input columns differing only by case that both
    target a declared field are refused (Spark itself raises
    AMBIGUOUS_REFERENCE for that resolution) rather than silently
    resolved to whichever comes last in df.columns."""
    from etl_manager_spark.sources.resolve import resolve_columns

    by_lower = resolve_columns(
        df.columns,
        [f.name for f in table.spark_schema.fields],
        "conform",
    )
    projections = []
    for field in table.spark_schema.fields:
        actual = by_lower.get(field.name.lower())
        if actual is not None:
            projections.append(
                F.col(actual).cast(field.dataType).alias(field.name)
            )
        elif field.nullable:
            projections.append(F.lit(None).cast(field.dataType).alias(field.name))
        else:
            raise ValueError(
                f"DataFrame is missing non-nullable column {field.name!r}"
            )
    return df.select(*projections)


def write_table(
    df: "DataFrame",
    table: "TableMeta",
    path: str,
    mode: str = "error",
) -> None:
    """Write ``df`` to ``path`` in the table's declared format, partitioned
    by its declared partition columns."""
    fmt, options = spark_format_and_options(table.data_format, table.format_options)
    if table.data_format in ("regex", "fixedwidth"):
        raise ValueError(
            f"{table.data_format} tables are read-only (line-scan formats)"
        )
    conformed = conform(df, table)
    writer = conformed.write.mode(mode).options(**options).format(fmt)
    if table.partitions:
        writer = writer.partitionBy(*table.partitions)
    writer.save(path)


def overwrite_partitions(
    df: "DataFrame",
    table: "TableMeta",
    path: str,
) -> None:
    """Rewrite ONLY the Hive partitions present in ``df``, leaving all other
    partitions untouched (dynamic partition overwrite — the companion to
    ``operators/upsert.merge_upsert`` for incremental backfills: merge the
    changed keys, then rewrite just the partitions they live in).

    Uses ``spark.sql.sources.partitionOverwriteMode=dynamic`` scoped to this
    write and restored afterwards, since the session default (static) would
    instead truncate the whole table root. At 100 TB this is the difference
    between rewriting one day's partition and rewriting the dataset."""
    if not table.partitions:
        raise ValueError(
            "overwrite_partitions requires a partitioned table; "
            "use write_table(..., mode='overwrite') for unpartitioned data"
        )
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # ONE write path: the conf scope is this function's whole job;
        # format resolution, the read-only guard, conform, and the
        # writer chain live in write_table (a second copy had already
        # started to drift and would silently diverge further)
        write_table(df, table, path, mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
