"""Schema-enforced readers for every reference format (SURVEY §2.B).

Scale notes (100 TB design): all readers return lazy DataFrames so Catalyst
gets predicate pushdown + column pruning on columnar formats; partitioned
tables are read via their base path so partition pruning applies; the
regex reader stays a single narrow `text` scan + JVM-side `regexp_extract`
projection (whole-stage codegen, no Python in the row path).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_manager_spark.sources.formats import spark_format_and_options

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

    from etl_manager_spark.meta.table import TableMeta


def read_table(spark: "SparkSession", table: "TableMeta", path: str) -> "DataFrame":
    """Read ``path`` per the table's declared format + schema.

    Semantics per format (matching the reference's SerDe behavior):

    * ``csv`` — headerless; the declared schema applies **positionally**
      (reference ``README.md:116``): column order in metadata must equal
      physical order.
    * ``csv_quoted_nodate`` — OpenCSVSerDe parity: read every field as
      string first, then cast to the declared types (Athena's OpenCSVSerde
      reads all-string; ``specs/csv_quoted_nodate_specific.json:6-11``).
    * ``json`` — JSON-lines, by-name field mapping with declared schema.
    * ``parquet``/``orc``/``avro`` — native columnar readers, by-name.
    * ``regex`` — ``spark.read.text`` + one ``regexp_extract`` per column
      (group i+1), the Spark-native RegexSerDe
      (``specs/regex_specific.json:5-11``).
    * ``fixedwidth`` — ``spark.read.text`` + positional ``substring``
      slices (space-padded fields trimmed before the declared-type cast);
      the legacy-layout sibling of ``regex``, scan-only like it.

    Declared partition columns are recovered from Hive-style directory names
    by Spark's partition discovery and cast to their declared types.
    """
    fmt, options = spark_format_and_options(table.data_format, table.format_options)
    data_schema = table.data_schema

    if table.data_format == "regex":
        pattern = options.get("input.regex", "(.*)")
        df = spark.read.text(path)
        projections = [
            F.regexp_extract(F.col("value"), pattern, i + 1)
            .cast(field.dataType)
            .alias(field.name)
            for i, field in enumerate(data_schema.fields)
        ]
        return df.select(*projections)

    if table.data_format == "fixedwidth":
        # widths are CHARACTER counts (F.substring slices decoded
        # characters) — see formats.py; byte-offset layouts with
        # multibyte text are out of scope for this format.
        raw = options.get("widths", "")
        widths = (
            [int(w) for w in str(raw).split(",") if str(w).strip()]
            if not isinstance(raw, (list, tuple))
            else [int(w) for w in raw]
        )
        if len(widths) != len(data_schema.fields):
            raise ValueError(
                f"fixedwidth needs one width per declared column "
                f"({len(data_schema.fields)}), got {widths!r}"
            )
        df = spark.read.text(path)
        start, projections = 1, []
        for w, field in zip(widths, data_schema.fields):
            projections.append(
                F.trim(F.substring(F.col("value"), start, w))
                .cast(field.dataType)
                .alias(field.name)
            )
            start += w
        return df.select(*projections)

    if table.data_format == "csv_quoted_nodate":
        # OpenCSVSerDe parity: all-string read, then cast pass.
        string_schema = T.StructType(
            [T.StructField(f.name, T.StringType(), True) for f in data_schema.fields]
        )
        df = spark.read.options(**options).schema(string_schema).csv(path)
        return df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in data_schema.fields]
        )

    reader = spark.read.options(**options)
    if table.data_format in ("csv", "json"):
        reader = reader.schema(data_schema)
    df = reader.format(fmt).load(path)

    # Recovered partition columns (directory-derived) arrive as strings or
    # inferred types; align them to the declared schema.
    full = table.spark_schema
    for pcol in table.partitions:
        if pcol in df.columns:
            df = df.withColumn(pcol, F.col(pcol).cast(full[pcol].dataType))

    # By-name formats may return columns in file order; impose declared order
    # (and prune extras) so downstream positional consumers are stable.
    present = [f.name for f in full.fields if f.name in df.columns]
    return df.select(*present)
