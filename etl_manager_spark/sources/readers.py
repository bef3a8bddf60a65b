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


def _serde_cast(col, data_type):
    """SerDe-faithful typed projection for text-derived fields: a
    non-string target NULLs on empty/unparseable text (``try_cast`` —
    Athena's SerDes emit NULL there) instead of throwing under Spark 4's
    default ANSI cast; strings pass through as-is."""
    if isinstance(data_type, T.StringType):
        return col.cast(data_type)
    return F.nullif(col, F.lit("")).try_cast(data_type)


def read_table(spark: "SparkSession", table: "TableMeta", path: str) -> "DataFrame":
    """Read ``path`` per the table's declared format + schema.

    Semantics per format (matching the reference's SerDe behavior):

    * ``csv`` — headerless; the declared schema applies **positionally**
      (reference ``README.md:116``): column order in metadata must equal
      physical order.
    * ``csv_quoted_nodate`` — OpenCSVSerDe parity: read every field as
      string first, then cast to the declared types (Athena's OpenCSVSerde
      reads all-string; ``specs/csv_quoted_nodate_specific.json:6-11``);
      unparseable values become NULL (try_cast), as the SerDe does.
    * ``json`` — JSON-lines, by-name field mapping with declared schema.
    * ``parquet``/``orc``/``avro`` — native columnar readers, by-name,
      then aligned to the DECLARED schema: a declared nullable column
      missing from older files is filled with typed nulls, a missing
      non-nullable column is an error, and present columns are cast to
      their declared types — the read-side mirror of the write path's
      ``conform()`` (without it, schema drift silently leaked file
      schemas to downstream consumers).
    * ``regex`` — ``spark.read.text`` + one ``regexp_extract`` per column
      (group i+1), the Spark-native RegexSerDe
      (``specs/regex_specific.json:5-11``). A line that does NOT match
      the pattern yields a NULL row (SerDe behavior) — regexp_extract
      alone returns '' there, which under ANSI would kill the read
      casting to any non-string type.
    * ``fixedwidth`` — ``spark.read.text`` + positional ``substring``
      slices (space-padded fields trimmed before the declared-type cast);
      the legacy-layout sibling of ``regex``, scan-only like it.

    Declared partition columns are recovered from Hive-style directory
    names by Spark's partition discovery and cast to their declared types
    — for EVERY format (the text-based formats' scans discover partitions
    exactly like the columnar ones; dropping them was a bug).
    """
    from etl_manager_spark.sources.resolve import quoted, resolve_columns

    fmt, options = spark_format_and_options(table.data_format, table.format_options)
    data_schema = table.data_schema

    if table.data_format == "regex":
        pattern = options.get("input.regex", "(.*)")
        # Hive/Athena RegexSerDe uses Matcher.matches() — the pattern must
        # consume the WHOLE line or the row is all-NULL. rlike/
        # regexp_extract are find()-semantics (any substring), which would
        # accept partial matches the SerDe rejects — and extract from the
        # FIRST partial match at that. Anchoring in a non-capturing group
        # preserves the user's group numbering and is a no-op for
        # already-anchored patterns.
        anchored = f"^(?:{pattern})$"
        raw = spark.read.text(path)
        matched = F.col("value").rlike(anchored)
        # Non-participating optional groups: Matcher.group(i) is null in
        # the SerDe, so the column is NULL; Spark's regexp_extract returns
        # '' for both a non-participating group and a participating
        # empty-string match, so '' maps to NULL for EVERY declared type
        # here (string included). Known divergence: a participating group
        # that matched the empty string ((\w*) on an empty field) is ''
        # in Hive but NULL here — regexp_extract cannot distinguish the
        # two, and the non-participating case is the semantically loaded
        # one.
        projections = [
            F.when(
                matched,
                _serde_cast(
                    F.nullif(
                        F.regexp_extract(F.col("value"), anchored, i + 1),
                        F.lit(""),
                    ),
                    field.dataType,
                ),
            )
            .otherwise(F.lit(None).cast(field.dataType))
            .alias(field.name)
            for i, field in enumerate(data_schema.fields)
        ]
        part_cols = [c for c in raw.columns if c != "value"]
        df = raw.select(*projections, *part_cols)

    elif table.data_format == "fixedwidth":
        # widths are CHARACTER counts (F.substring slices decoded
        # characters) — see formats.py; byte-offset layouts with
        # multibyte text are out of scope for this format.
        raw_w = options.get("widths", "")
        widths = (
            [int(w) for w in str(raw_w).split(",") if str(w).strip()]
            if not isinstance(raw_w, (list, tuple))
            else [int(w) for w in raw_w]
        )
        if len(widths) != len(data_schema.fields):
            raise ValueError(
                f"fixedwidth needs one width per declared column "
                f"({len(data_schema.fields)}), got {widths!r}"
            )
        raw = spark.read.text(path)
        start, projections = 1, []
        for w, field in zip(widths, data_schema.fields):
            projections.append(
                _serde_cast(
                    F.trim(F.substring(F.col("value"), start, w)), field.dataType
                ).alias(field.name)
            )
            start += w
        part_cols = [c for c in raw.columns if c != "value"]
        df = raw.select(*projections, *part_cols)

    elif table.data_format == "csv_quoted_nodate":
        # OpenCSVSerDe parity: all-string read, then a try_cast pass.
        string_schema = T.StructType(
            [T.StructField(f.name, T.StringType(), True) for f in data_schema.fields]
        )
        raw = spark.read.options(**options).schema(string_schema).csv(path)
        part_cols = [c for c in raw.columns if c not in string_schema.names]
        df = raw.select(
            *[
                _serde_cast(F.col(f.name), f.dataType).alias(f.name)
                for f in data_schema.fields
            ],
            *part_cols,
        )

    else:
        reader = spark.read.options(**options)
        if table.data_format in ("csv", "json"):
            reader = reader.schema(data_schema)
        df = reader.format(fmt).load(path)
        if table.data_format in ("parquet", "orc", "avro"):
            # declared-schema enforcement (read-side conform): older files
            # may lack newly-declared columns or carry narrower types.
            # Matching is CASE-INSENSITIVE like the write-side conform()
            # and Spark's own resolution — a file column 'ID' satisfies a
            # declared 'id'. (The previous case-sensitive check took the
            # "absent" branch for such a column, and withColumn's
            # case-insensitive resolution then REPLACED the real data with
            # typed nulls — silent data loss on case drift.) Two file
            # columns differing only by case that both target a declared
            # field are ambiguous and refused. Shared resolver with the
            # write side (sources/resolve.py) so the two can't drift.
            declared_names = [f.name for f in data_schema.fields]
            by_lower = resolve_columns(
                df.columns, declared_names, f"read_table({fmt} at {path})"
            )
            declared_lower = {n.lower() for n in declared_names}
            projections = []
            for f in data_schema.fields:
                actual = by_lower.get(f.name.lower())
                if actual is None:
                    if not f.nullable:
                        raise ValueError(
                            f"read_table: declared non-nullable column "
                            f"{f.name!r} is absent from the {fmt} files at "
                            f"{path} — backfill it or declare it nullable"
                        )
                    projections.append(
                        F.lit(None).cast(f.dataType).alias(f.name)
                    )
                else:
                    projections.append(
                        F.col(quoted(actual)).cast(f.dataType).alias(f.name)
                    )
            # keep non-declared columns (recovered partition dirs, extras
            # the final declared-order select prunes) by their own names —
            # backtick-quoted, or an extra column literally named 'a.b'
            # would parse as struct access and break a readable dataset
            passthrough = [
                F.col(quoted(c))
                for c in df.columns
                if c.lower() not in declared_lower
            ]
            df = df.select(*projections, *passthrough)

    # Recovered partition columns (directory-derived) arrive as strings or
    # inferred types — and possibly under case-drifted directory names
    # (DAY=... for a declared 'day'); align name and type to the declared
    # schema, case-insensitively like everything above.
    full = table.spark_schema
    if table.partitions:
        part_lower = resolve_columns(
            df.columns, list(table.partitions), "read_table partitions"
        )
        renames = []
        for pcol in table.partitions:
            actual = part_lower.get(pcol.lower())
            if actual is not None:
                renames.append(
                    F.col(quoted(actual)).cast(full[pcol].dataType).alias(pcol)
                )
        kept_lower = {p.lower() for p in table.partitions}
        others = [
            F.col(quoted(c)) for c in df.columns if c.lower() not in kept_lower
        ]
        df = df.select(*others, *renames)

    # By-name formats may return columns in file order; impose declared order
    # (and prune extras) so downstream positional consumers are stable.
    present = [f.name for f in full.fields if f.name in df.columns]
    return df.select(*present)
