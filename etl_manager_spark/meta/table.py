"""TableMeta — engine-agnostic table metadata, executed natively on Spark.

Re-implements the capability surface of the reference's ``TableMeta``
(``/root/reference/etl_manager/meta.py:99-643``): JSON-shaped metadata with
ordered columns, agnostic types, Hive-style partitions (always forced to the
end of the column list, ``meta.py:166-176``), declared-but-unenforced
constraints (enum/pattern/nullable — ``README.md:168``), a primary-key
declaration, per-column sensitivity/redaction, and per-format IO options.

Execution differences from the reference (by design):

* DDL targets Spark's catalog (``CREATE TABLE ... USING <fmt> ... LOCATION``)
  instead of a Glue ``TableInput`` dict (``meta.py:432-481``).
* ``refresh_partitions`` is a synchronous ``MSCK REPAIR TABLE`` in-session
  (``meta.py:574-643`` needed an Athena poll loop).
* Constraint *enforcement* is available (optional) via
  :mod:`etl_manager_spark.validation` — the reference never enforces.
"""

from __future__ import annotations

import copy
import json
import re
from typing import TYPE_CHECKING, Any, Iterable

from etl_manager_spark.meta.types import (
    AgnosticTypeError,
    assert_agnostic_type,
    columns_to_struct_type,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql.types import StructType

# Name legality mirrors the reference's validators (utils.py:82-94): lowercase
# alphanumeric + underscore for identifiers; locations additionally allow "/"
# and "-"; no leading/trailing slash.
_NAME_RE = re.compile(r"^[a-z0-9_]+$")
_LOCATION_RE = re.compile(r"^[a-z0-9_\-]+(/[a-z0-9_\-]+)*/?$")

SENSITIVITY_VALUES = ("personal_data", "special_category_data")

SUPPORTED_FORMATS = (
    "avro",
    "csv",
    "csv_quoted_nodate",
    "regex",
    "fixedwidth",  # beyond reference: positional line-scan (readers.py)
    "orc",
    "par",  # vestigial alias for parquet kept for metadata compat
    "parquet",
    "json",
)

_OPTIONAL_COLUMN_PROPS = ("pattern", "enum", "nullable", "sensitivity", "redacted")


class MetadataError(ValueError):
    """Invalid metadata (construction-time failure)."""


class MetaColumnTypeMismatch(MetadataError):
    """Same-named columns disagree on type across a database (meta.py:86-87)."""


def _validate_name(name: str, what: str) -> None:
    if not isinstance(name, str) or not _NAME_RE.match(name):
        raise MetadataError(
            f"{what} {name!r} must be lowercase alphanumeric/underscore"
        )


def _validate_column_properties(col: dict) -> None:
    """Property value-type checks (reference utils.py:97-121)."""
    if "pattern" in col and not isinstance(col["pattern"], str):
        raise MetadataError(f"column {col.get('name')}: pattern must be a string")
    if "enum" in col and not isinstance(col["enum"], list):
        raise MetadataError(f"column {col.get('name')}: enum must be a list")
    if "nullable" in col and not isinstance(col["nullable"], bool):
        raise MetadataError(f"column {col.get('name')}: nullable must be a bool")
    if "redacted" in col and not isinstance(col["redacted"], bool):
        raise MetadataError(f"column {col.get('name')}: redacted must be a bool")
    if "sensitivity" in col:
        if col["sensitivity"] not in SENSITIVITY_VALUES:
            raise MetadataError(
                f"column {col.get('name')}: sensitivity must be one of "
                f"{SENSITIVITY_VALUES}"
            )


class TableMeta:
    """Declared metadata for one table.

    Parameters mirror the reference's agnostic JSON shape
    (``specs/table_schema.json``): ``name``, ``description``,
    ``data_format``, ``location`` (folder relative to the database base
    path), ordered ``columns`` (list of dicts with at least name/type),
    optional ``partitions`` (always reordered to the end), optional
    ``primary_key``, optional ``format_options`` (per-table reader/writer
    option overrides — the Spark-native analogue of ``glue_specific``).
    """

    def __init__(
        self,
        name: str,
        location: str,
        columns: list[dict],
        data_format: str = "parquet",
        description: str = "",
        partitions: list[str] | None = None,
        primary_key: list[str] | None = None,
        format_options: dict[str, Any] | None = None,
        database=None,
    ):
        _validate_name(name, "table name")
        self.name = name
        self.description = description
        if data_format not in SUPPORTED_FORMATS:
            raise MetadataError(
                f"data_format {data_format!r} not in {SUPPORTED_FORMATS}"
            )
        self.data_format = "parquet" if data_format == "par" else data_format
        if not _LOCATION_RE.match(location):
            raise MetadataError(f"illegal table location {location!r}")
        self.location = location.rstrip("/")
        self.format_options = dict(format_options or {})
        self.database = database

        self._columns: list[dict] = []
        self._partitions: list[str] = []
        self._primary_key: list[str] = []
        self.columns = columns
        if partitions:
            self.partitions = partitions
        if primary_key:
            self.primary_key = primary_key

    # ------------------------------------------------------------------ #
    # columns

    @property
    def columns(self) -> list[dict]:
        return self._columns

    @columns.setter
    def columns(self, columns: list[dict]) -> None:
        seen: set[str] = set()
        validated = []
        for col in columns:
            if "name" not in col or "type" not in col:
                raise MetadataError(f"column dict missing name/type: {col}")
            _validate_name(col["name"], "column name")
            if col["name"] in seen:
                raise MetadataError(f"duplicate column {col['name']!r}")
            seen.add(col["name"])
            try:
                assert_agnostic_type(col["type"])
            except AgnosticTypeError as exc:
                raise MetadataError(str(exc)) from exc
            _validate_column_properties(col)
            validated.append(copy.deepcopy(col))
        # reconcile BEFORE mutating: a new column list that drops a
        # declared partition/primary-key column would otherwise raise a
        # raw KeyError from the partition reorder with _columns already
        # replaced and _partitions still pointing at the vanished column
        new_names = {c["name"] for c in validated}
        gone_parts = [p for p in self._partitions if p not in new_names]
        if gone_parts:
            raise MetadataError(
                f"new column list drops declared partition column(s) "
                f"{gone_parts} — clear or update .partitions first"
            )
        gone_pk = [k for k in self._primary_key if k not in new_names]
        if gone_pk:
            raise MetadataError(
                f"new column list drops primary-key column(s) {gone_pk} "
                "— clear or update .primary_key first"
            )
        self._columns = validated
        self._reorder_partitions_last()

    @property
    def column_names(self) -> list[str]:
        return [c["name"] for c in self._columns]

    def add_column(
        self,
        name: str,
        type: str,  # noqa: A002 - mirrors reference signature meta.py:248
        description: str = "",
        pattern: str | None = None,
        enum: list | None = None,
        nullable: bool | None = None,
        sensitivity: str | None = None,
        redacted: bool | None = None,
    ) -> None:
        """Append a column (reference ``meta.py:248-288``); partitions are
        re-sorted to the tail afterwards."""
        col: dict[str, Any] = {"name": name, "type": type, "description": description}
        for key, val in (
            ("pattern", pattern),
            ("enum", enum),
            ("nullable", nullable),
            ("sensitivity", sensitivity),
            ("redacted", redacted),
        ):
            if val is not None:
                col[key] = val
        self.columns = self._columns + [col]

    def remove_column(self, column_name: str) -> None:
        """Drop a column and cascade out of partitions/primary key
        (reference ``meta.py:238-246``)."""
        if column_name not in self.column_names:
            raise MetadataError(f"no such column {column_name!r}")
        self._columns = [c for c in self._columns if c["name"] != column_name]
        self._partitions = [p for p in self._partitions if p != column_name]
        self._primary_key = [k for k in self._primary_key if k != column_name]

    def update_column(self, column_name: str, **kwargs: Any) -> None:
        """Patch any property of an existing column with full re-validation
        (reference ``meta.py:380-430``)."""
        if column_name not in self.column_names:
            raise MetadataError(f"no such column {column_name!r}")
        updated = []
        for col in self._columns:
            if col["name"] == column_name:
                col = {**col, **{k: v for k, v in kwargs.items() if v is not None}}
                for k, v in kwargs.items():
                    if v is None:
                        col.pop(k, None)
            updated.append(col)
        self.columns = updated

    def reorder_columns(self, column_name_order: list[str]) -> None:
        """Impose an explicit order; partition columns must stay last
        (reference ``meta.py:290-298``)."""
        if sorted(column_name_order) != sorted(self.column_names):
            raise MetadataError(
                "column_name_order must be a permutation of existing columns"
            )
        if self._partitions:
            tail = column_name_order[len(column_name_order) - len(self._partitions):]
            if sorted(tail) != sorted(self._partitions):
                raise MetadataError("partition columns must be ordered last")
        by_name = {c["name"]: c for c in self._columns}
        self._columns = [by_name[n] for n in column_name_order]
        if self._partitions:
            self._partitions = column_name_order[
                len(column_name_order) - len(self._partitions):
            ]

    # ------------------------------------------------------------------ #
    # partitions & primary key

    def _reorder_partitions_last(self) -> None:
        """The Hive convention the reference enforces (``meta.py:166-176``):
        partition columns always occupy the tail of the column list, in
        partition-declaration order."""
        if not self._partitions:
            return
        non_part = [c for c in self._columns if c["name"] not in self._partitions]
        parts = {c["name"]: c for c in self._columns if c["name"] in self._partitions}
        self._columns = non_part + [parts[p] for p in self._partitions]

    @property
    def partitions(self) -> list[str]:
        return self._partitions

    @partitions.setter
    def partitions(self, partitions: list[str]) -> None:
        missing = [p for p in partitions if p not in self.column_names]
        if missing:
            raise MetadataError(f"partition columns not in table: {missing}")
        if len(set(partitions)) != len(partitions):
            # a repeated name would duplicate the column dict in the
            # reorder, corrupting the schema and emitting unparseable DDL
            raise MetadataError(f"duplicate partition columns: {partitions}")
        self._partitions = list(partitions)
        self._reorder_partitions_last()

    @property
    def primary_key(self) -> list[str]:
        return self._primary_key

    @primary_key.setter
    def primary_key(self, primary_key: list[str]) -> None:
        missing = [k for k in primary_key if k not in self.column_names]
        if missing:
            raise MetadataError(f"primary key columns not in table: {missing}")
        self._primary_key = list(primary_key)

    # ------------------------------------------------------------------ #
    # sensitivity (reference meta.py:214-221)

    @property
    def table_sensitivity(self) -> list[str]:
        """Sorted union of column sensitivities."""
        return sorted({c["sensitivity"] for c in self._columns if c.get("sensitivity")})

    @property
    def redacted_columns(self) -> list[str]:
        return [c["name"] for c in self._columns if c.get("redacted")]

    def redact(self, df: "DataFrame", mode: str = "drop") -> "DataFrame":
        """Enforce the declared per-column ``redacted`` flags (reference
        ``specs/table_schema.json:89-92`` — "redacted or removed in
        non-sensitive versions of the table"; the reference only declares
        the flag, enforcement is this engine's job).

        ``mode="drop"`` removes the columns; ``mode="mask"`` keeps the
        schema, replacing string values with ``'[REDACTED]'`` and any
        other type with a typed NULL. Pure projection — no shuffle, and
        dropped columns prune all the way into the scan."""
        cols = set(self.redacted_columns)
        if not cols:
            return df
        if mode == "drop":
            return df.drop(*cols)
        if mode != "mask":
            raise MetadataError(f"redact mode must be 'drop' or 'mask', got {mode!r}")
        from pyspark.sql import functions as F
        from pyspark.sql.types import StringType

        out = []
        for field in df.schema.fields:
            if field.name not in cols:
                out.append(F.col(field.name))
            elif isinstance(field.dataType, StringType):
                out.append(F.lit("[REDACTED]").alias(field.name))
            else:
                out.append(F.lit(None).cast(field.dataType).alias(field.name))
        return df.select(*out)

    # ------------------------------------------------------------------ #
    # Spark schema / DDL

    @property
    def spark_schema(self) -> "StructType":
        """Full declared schema as a Spark ``StructType`` (partitions last)."""
        return columns_to_struct_type(self._columns)

    @property
    def data_schema(self) -> "StructType":
        """Schema of the stored data files — i.e. excluding partition columns,
        which live in directory names (the reference excludes them from Glue
        storage columns the same way, ``meta.py:300-330``)."""
        return columns_to_struct_type(
            [c for c in self._columns if c["name"] not in self._partitions]
        )

    @property
    def full_path(self) -> str:
        """Storage location: ``<database.base_path>/<location>`` (composition
        rule from reference ``meta.py:454-461, 697-702``)."""
        if self.database is None:
            raise MetadataError(f"table {self.name} is not attached to a database")
        return f"{self.database.base_path}/{self.location}"

    def ddl(self, database_name: str | None = None) -> str:
        """``CREATE TABLE`` DDL for Spark SQL (external/unmanaged: USING
        <format> ... LOCATION <path>). The Spark-native equivalent of the
        reference's Glue TableInput generation (``meta.py:432-481``)."""
        from etl_manager_spark.sources.formats import spark_format_and_options

        db = database_name or (self.database.name if self.database else None)
        qualified = f"{db}.{self.name}" if db else self.name
        fmt, options = spark_format_and_options(self.data_format, self.format_options)

        col_lines = ",\n  ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            + ("" if f.nullable else " NOT NULL")
            for f in self.data_schema.fields
        )
        ddl = f"CREATE TABLE {qualified} (\n  {col_lines}\n)\nUSING {fmt}"
        if options:
            # escape quotes like the COMMENT below — a quote/sep/escape
            # option value containing ' rendered unparseable SQL
            opts = ", ".join(
                "`{}` '{}'".format(k, str(v).replace("'", "\\'"))
                for k, v in sorted(options.items())
            )
            ddl += f"\nOPTIONS ({opts})"
        if self._partitions:
            part_lines = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}"
                for f in self.spark_schema.fields
                if f.name in self._partitions
            )
            ddl += f"\nPARTITIONED BY ({part_lines})"
        if self.description:
            escaped = self.description.replace("'", "\\'")
            ddl += f"\nCOMMENT '{escaped}'"
        ddl += f"\nLOCATION '{self.full_path}'"
        return ddl

    # ------------------------------------------------------------------ #
    # Spark execution (read / write / register)

    def read(
        self,
        spark: "SparkSession",
        path: str | None = None,
        redact: str | None = None,
    ) -> "DataFrame":
        """Read the table's data with the declared schema applied.

        ``redact="drop"`` / ``"mask"`` additionally enforces the declared
        ``redacted`` column flags (see :meth:`redact`) — the non-sensitive
        view of the table; default ``None`` reads everything."""
        from etl_manager_spark.sources.readers import read_table

        df = read_table(spark, self, path or self.full_path)
        if redact is not None:
            df = self.redact(df, mode=redact)
        return df

    def write(self, df: "DataFrame", path: str | None = None, mode: str = "error") -> None:
        from etl_manager_spark.sources.writers import write_table

        write_table(df, self, path or self.full_path, mode=mode)

    def create_on_catalog(self, spark: "SparkSession", database_name: str | None = None) -> None:
        spark.sql(self.ddl(database_name))

    def refresh_partitions(self, spark: "SparkSession", database_name: str | None = None) -> None:
        """Discover on-disk Hive partitions. Reference ``meta.py:574-643``
        runs this through Athena with a poll loop; Spark executes it
        synchronously in-session."""
        db = database_name or (self.database.name if self.database else None)
        qualified = f"{db}.{self.name}" if db else self.name
        spark.sql(f"MSCK REPAIR TABLE {qualified}")

    # ------------------------------------------------------------------ #
    # serialization (reference meta.py:483-505) & docs (meta.py:507-572)

    def to_dict(self) -> dict:
        out: dict[str, Any] = {
            "name": self.name,
            "description": self.description,
            "data_format": self.data_format,
            "location": self.location,
            "columns": copy.deepcopy(self._columns),
        }
        if self._partitions:
            out["partitions"] = list(self._partitions)
        if self._primary_key:
            out["primary_key"] = list(self._primary_key)
        if self.format_options:
            out["format_options"] = dict(self.format_options)
        return out

    def write_to_json(self, filepath: str) -> None:
        with open(filepath, "w") as f:
            json.dump(self.to_dict(), f, indent=4)
            f.write("\n")

    def generate_markdown_doc(self, filepath: str | None = None) -> str:
        """Human-readable table doc (reference ``meta.py:507-572``)."""
        lines = [f"# {self.name}", ""]
        if self.description:
            lines += [self.description, ""]
        lines += [
            f"- **format**: {self.data_format}",
            f"- **location**: {self.location}",
        ]
        if self._partitions:
            lines.append(f"- **partitions**: {', '.join(self._partitions)}")
        if self._primary_key:
            lines.append(f"- **primary key**: {', '.join(self._primary_key)}")
        if self.table_sensitivity:
            lines.append(f"- **sensitivity**: {', '.join(self.table_sensitivity)}")
        lines += ["", "| column | type | description | properties |", "|---|---|---|---|"]
        for col in self._columns:
            props = []
            for key in _OPTIONAL_COLUMN_PROPS:
                if key in col:
                    props.append(f"{key}={col[key]}")
            if col["name"] in self._partitions:
                props.append("partition")
            lines.append(
                f"| {col['name']} | {col['type']} | {col.get('description', '')} "
                f"| {'; '.join(props)} |"
            )
        doc = "\n".join(lines) + "\n"
        if filepath:
            with open(filepath, "w") as f:
                f.write(doc)
        return doc

    def __repr__(self) -> str:  # pragma: no cover
        return (
            f"TableMeta(name={self.name!r}, format={self.data_format!r}, "
            f"columns={self.column_names})"
        )
