"""DatabaseMeta — a named collection of tables over a shared base path.

Re-implements the reference's ``DatabaseMeta``
(``/root/reference/etl_manager/meta.py:646-916``) against Spark's catalog:
create/update/delete database + tables (``meta.py:755-844``), cross-table
type-alignment checking (``meta.py:878-916``), partition refresh loops
(``meta.py:874-876``), and (gated) data deletion (``meta.py:769-791``).
"""

from __future__ import annotations

import re
import shutil
from typing import TYPE_CHECKING, Iterator
from urllib.parse import urlparse

from etl_manager_spark.meta.table import (
    MetaColumnTypeMismatch,
    MetadataError,
    TableMeta,
    _validate_name,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession

_BUCKET_RE = re.compile(r"^[a-z0-9_\-./:]+$")


class DatabaseMeta:
    """Database-level metadata.

    ``bucket`` keeps the reference's field name (``meta.py:646-665``) but
    accepts any Spark-readable base URI: a bare bucket name (→ ``s3a://``),
    an absolute local path, or a full ``file:/s3a:/hdfs:`` URI — the engine
    is storage-agnostic, Hadoop FileSystem resolves the scheme.
    """

    def __init__(
        self,
        name: str,
        bucket: str,
        base_folder: str = "",
        description: str = "",
    ):
        _validate_name(name, "database name")
        if not _BUCKET_RE.match(bucket.lower()) and not bucket.startswith("/"):
            raise MetadataError(f"illegal bucket/base URI {bucket!r}")
        self.name = name
        self.bucket = bucket.rstrip("/")
        self.base_folder = base_folder.strip("/")
        self.description = description
        self._tables: list[TableMeta] = []

    # ------------------------------------------------------------------ #
    # paths

    @property
    def base_path(self) -> str:
        """``<bucket-uri>[/<base_folder>]`` — composition rule mirroring
        reference ``meta.py:697-702`` with local/URI support."""
        b = self.bucket
        if urlparse(b).scheme in ("", None) and not b.startswith("/"):
            b = f"s3a://{b}"
        return f"{b}/{self.base_folder}" if self.base_folder else b

    # ------------------------------------------------------------------ #
    # table management (reference meta.py:714-753)

    @property
    def tables(self) -> list[TableMeta]:
        return self._tables

    @property
    def table_names(self) -> list[str]:
        return [t.name for t in self._tables]

    def table(self, table_name: str) -> TableMeta:
        for t in self._tables:
            if t.name == table_name:
                return t
        raise MetadataError(f"no table {table_name!r} in database {self.name!r}")

    def add_table(self, table: TableMeta) -> None:
        if table.name in self.table_names:
            raise MetadataError(f"duplicate table {table.name!r}")
        table.database = self
        self._tables.append(table)

    def remove_table(self, table_name: str) -> None:
        t = self.table(table_name)
        t.database = None
        self._tables.remove(t)

    def __iter__(self) -> Iterator[TableMeta]:
        return iter(self._tables)

    # ------------------------------------------------------------------ #
    # cross-table consistency (reference meta.py:878-916)

    def test_column_types_align(self, exclude_tables: list[str] | None = None) -> None:
        """Same-named columns must have identical agnostic types across all
        tables; raises :class:`MetaColumnTypeMismatch` listing offenders."""
        exclude = set(exclude_tables or [])
        seen: dict[str, tuple[str, str]] = {}
        errors: list[str] = []
        for t in self._tables:
            if t.name in exclude:
                continue
            for col in t.columns:
                prior = seen.get(col["name"])
                if prior is None:
                    seen[col["name"]] = (col["type"], t.name)
                elif prior[0] != col["type"]:
                    errors.append(
                        f"column {col['name']!r}: {prior[0]} in table {prior[1]} "
                        f"vs {col['type']} in table {t.name}"
                    )
        if errors:
            raise MetaColumnTypeMismatch("; ".join(errors))

    # ------------------------------------------------------------------ #
    # catalog DDL (reference meta.py:755-844 → Spark catalog)

    def create_database(self, spark: "SparkSession", delete_if_exists: bool = False) -> None:
        """CREATE DATABASE + per-table external DDL (reference
        ``create_glue_database``, ``meta.py:793-810``)."""
        if delete_if_exists:
            self.delete_database(spark)
        escaped = self.description.replace("'", "\\'")
        # deliberately NO LOCATION: Spark's catalog deletes the database
        # directory on DROP DATABASE CASCADE, so pointing it at the data
        # root would make a catalog-only drop destroy external table data.
        # Tables carry their own LOCATIONs (composed from base_path).
        spark.sql(
            f"CREATE DATABASE IF NOT EXISTS {self.name} COMMENT '{escaped}'"
        )
        for t in self._tables:
            t.create_on_catalog(spark, self.name)

    def update_database(
        self,
        spark: "SparkSession",
        update_tables_if_exist: bool = False,
    ) -> None:
        """Upsert semantics (reference ``update_glue_database``,
        ``meta.py:812-844``): create missing tables; replace existing ones
        only when asked."""
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {self.name}")
        # listTables includes session-local TEMP views regardless of the
        # database filter — counting those as existing would silently
        # skip creating the real catalog table whenever a temp view
        # shares its name (register_temp_views creates exactly that)
        existing = {
            t.name
            for t in spark.catalog.listTables(self.name)
            if not t.isTemporary
        }
        for t in self._tables:
            if t.name not in existing:
                t.create_on_catalog(spark, self.name)
            elif update_tables_if_exist:
                spark.sql(f"DROP TABLE IF EXISTS {self.name}.{t.name}")
                t.create_on_catalog(spark, self.name)

    def delete_database(self, spark: "SparkSession") -> None:
        """DROP ... CASCADE, tolerant of absence (reference
        ``meta.py:755-767``). Catalog-only: never touches data files."""
        spark.sql(f"DROP DATABASE IF EXISTS {self.name} CASCADE")

    def delete_data_in_database(self, tables_only: bool = False, i_am_sure: bool = False) -> None:
        """Destructive storage deletion (reference ``meta.py:769-791``),
        gated behind an explicit ``i_am_sure`` flag. Local paths only; for
        object stores wire in the Hadoop FS API instead."""
        if not i_am_sure:
            raise MetadataError(
                "refusing to delete data without i_am_sure=True"
            )
        targets = (
            [t.full_path for t in self._tables] if tables_only else [self.base_path]
        )
        for path in targets:
            p = path.removeprefix("file:")
            if not p.startswith("/"):
                raise MetadataError(f"refusing to delete non-local path {path}")
            shutil.rmtree(p, ignore_errors=True)

    def refresh_all_table_partitions(self, spark: "SparkSession") -> None:
        """Reference ``meta.py:874-876``."""
        for t in self._tables:
            if t.partitions:
                t.refresh_partitions(spark, self.name)

    def register_temp_views(self, spark: "SparkSession", suffix: str = "") -> None:
        """Register every table as a session temp view (catalog-less mode —
        handy for tests and ephemeral jobs)."""
        for t in self._tables:
            t.read(spark).createOrReplaceTempView(f"{t.name}{suffix}")

    # ------------------------------------------------------------------ #
    # serialization (reference meta.py:846-872)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "description": self.description,
            "bucket": self.bucket,
            "base_folder": self.base_folder,
        }

    def write_to_json(self, filepath: str) -> None:
        import json

        with open(filepath, "w") as f:
            json.dump(self.to_dict(), f, indent=4)
            f.write("\n")

    def __repr__(self) -> str:  # pragma: no cover
        return f"DatabaseMeta(name={self.name!r}, tables={self.table_names})"


def database_from_catalog(spark: "SparkSession", database_name: str) -> DatabaseMeta:
    """Catalog introspection → metadata objects (reference
    ``get_existing_database_from_glue_catalogue``, ``meta.py:975-998``, which
    does NOT load tables; we do, since Spark makes it cheap)."""
    from etl_manager_spark.meta.types import struct_type_to_columns

    db = spark.catalog.getDatabase(database_name)
    meta = DatabaseMeta(
        name=db.name,
        bucket=db.locationUri or "/tmp/warehouse",
        description=db.description or "",
    )
    for tinfo in spark.catalog.listTables(database_name):
        # skip permanent views AND session temp views: temp views ride
        # along in listTables for any database, cannot be database-
        # qualified (spark.table('<db>.<tempview>') raises), and are not
        # catalog state to introspect
        if tinfo.tableType == "VIEW" or tinfo.isTemporary:
            continue
        df = spark.table(f"{database_name}.{tinfo.name}")
        columns = struct_type_to_columns(df.schema)
        # real format + location from the catalog: hardcoding parquet /
        # <db>/<name> mis-described csv/external tables, and a
        # round-tripped read() would then apply the wrong reader or path
        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {database_name}.{tinfo.name}"
            ).collect()
        }
        from etl_manager_spark.meta.table import SUPPORTED_FORMATS

        provider = (detail.get("Provider") or "parquet").lower()
        if provider not in SUPPORTED_FORMATS:
            provider = "parquet"  # hive/unknown providers: best effort
        # location is stored RELATIVE to the database base (full_path
        # composes base/location); adopt the catalog's LOCATION when it
        # sits under the base, else fall back to the name convention
        location = tinfo.name
        cat_loc = detail.get("Location") or ""
        base = (db.locationUri or "").rstrip("/")
        if base and cat_loc.startswith(base + "/"):
            location = cat_loc[len(base) + 1 :]
        meta.add_table(
            TableMeta(
                name=tinfo.name,
                location=location,
                columns=columns,
                data_format=provider,
                description=tinfo.description or "",
            )
        )
    return meta
