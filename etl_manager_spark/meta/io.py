"""Metadata JSON loaders (reference ``meta.py:922-972``) and schema import
from existing parquet data (reference ``meta.py:1009-1060``)."""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from etl_manager_spark.meta.database import DatabaseMeta
from etl_manager_spark.meta.table import MetadataError, TableMeta

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import SparkSession


def table_from_dict(d: dict, database: DatabaseMeta | None = None) -> TableMeta:
    """Agnostic table dict → :class:`TableMeta`.

    Accepts both our shape and the reference's (``glue_specific`` is mapped
    onto ``format_options`` verbatim; ``$schema`` is ignored).
    """
    known = {
        "name",
        "description",
        "data_format",
        "location",
        "columns",
        "partitions",
        "primary_key",
        "format_options",
        "glue_specific",
        "$schema",
    }
    unknown = set(d) - known
    if unknown:
        raise MetadataError(f"unknown table metadata keys: {sorted(unknown)}")
    table = TableMeta(
        name=d["name"],
        location=d["location"],
        columns=d["columns"],
        data_format=d.get("data_format", "parquet"),
        description=d.get("description", ""),
        partitions=d.get("partitions"),
        primary_key=d.get("primary_key"),
        format_options=d.get("format_options") or _glue_specific_to_options(d),
    )
    if database is not None:
        database.add_table(table)
    return table


def _glue_specific_to_options(d: dict) -> dict:
    """Translate the reference's ``glue_specific`` override block (a Hive
    TableInput fragment, e.g. ``Parameters.skip.header.line.count`` —
    ``example/meta_data/db1/pay.json:19-28``) into Spark reader options."""
    glue = d.get("glue_specific") or {}
    params = glue.get("Parameters", {})
    options: dict = {}
    if str(params.get("skip.header.line.count", "0")) == "1":
        options["header"] = "true"
    return options


def read_table_json(filepath: str, database: DatabaseMeta | None = None) -> TableMeta:
    """Reference ``read_table_json`` (``meta.py:922-945``)."""
    with open(filepath) as f:
        return table_from_dict(json.load(f), database)


def read_database_json(filepath: str) -> DatabaseMeta:
    """Reference ``read_database_json`` (``meta.py:948-956``)."""
    with open(filepath) as f:
        d = json.load(f)
    return DatabaseMeta(
        name=d["name"],
        bucket=d["bucket"],
        base_folder=d.get("base_folder", ""),
        description=d.get("description", ""),
    )


def read_database_folder(folderpath: str) -> DatabaseMeta:
    """Folder of ``database.json`` + one json per table → full
    :class:`DatabaseMeta` (reference ``meta.py:959-972``)."""
    db = read_database_json(os.path.join(folderpath, "database.json"))
    for fname in sorted(os.listdir(folderpath)):
        if fname.endswith(".json") and fname != "database.json":
            read_table_json(os.path.join(folderpath, fname), db)
    return db


def tablemeta_from_parquet_schema(
    spark: "SparkSession", path: str, name: str, location: str
) -> TableMeta:
    """Infer table metadata from parquet files — the Spark-native version of
    the reference's ``tablemeta_from_parquet_meta`` (``meta.py:1038-1060``),
    which hand-parses Spark's ``df.schema.json()``; here we just read the
    footer and convert the live ``StructType``."""
    from etl_manager_spark.meta.types import struct_type_to_columns

    schema = spark.read.parquet(path).schema
    return TableMeta(
        name=name,
        location=location,
        columns=struct_type_to_columns(schema),
        data_format="parquet",
    )
