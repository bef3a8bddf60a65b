"""Workload catalog: every implemented query/operator from SURVEY §2,
as (Spark callable, DuckDB oracle SQL) pairs.

The registry is what ``__spark_entry__.py`` exposes to the driver. Each
entry's Spark side is idiomatic DataFrame code over the engine's operators;
the oracle side is ANSI SQL for DuckDB over the same parquet views. Column
names/aliases match exactly (the driver sorts columns by name and
value-hashes). Float outputs follow the decimal-exact discipline of
:mod:`etl_manager_spark.functions.exact` so both engines produce bitwise-
identical doubles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Workload:
    """One catalog entry: a Spark query + optional DuckDB oracle SQL."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible, rows-only check
    category: str


REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: Optional[str], category: str):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        REGISTRY[name] = Workload(fn=fn, oracle=oracle, category=category)
        return fn

    return deco


def load_registry() -> dict[str, Workload]:
    """Import all workload modules (side-effect: fills REGISTRY)."""
    from etl_manager_spark.workloads import (  # noqa: F401
        pipeline,
        relational,
        streams,
        tpch_extra,
    )

    return REGISTRY
