"""Driver contract for the spark-graft builder (PySpark target).

Everything is delegated to the workload catalog
(``etl_manager_spark.workloads``): one registry entry per implemented
operator from SURVEY.md §2, each with a Spark callable and (where
SQL-expressible) a DuckDB oracle with matching column aliases.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_manager_spark.workloads import load_registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q3-shaped
    customer×orders×lineitem join + group + top-k."""
    registry = load_registry()
    return registry["q3_shipping_priority"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: wl.fn for name, wl in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    aliases as the Spark side; value-exact — see functions/exact.py)."""
    return {
        name: wl.oracle
        for name, wl in load_registry().items()
        if wl.oracle is not None
    }
