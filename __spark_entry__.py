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


def _staleness_order(names) -> list[str]:
    """Never-driver-green queries first, then stalest green round, then
    name — so a driver that samples a PREFIX of the catalog always
    verifies the least-recently-confirmed queries. The ledger
    (driver_green.json) is regenerated from the CORRECTNESS_r*.json
    files by tools/regen_driver_green.py — never hand-kept."""
    import json

    ledger_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "etl_manager_spark",
        "workloads",
        "driver_green.json",
    )
    try:
        with open(ledger_path) as fh:
            green = json.load(fh)
    except Exception:  # noqa: BLE001 - no ledger → plain name order
        green = {}
    return sorted(names, key=lambda n: (green.get(n, -1), n))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (iteration
    order: least-recently-driver-verified first)."""
    registry = load_registry()
    return {name: registry[name].fn for name in _staleness_order(registry)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    aliases as the Spark side; value-exact — see functions/exact.py)."""
    registry = load_registry()
    return {
        name: registry[name].oracle
        for name in _staleness_order(registry)
        if registry[name].oracle is not None
    }
