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
    """One catalog entry: a Spark query + optional DuckDB oracle SQL.

    ``oracle_spec`` is either the SQL string itself or a zero-arg factory
    producing it. Factories exist for oracles that embed data-derived
    literals (e.g. the IVF centroids, trained from the oracle-scale
    parquet) — building those at import time would add I/O to every
    import, so they run on first ``.oracle`` access and memoize."""

    fn: Callable[[SparkSession, str], DataFrame]
    # None → non-SQL-expressible, rows-only check
    oracle_spec: Optional[str | Callable[[], str]]
    category: str

    @property
    def oracle(self) -> Optional[str]:
        return self.oracle_spec() if callable(self.oracle_spec) else self.oracle_spec


REGISTRY: dict[str, Workload] = {}


def workload(name: str, oracle: Optional[str | Callable[[], str]], category: str):
    """Decorator registering a (spark, sf_dir) -> DataFrame query."""

    def deco(fn):
        import functools

        spec = functools.lru_cache(maxsize=1)(oracle) if callable(oracle) else oracle
        REGISTRY[name] = Workload(fn=fn, oracle_spec=spec, category=category)
        return fn

    return deco


# The driver-green ledger is GENERATED from the CORRECTNESS_r*.json files
# by ``tools/regen_driver_green.py`` (never hand-edited): query name →
# last round whose driver row had hash_match == True. The driver's
# per-round correctness gate checks a bounded prefix of the registry, so
# load_registry() orders entries to maximize signal each round:
# oracle-bearing queries without a green row yet come first, rows-only
# (no-oracle) entries next, and already-verified queries last —
# stalest verification first, so fixture/code drift is re-caught soonest.
def _load_driver_green() -> dict[str, int]:
    import json
    import os
    import warnings

    path = os.path.join(os.path.dirname(__file__), "driver_green.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return {str(k): int(v) for k, v in data.items()}
    except (OSError, ValueError, TypeError, AttributeError) as exc:
        # A broken ledger must not break the catalog import, but silent
        # degradation would scramble the driver's verification ordering —
        # make the fallback loud.
        warnings.warn(
            f"driver_green.json unusable ({exc!r}); treating every query "
            "as never-verified — regenerate with tools/regen_driver_green.py",
            stacklevel=2,
        )
        return {}


_DRIVER_GREEN: dict[str, int] = _load_driver_green()


def _priority(item: tuple[str, Workload]) -> tuple[int, int]:
    name, wl = item
    if wl.oracle_spec is not None and name not in _DRIVER_GREEN:
        return (0, 0)  # strongest new signal: full oracle check, no green row
    if wl.oracle_spec is None:
        return (1, 0)  # rows-only check
    return (2, _DRIVER_GREEN[name])  # verified: stalest round first


def load_registry() -> dict[str, Workload]:
    """Import all workload modules (side-effect: fills REGISTRY) and return
    the catalog ordered for the driver's bounded correctness prefix (see
    ``_DRIVER_GREEN``). Sort is stable → insertion order within a tier."""
    from etl_manager_spark.workloads import (  # noqa: F401
        analytics,
        audit,
        curation,
        graphs,
        hygiene,
        metrics,
        pipeline,
        relational,
        streams,
        tpch_extra,
    )

    return dict(sorted(REGISTRY.items(), key=_priority))
