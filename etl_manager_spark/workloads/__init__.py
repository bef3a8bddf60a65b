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


# Queries with a green (hash_match) row in the round-1 driver correctness
# file. The driver's per-round correctness gate checks a bounded prefix of
# the registry, so load_registry() orders entries to maximize NEW coverage
# each round: oracle-bearing queries without a green row yet come first,
# rows-only (no-oracle) entries next, and already-verified queries last.
_DRIVER_GREEN = frozenset(
    {
        "dedup_exact_documents", "dedup_exact_events_by_user_type",
        "text_profile_documents", "fingerprint_rolling_documents",
        "token_count_documents", "lang_id_documents",
        "minhash_signatures_documents", "simhash_documents",
        "ngram_jaccard_top_pairs", "minhash_near_dup_pairs",
        "similarity_topk_bruteforce", "embedding_profile",
        "dedup_embedding_cosine", "asof_events_last_order",
        "upsert_customer_batch", "scd2_user_event_history",
        "fuzzy_dedup_part_names", "train_test_split_documents",
        "profile_customer_columns", "curation_pipeline_documents",
        "udtf_token_explode_documents", "q1_pricing_summary",
        "agg_orders_by_priority", "agg_distinct_per_segment",
        "rollup_revenue_region_nation", "cube_status_priority",
        "q3_shipping_priority", "q5_local_supplier_volume",
        "join_left_customer_order_stats",
        "join_semi_customers_with_open_orders",
        "join_anti_customers_without_orders", "join_full_nation_presence",
        "join_cross_region_pairs", "window_top3_orders_per_customer",
        "window_running_spend", "window_order_gap_days",
        "setop_nations_with_both", "setop_customer_only_nations",
        "topk_parts_by_price", "scalar_string_functions",
        "scalar_datetime_functions",
    }
)


def _priority(item: tuple[str, Workload]) -> int:
    name, wl = item
    if wl.oracle is not None and name not in _DRIVER_GREEN:
        return 0  # strongest new signal: full oracle check, no green row yet
    if wl.oracle is None:
        return 1  # rows-only check (includes the r1 canonicalizer ERRs)
    return 2  # already driver-verified in round 1


def load_registry() -> dict[str, Workload]:
    """Import all workload modules (side-effect: fills REGISTRY) and return
    the catalog ordered for the driver's bounded correctness prefix (see
    ``_DRIVER_GREEN``). Sort is stable → insertion order within a tier."""
    from etl_manager_spark.workloads import (  # noqa: F401
        pipeline,
        relational,
        streams,
        tpch_extra,
    )

    return dict(sorted(REGISTRY.items(), key=_priority))
