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


# Queries with a green (hash_match) row in the round-1 ∪ round-2 driver
# correctness files, EXCLUDING any query whose Spark code or oracle changed
# since (those must be re-verified, so they sort first). The driver's
# per-round correctness gate checks a bounded prefix of the registry, so
# load_registry() orders entries to maximize NEW coverage each round:
# oracle-bearing queries without a green row yet come first, rows-only
# (no-oracle) entries next, and already-verified queries last.
_DRIVER_GREEN = frozenset(
    {
        "agg_distinct_per_segment", "agg_median_acctbal_by_nation",
        "agg_orders_by_priority", "array_agg_line_numbers",
        "asof_events_last_order", "cube_status_priority",
        "curation_pipeline_documents", "dedup_embedding_cosine",
        "dedup_exact_documents", "dedup_exact_events_by_user_type",
        "embedding_profile", "embedding_quantize",
        "events_hourly_rollup", "events_sessionization",
        "fingerprint_rolling_documents", "fuzzy_dedup_part_names",
        "grouping_sets_revenue", "join_anti_customers_without_orders",
        "join_cross_region_pairs", "join_full_nation_presence",
        "join_left_customer_order_stats", "join_semi_customers_with_open_orders",
        "json_extract_events", "json_struct_parse_events",
        "lang_id_documents", "latest_event_per_user",
        "minhash_near_dup_pairs", "minhash_signatures_documents",
        "ngram_jaccard_top_pairs", "pivot_event_type_by_dow",
        "profile_customer_columns", "q10_returned_item_customers",
        "q12_priority_by_quantity_band", "q13_customer_order_distribution",
        "q14_promo_revenue_share", "q15_top_supplier",
        "q16_supplier_count_by_part", "q17_small_quantity_revenue",
        "q18_large_quantity_orders", "q19_disjunctive_predicates",
        "q1_pricing_summary", "q20_heavy_shippers",
        "q22_global_sales_opportunity", "q3_shipping_priority",
        "q4_priority_with_returns", "q5_local_supplier_volume",
        "q6_revenue_change", "q7_nation_pair_volume",
        "q8_market_share", "q9_profit_by_nation_year",
        "range_join_value_buckets", "rollup_revenue_region_nation",
        "scalar_array_functions", "scalar_datetime_functions",
        "scalar_string_functions", "scd2_user_event_history",
        "setop_customer_only_nations", "setop_nations_with_both",
        "simhash_documents", "similarity_topk_bruteforce",
        "streaming_dedup_user_event_types", "streaming_hourly_rollup",
        "streaming_interval_join_attribution", "streaming_session_windows",
        "streaming_sliding_windows", "streaming_stateful_user_counters",
        "subquery_in_hot_parts", "subquery_scalar_above_avg",
        "text_profile_documents", "token_count_documents",
        "topk_parts_by_price", "train_test_split_documents",
        "udtf_token_explode_documents", "union_all_contacts",
        "unpivot_part_measures", "upsert_customer_batch",
        "window_ntile_quartiles", "window_order_gap_days",
        "window_percentiles_acctbal", "window_range_30d_spend",
        "window_running_spend", "window_top3_orders_per_customer",
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
