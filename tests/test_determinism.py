"""Partition-independence audit: the float discipline (functions/exact.py,
quantize-before-sum, fixed-order reductions) claims every catalog query is
BITWISE deterministic under any partitioning. This test actually varies the
partitioning — two co-prime shuffle-partition settings — and asserts the
collected results are identical, for a representative slice of the queries
whose math would drift first if the discipline broke (float aggregations,
iterative graph math, Arrow folds, rank-weighted moments)."""

import pytest

from etl_manager_spark.workloads import load_registry

REGISTRY = load_registry()

PROBE_QUERIES = [
    "bigram_lm_score_documents",   # broadcast count tables + quantized logs
    "regression_price_by_quantity",  # decimal moments -> one IEEE expr
    "pagerank_neardup_graph",      # iterative, quantize-before-sum
    "char_entropy_documents",      # per-char -p*log2(p), quantized
    "time_decay_engagement_events",  # 2^-k weights, integer sum
    "ewma_user_values",            # Arrow sorted-stream fold across batches
    "gini_revenue_customers",      # rank-weighted integer moments
    "bounce_rate_sessions",        # window sessionization w/ tiebreaks
    "kmeans_assign_embeddings",    # literal centroids, map-only
    "heavy_hitter_tokens_documents",  # partition-local candidates
]


def _run(spark, name, sf_dir, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sorted((tuple(r) for r in rows), key=repr)


@pytest.mark.parametrize("name", PROBE_QUERIES)
def test_result_identical_across_partitionings(name, spark, sf_dir):
    a = _run(spark, name, sf_dir, 3)
    b = _run(spark, name, sf_dir, 17)
    assert len(a) == len(b), f"{name}: row counts differ ({len(a)} vs {len(b)})"
    diffs = [(x, y) for x, y in zip(a, b) if x != y]
    assert not diffs, f"{name}: first diffs {diffs[:3]}"
