#!/usr/bin/env python
"""Empirical scale probe (VERDICT r7 task #4, extended in r9 task #5):
SCALING.md argues the 100 TB design; this measures the curve — now at
TWO points above the bench scale. Synthesize ~sf1 and ~sf5 datasets by
replicating sf0.1 ten / fifty times with key remapping (ids/fkeys
shifted by replica * 10^9 so joins stay consistent and keys stay
unique), then time the most expensive catalog queries at sf0.1 vs sf1
vs sf5 in one warm session per scale and write SCALING_SPOT.md with the
timings and ratios.

This is a CURVE check, not a parity check — no oracles. A 10x data bump
should cost ~<=12x wall-clock on a fixed local[32] box for linear
operators (constant per-query scheduling overhead amortizes; shuffles
grow n log n at worst), and the sf1->sf5 leg (5x data) ~<=6x. Ratios
far above that mean super-linear work (pair blow-ups, driver-side
state) and get an explanation or a fix. The second point matters most
for the dedup family: 50 replicas = every document duplicated 50x, so
the candidate space grows 5x denser than sf1's — a quadratic candidate
generator that hid inside sf1's envelope cannot hide here.

Usage: python tools/scale_spot.py [--regen] [--runs 2] [--scales sf1,sf5]
Writes /tmp/spark_graft_sf1/*.parquet and /tmp/spark_graft_sf5/*.parquet
(cached unless --regen).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SHIFT = 10**9
SCALES: dict[str, tuple[str, int]] = {
    # name -> (dir, replicas of sf0.1)
    "sf1": ("/tmp/spark_graft_sf1", 10),
    "sf5": ("/tmp/spark_graft_sf5", 50),
}

# key columns shifted per replica so ids stay unique and every fk join
# lands on exactly one replica's parent rows. region/nation/part/supplier
# are copied unshifted (dims: Nx facts per dim row is the realistic
# scale-up shape). Timestamps are kept — Nx density per day, not a
# longer calendar.
SHIFTED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
    "part": [],
    "supplier": [],
}

# the expensive tail of the bench (top cost at sf0.1) plus the two
# ~5.9x-at-sf1 linear operators the r8 verdict flagged for a second
# curve point (cdc_chunk_stats, incremental_minhash_dedup) and the
# streaming attribution family (availableNow micro-batch over the same
# replicated events — its state stores must scale with keys, not rows).
QUERIES = [
    "mad_robust_outliers_events",
    "conformal_interval_events",
    "qq_distance_view_click",
    "countmin_calibration_events",
    "incremental_minhash_dedup_documents",
    "ndcg_bm25_documents",
    "cdc_chunk_stats_documents",
    "profile_approx_quantiles_orders",
    "winsorized_mean_value_by_type",
    "kneser_ney_bigram_score_documents",
    "identity_stitching_events",
    "norm_quartiles_embeddings_label",
    "spearman_price_custkey_orders",
    "equidepth_bins_orders_price",
    "agg_median_acctbal_by_nation",
    "dbscan_core_border_noise_embeddings",
    "theil_sen_daily_value_trend",
    "intrinsic_dim_twonn_embeddings",
    "similarity_topk_pq_adc",
    "simhash_near_dup_pairs",
    "streaming_leftouter_attribution",
    "streaming_interval_join_attribution",
    "streaming_fullouter_attribution",
    "streaming_two_level_rollup",
    # round 10 (VERDICT r9 #6): the rest of the bench top-40 — graph /
    # dedup-cluster family, text-scoring family, recursive streaks,
    # remaining streaming — so every top-cost query has an sf5 point.
    "streaming_custom_sink_synthlog",
    "bfs_distance_neardup",
    "rfm_user_scores",
    "streaming_python_datasource_synthlog",
    "activity_streaks_recursive_events",
    "dedup_cluster_assignment_star",
    "top_ngram_char_frac_documents",
    "dedup_cluster_survivors",
    "bm25_rank_documents",
    "streaming_stateful_user_counters",
    "bigram_lm_score_documents",
    "dupspan_coverage_documents",
    "streaming_funnel_stages",
    "dedup_embedding_cosine_lsh",
    "tfidf_top_terms_documents",
    "newey_west_trend_daily",
    "rolling_origin_backtest_daily",
    "simhash_documents",
]


def synth(dst: str, replicas: int) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        src = os.path.join(SF01, f"{table}.parquet")
        out = os.path.join(dst, f"{table}.parquet")
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{out}' "
                "(FORMAT PARQUET)"
            )
            continue
        shifted_cols = ", ".join(
            f"{k} + r.r * {SHIFT} AS {k}" for k in keys
        )
        con.execute(
            f"""
            COPY (
              SELECT t.* REPLACE ({shifted_cols})
              FROM read_parquet('{src}') t
              CROSS JOIN (SELECT UNNEST(RANGE({replicas})) AS r) r
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
        n0 = con.execute(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
        n1 = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        assert n1 == replicas * n0, (table, n0, n1)
    con.close()


def time_queries(sf_dir: str, runs: int, names: list[str]) -> dict[str, list[float]]:
    from pyspark.sql import SparkSession

    from etl_manager_spark.workloads import load_registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()  # warm
    out: dict[str, list[float]] = {}
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            reg[name].fn(spark, sf_dir).collect()
            times.append(round(time.monotonic() - t0, 3))
        out[name] = times
        print(f"{sf_dir.split('/')[-1]:>4} {name:45s} {times}", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--scales", default="sf1,sf5")
    ap.add_argument("--queries", default=None, help="comma list override")
    args = ap.parse_args()
    names = args.queries.split(",") if args.queries else QUERIES
    tiers = args.scales.split(",")
    for tier in tiers:
        d, replicas = SCALES[tier]
        if args.regen or not os.path.exists(os.path.join(d, "events.parquet")):
            print(f"synthesizing {tier} ({replicas} replicas) ...", flush=True)
            synth(d, replicas)
    results = {"sf0.1": time_queries(SF01, args.runs, names)}
    for tier in tiers:
        results[tier] = time_queries(SCALES[tier][0], args.runs, names)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALING_SPOT.json")
    merged = {}
    if os.path.exists(path):
        with open(path) as fh:
            merged = json.load(fh)
    # Timings are only comparable under the same harness config; if it
    # changed (e.g. driver memory bump), drop the tier's stale entries
    # instead of mixing non-comparable numbers, and record the config
    # per tier so provenance is auditable.
    config = {
        "driver_memory": "24g",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "runs": args.runs,
        "date": time.strftime("%Y-%m-%d"),
    }
    comparable = {"driver_memory", "cpus"}
    for tier, data in results.items():
        prev_cfg = merged.get(tier, {}).get("_config", {})
        if {k: prev_cfg.get(k) for k in comparable} != {
            k: config[k] for k in comparable
        }:
            merged[tier] = {}
        merged[tier].update(data)
        merged[tier]["_config"] = config
    with open(path, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote SCALING_SPOT.json — render SCALING_SPOT.md from it")


if __name__ == "__main__":
    main()
