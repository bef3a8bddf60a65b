#!/usr/bin/env python
"""Empirical scale probe (VERDICT r7 task #4): SCALING.md argues the
100 TB design; this measures the curve. Synthesize a ~sf1 dataset by
replicating sf0.1 ten times with key remapping (ids/fkeys shifted by
replica * 10^9 so joins stay consistent and keys stay unique), then time
the most expensive catalog queries at sf0.1 vs sf1 in one warm session
per scale and write SCALING_SPOT.md with both timings and the ratio.

This is a CURVE check, not a parity check — no oracles. A 10x data bump
should cost ~<=12x wall-clock on a fixed local[32] box for linear
operators (constant per-query scheduling overhead amortizes; shuffles
grow n log n at worst). Ratios far above that mean super-linear work
(pair blow-ups, driver-side state) and get an explanation or a fix.

Usage: python tools/scale_spot.py [--regen] [--runs 2]
Writes /tmp/spark_graft_sf1/*.parquet (cached unless --regen).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = "/tmp/spark_graft_sf1"
SHIFT = 10**9
REPLICAS = 10

# key columns shifted per replica so ids stay unique and every fk join
# lands on exactly one replica's parent rows. region/nation/part/supplier
# are copied unshifted (dims: 10x facts per dim row is the realistic
# scale-up shape). Timestamps are kept — 10x density per day, not a
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

# the expensive tail of BENCH_r07 (streaming family excluded — its cost
# is fresh-session micro-batch machinery, not data volume) plus the two
# round-8 watch items (theil_sen rewrite, dbscan drift).
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
]


def synth() -> None:
    import duckdb

    os.makedirs(SF1, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        src = os.path.join(SF01, f"{table}.parquet")
        dst = os.path.join(SF1, f"{table}.parquet")
        if not keys:
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{src}')) TO '{dst}' "
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
              CROSS JOIN (SELECT UNNEST(RANGE({REPLICAS})) AS r) r
            ) TO '{dst}' (FORMAT PARQUET)
            """
        )
        n0 = con.execute(f"SELECT COUNT(*) FROM read_parquet('{src}')").fetchone()[0]
        n1 = con.execute(f"SELECT COUNT(*) FROM read_parquet('{dst}')").fetchone()[0]
        assert n1 == REPLICAS * n0, (table, n0, n1)
    con.close()


def time_queries(sf_dir: str, runs: int) -> dict[str, list[float]]:
    from pyspark.sql import SparkSession

    from etl_manager_spark.workloads import load_registry

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_registry()
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()  # warm
    out: dict[str, list[float]] = {}
    for name in QUERIES:
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
    args = ap.parse_args()
    if args.regen or not os.path.exists(os.path.join(SF1, "events.parquet")):
        print("synthesizing sf1 ...", flush=True)
        synth()
    t01 = time_queries(SF01, args.runs)
    t1 = time_queries(SF1, args.runs)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SCALING_SPOT.json"), "w") as fh:
        json.dump({"sf0.1": t01, "sf1": t1}, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print("wrote SCALING_SPOT.json — render SCALING_SPOT.md from it")


if __name__ == "__main__":
    main()
