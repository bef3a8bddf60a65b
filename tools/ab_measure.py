#!/usr/bin/env python
"""Measure named catalog queries with the bench protocol (untimed warmup,
median of N, between-query hygiene) in a fresh session and dump JSON to
the path in argv[1]. Used for close-in-time A/B pairs between the
round-start worktree and the optimized tree, so box drift cannot forge a
win (the full-bench baseline this round showed ~1.8× ambient variance
WITHIN one run).

Usage: python tools/ab_measure.py /tmp/out.json query [query ...]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    from bench import build_session, run_queries, warm_batch, warm_streaming

    from etl_manager_spark.workloads import load_registry

    registry = load_registry()
    spark = build_session(cpus, "etl_manager_spark-ab", experiment=True)
    spark.sparkContext.setLogLevel("ERROR")
    warm_batch(spark, sf_dir)
    if any(registry[n].category == "streaming" for n in names):
        warm_streaming(spark)
    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    run_queries(spark, names, registry, sf_dir, n_runs, timings, failures)
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump({"timings": timings, "failures": failures, "repo": REPO}, fh, indent=1, sort_keys=True)
    print(json.dumps({"repo": REPO, "timings": timings, "failures": failures}))


if __name__ == "__main__":
    main()
