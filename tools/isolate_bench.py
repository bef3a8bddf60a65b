#!/usr/bin/env python
"""Re-measure specific catalog queries in a FRESH SparkSession and merge
the numbers into BENCH_DELTA.json as an "isolated" annotation.

Usage:
    python tools/isolate_bench.py [query ...]

With no arguments, re-measures every query currently listed in
BENCH_DELTA.json's outliers_over_1_5x. Rationale (round-6/7 lesson): the
full-catalog bench times each query inside a session hundreds of queries
deep; scheduler/GC debris can inflate an UNCHANGED query's median well
past 1.5x. An isolated number close to the previous round's proves the
outlier is session noise, not a regression; an isolated number matching
the in-bench one proves it's real. Both numbers stay recorded.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    delta_path = os.path.join(REPO, "BENCH_DELTA.json")
    with open(delta_path) as fh:
        delta = json.load(fh)
    names = sys.argv[1:] or sorted(delta.get("outliers_over_1_5x", {}))
    if not names:
        print("nothing to isolate")
        return

    from bench import build_session, run_queries, warm_batch, warm_streaming

    from etl_manager_spark.workloads import load_registry

    registry = load_registry()
    spark = build_session(cpus, "etl_manager_spark-isolate", experiment=True)
    spark.sparkContext.setLogLevel("ERROR")
    warm_batch(spark, sf_dir)
    if any(registry[n].category == "streaming" for n in names):
        warm_streaming(spark)

    # reuse the bench's own measurement loop so the isolated numbers carry
    # the SAME protocol (untimed warmup pass, median-of-n, and the
    # between-query hygiene: clearCache + conf re-assert + gc) — without
    # the hygiene, query k would time against queries 1..k-1's debris,
    # which is precisely the contamination this tool exists to rule out
    isolated: dict[str, float] = {}
    failures: dict[str, str] = {}
    run_queries(spark, names, registry, sf_dir, n_runs, isolated, failures)
    spark.stop()
    if failures:
        sys.stderr.write(f"isolate failures: {json.dumps(failures)}\n")

    delta["isolated_remeasure"] = {
        "protocol": f"fresh_session_median_of_{n_runs}_after_warmup",
        "queries": isolated,
    }
    with open(delta_path, "w") as fh:
        json.dump(delta, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(isolated))


if __name__ == "__main__":
    main()
