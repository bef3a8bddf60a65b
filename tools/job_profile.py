#!/usr/bin/env python
"""Per-query job/stage/task counts + wall time, dumped as JSON.

Deterministic complement to wall-clock A/B on a noisy box: the number of
Spark jobs and stages a query executes is a property of the plan, not of
ambient load, so before/after comparisons of these counts are
drift-proof evidence (wall time rides along for context).

Usage: python tools/job_profile.py /tmp/out.json query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import build_session, warm_batch

    from etl_manager_spark.workloads import load_registry

    registry = load_registry()
    spark = build_session(cpus, "etl_manager_spark-jobprofile", experiment=True)
    spark.sparkContext.setLogLevel("ERROR")
    warm_batch(spark, sf_dir)

    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def snapshot():
        ids = tracker.getJobIdsForGroup(None)
        n_stages = 0
        n_tasks = 0
        seen_stages = set()
        for j in ids:
            ji = tracker.getJobInfo(j)
            if ji is not None:
                n_stages += len(ji.stageIds)
                for s in ji.stageIds:
                    if s in seen_stages:
                        continue
                    seen_stages.add(s)
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_tasks += si.numTasks
        return len(ids), n_stages, n_tasks

    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name].fn
        # untimed warmup (scratch stores, codegen)
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        j0, s0, t0n = snapshot()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        j1, s1, t1n = snapshot()
        out[name] = {
            "jobs": j1 - j0,
            "stages": s1 - s0,
            "tasks": t1n - t0n,
            "wall": round(wall, 3),
        }
        spark.catalog.clearCache()
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, sort_keys=True))


if __name__ == "__main__":
    main()
