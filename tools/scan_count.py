#!/usr/bin/env python
"""Count FileScan nodes per input table in each query's physical plan.

Deterministic multi-pass detector for the round-10 §8 sweep: a query
whose plan contains N scan nodes over the same fact parquet re-reads
(and usually re-aggregates) that table N times per execution — the
ReusedExchange rule only dedupes subtrees whose CANONICAL plans match,
and per-branch column pruning routinely breaks that match (measured in
round 10 §1: a lazy shared base re-executed its fact scan per branch).
Plan-node counts are properties of the committed code, not of the box,
so before/after pairs are drift-proof evidence.

Usage: python tools/scan_count.py /tmp/out.json query [query ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from bench import build_session

    from etl_manager_spark.workloads import load_registry

    registry = load_registry()
    spark = build_session(cpus, "etl_manager_spark-scan-count", experiment=True)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in names:
        entry = registry[name]
        if entry.category == "streaming":
            out[name] = {"skipped": "streaming"}
            continue
        try:
            df = entry.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record and continue
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        # Each scan node's DETAIL block carries one "Location:" line
        # naming the file — one per scan node (the tree header line does
        # not repeat it), so counting Locations counts scan nodes per
        # table. ExistingRDD scans are checkpoint reads (context).
        tables: dict[str, int] = {}
        for m in re.finditer(r"Location:[^\n]*?([\w.-]+)\.parquet", plan):
            key = m.group(1)
            tables[key] = tables.get(key, 0) + 1
        out[name] = {
            "parquet_scans": tables,
            "existing_rdd_scans": plan.count("Scan ExistingRDD"),
            "exchanges": len(re.findall(r"\bExchange\b", plan)),
            "reused_exchanges": plan.count("ReusedExchange"),
        }
        dup = {t: c for t, c in tables.items() if c > 1}
        print(f"{name}: scans={tables} dup={dup} "
              f"rdd={out[name]['existing_rdd_scans']}")
    spark.stop()
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
