#!/usr/bin/env python
"""Run plans.lint_plan over every catalog query and write
LINT_CATALOG.json — the per-round plan-hygiene audit.

Exit non-zero if any query plans a CartesianProduct, or a
row-at-a-time Python UDF appears outside the two deliberate UDTF
workloads (which bound their input and document why).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# row-at-a-time Python is the documented point of these two (bounded input)
ROW_UDF_ALLOWED = {"udtf_event_runs_per_user", "udtf_token_explode_documents"}

# single-partition Window allowed ONLY where the window input is provably
# bounded — a post-limit(k) frame or a fixed-k aggregate. Each entry's bound
# is stated in the workload docstring; anything else planning an Exchange
# SinglePartition under a Window is a critical lint failure.
SP_WINDOW_ALLOWED: set[str] = set()

# exact percentile/median aggregates allowed ONLY where the per-group value
# domain is provably bounded (the bound is stated in the workload
# docstring); over a domain that grows with the data the single-task
# buffer is a 100 TB OOM — use operators/quantiles.py instead.
PCT_ALLOWED = {
    # ≤7 nano-quantized daily means per (day) group — calendar-bounded
    "moving_median_daily_value",
}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from etl_manager_spark.plans import lint_plan
    from etl_manager_spark.workloads import load_registry

    sf = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
    reg = load_registry()
    report: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name in sorted(reg):
        try:
            codes = [w.code for w in lint_plan(reg[name].fn(spark, sf))]
        except Exception as exc:  # noqa: BLE001 - record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        if codes:
            report[name] = codes

    critical = sorted(
        name
        for name, codes in report.items()
        if "cartesian-product" in codes
        or ("python-row-udf" in codes and name not in ROW_UDF_ALLOWED)
        or (
            "single-partition-window" in codes
            and name not in SP_WINDOW_ALLOWED
        )
        or ("unbounded-percentile" in codes and name not in PCT_ALLOWED)
    )

    # Oracle declared-type scan: an oracle whose DuckDB result type has no
    # Spark twin (HUGEINT from an uncast SUM(BIGINT) being the classic) can
    # never driver-green even with identical values. Mirrors the check in
    # tests/test_oracle_parity.py but runs catalog-wide without Spark.
    oracle_type_bad = scan_oracle_types(reg)

    out = {
        "queries_total": len(reg),
        "queries_flagged": len(report),
        "critical": critical,
        "oracle_type_errors": oracle_type_bad,
        "errors": errors,
        "warnings": report,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "LINT_CATALOG.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(
        json.dumps(
            {
                "queries_total": out["queries_total"],
                "queries_flagged": out["queries_flagged"],
                "critical": critical,
                "oracle_type_errors": oracle_type_bad,
                "errors": len(errors),
            }
        )
    )
    if critical or errors or oracle_type_bad:
        sys.exit(1)


def scan_oracle_types(reg) -> dict[str, list[str]]:
    """Plan (not run) every oracle in DuckDB against empty same-schema views
    and reject declared result types with no Spark twin."""
    import duckdb

    from etl_manager_spark.workloads.tables import TABLE_NAMES

    sf = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    forbidden = (
        "HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT",
        "UINTEGER", "UBIGINT", "INTERVAL", "UUID",
    )
    bad: dict[str, list[str]] = {}
    for name in sorted(reg):
        spec = reg[name].oracle_spec
        if spec is None:
            continue
        try:
            rel = con.sql(reg[name].oracle)
        except Exception:  # noqa: BLE001 - parity test reports run errors
            continue
        hits = [
            f"{col}: {dtype}"
            for col, dtype in zip(rel.columns, rel.types)
            if any(tok in str(dtype).upper() for tok in forbidden)
        ]
        if hits:
            bad[name] = hits
    return bad


if __name__ == "__main__":
    main()
