"""The local mirror of the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle, compare row count, column names, and
values (exact for ints/strings/timestamps; bitwise for floats — our queries
are engineered to be float-deterministic, see functions/exact.py).
"""

from __future__ import annotations

import math

import duckdb
import pytest

import etl_manager_spark  # noqa: F401 (path setup)
from etl_manager_spark.workloads import load_registry
from etl_manager_spark.workloads.tables import TABLE_NAMES

REGISTRY = load_registry()
ORACLE_NAMES = sorted(n for n, wl in REGISTRY.items() if wl.oracle_spec is not None)
ROWS_ONLY_NAMES = sorted(n for n, wl in REGISTRY.items() if wl.oracle_spec is None)


@pytest.fixture(scope="module")
def duck(sf_dir_oracle):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir_oracle}/{t}.parquet')"
        )
    return con


def normalize(rows, columns):
    """Sort columns by name (driver semantics), then sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr), [columns[i] for i in order]


def _numeric_category(v):
    """int-like vs float-like vs decimal — the driver's canonical hash
    distinguishes dtypes, so ``1234 == 1234.0`` must NOT pass here."""
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    import decimal

    if isinstance(v, decimal.Decimal):
        return "decimal"
    return "other"


def values_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    # Reject cross-type numeric equality (int64 1234 vs float64 1234.0 hashes
    # differently in the driver) — the local gate must be at least as strict.
    if _numeric_category(a) != _numeric_category(b):
        return False
    if isinstance(a, float) or isinstance(b, float):
        # bitwise equality required — the whole point of the decimal-exact
        # discipline; tolerate only float32→float64 representation widening
        return a == b or (a == "NaN" and b == "NaN")
    return a == b


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck, sf_dir_oracle):
    wl = REGISTRY[name]
    sdf = wl.fn(spark, sf_dir_oracle)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(wl.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )

    s_norm, cols = normalize(spark_rows, spark_cols)
    d_norm, _ = normalize(duck_rows, duck_cols)
    mismatches = []
    for i, (srow, drow) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in enumerate(zip(srow, drow)):
            if not values_equal(sv, dv):
                mismatches.append((i, cols[c], sv, dv))
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark, sf_dir_oracle):
    wl = REGISTRY[name]
    df = wl.fn(spark, sf_dir_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
