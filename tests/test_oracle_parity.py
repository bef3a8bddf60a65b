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


# DuckDB scalar type → Spark dtype strings the driver's dtype-tagged hash
# treats as the same family. Anything NOT in this map and not a container
# (LIST/STRUCT/MAP) is a type with no Spark twin — HUGEINT being the classic:
# DuckDB types SUM(BIGINT) as int128, Spark emits int64, values identical but
# the driver hash differs (the round-5 failure class this gate now catches).
_INTS = {"tinyint", "smallint", "int", "bigint"}
_DUCK_TO_SPARK = {
    "BOOLEAN": {"boolean"},
    # the driver's hash normalizes signed-int WIDTHS (empirically:
    # histogram_events_value went driver-green in r4 with Spark int32 vs
    # DuckDB BIGINT) — only int128 (HUGEINT) breaks it, and that is
    # forbidden outright below
    "TINYINT": _INTS,
    "SMALLINT": _INTS,
    "INTEGER": _INTS,
    "BIGINT": _INTS,
    "FLOAT": {"float"},
    "DOUBLE": {"double"},
    "VARCHAR": {"string"},
    "DATE": {"date"},
    "TIME": {"string"},  # Spark has no TIME; oracles must not emit it
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
    "BLOB": {"binary"},
}

# Types DuckDB can infer that have NO Spark twin — an oracle emitting one of
# these can never driver-green even when every value matches.
_FORBIDDEN_TOKENS = (
    "HUGEINT",
    "UHUGEINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "UBIGINT",
    "INTERVAL",
    "UUID",
    "BIT",
)


def check_duck_types(name, duck_cols, duck_types, spark_dtypes):
    """Fail when an oracle's DECLARED DuckDB result type cannot hash-match
    Spark's output type, regardless of values (see _DUCK_TO_SPARK)."""
    spark_by_col = dict(spark_dtypes)
    problems = []
    for col, dtype in zip(duck_cols, duck_types):
        dt = str(dtype).upper()
        for tok in _FORBIDDEN_TOKENS:
            if tok in dt:
                problems.append(
                    f"{col}: oracle emits {dt} (contains {tok} — no Spark "
                    f"twin; CAST the SQL, e.g. CAST(SUM(...) AS BIGINT))"
                )
                break
        else:
            sdt = spark_by_col.get(col, "").lower()
            if dt.startswith("DECIMAL"):
                if not sdt.startswith("decimal"):
                    problems.append(f"{col}: oracle DECIMAL vs spark {sdt}")
            elif dt in _DUCK_TO_SPARK:
                if sdt not in _DUCK_TO_SPARK[dt]:
                    problems.append(f"{col}: oracle {dt} vs spark {sdt}")
            # containers (LIST/STRUCT/MAP/ARRAY) pass the twin check once the
            # forbidden-token scan above has cleared their element types
    return problems


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(name, spark, duck, sf_dir_oracle):
    wl = REGISTRY[name]
    sdf = wl.fn(spark, sf_dir_oracle)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(wl.oracle)
    type_problems = check_duck_types(
        name, rel.columns, rel.types, sdf.dtypes
    )
    assert not type_problems, f"{name}: oracle type mismatch: {type_problems}"

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


def test_type_gate_catches_uncast_sum(duck):
    """An uncast SUM(BIGINT) types as HUGEINT in DuckDB — the gate must
    reject it even though every VALUE would compare equal (round-5 driver
    hash-fail class)."""
    rel = duck.sql("SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    problems = check_duck_types("injected", rel.columns, rel.types, [("s", "bigint")])
    assert problems and "HUGEINT" in problems[0]
    # and the cast fixes it
    rel2 = duck.sql(
        "SELECT CAST(SUM(x) AS BIGINT) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)"
    )
    assert not check_duck_types("ok", rel2.columns, rel2.types, [("s", "bigint")])


def test_catalog_type_scan_catches_injection(duck):
    """tools.lint_catalog.scan_oracle_types flags a registry entry whose
    oracle emits HUGEINT."""
    from types import SimpleNamespace

    from tools.lint_catalog import scan_oracle_types

    fake = {
        "bad_q": SimpleNamespace(
            oracle_spec=object(),
            oracle="SELECT SUM(o_custkey) AS s FROM orders",
        ),
        "good_q": SimpleNamespace(
            oracle_spec=object(),
            oracle="SELECT CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders",
        ),
    }
    bad = scan_oracle_types(fake)
    assert "bad_q" in bad and "good_q" not in bad


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_queries_run(name, spark, sf_dir_oracle):
    wl = REGISTRY[name]
    df = wl.fn(spark, sf_dir_oracle)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
