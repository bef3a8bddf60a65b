"""Shared Spark-vs-DuckDB comparison primitives.

One implementation of the driver's compare semantics, used by BOTH the
oracle-parity pytest gate (tests/test_oracle_parity.py, real sf data) and
the adversarial edge-data sweep (tools/edge_parity.py, empty/hostile
tables from tools/edge_data.py). Keeping them literally the same functions
means an edge-sweep pass is exactly as strict as the driver gate: columns
sorted by name, rows sorted, bitwise float equality, cross-type numeric
equality rejected, and DuckDB result types required to have a Spark twin.
"""

from __future__ import annotations

import math

# DuckDB scalar type → Spark dtype strings the driver's dtype-tagged hash
# treats as the same family. Anything NOT in this map and not a container
# (LIST/STRUCT/MAP) is a type with no Spark twin — HUGEINT being the
# classic: DuckDB types SUM(BIGINT) as int128, Spark emits int64, values
# identical but the driver hash differs (the round-5 failure class).
_INTS = {"tinyint", "smallint", "int", "bigint"}
DUCK_TO_SPARK = {
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

# Types DuckDB can infer that have NO Spark twin — an oracle emitting one
# of these can never driver-green even when every value matches.
FORBIDDEN_TOKENS = (
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


def numeric_category(v):
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
    # Reject cross-type numeric equality (int64 1234 vs float64 1234.0
    # hashes differently in the driver) — at least as strict as the gate.
    if numeric_category(a) != numeric_category(b):
        return False
    if isinstance(a, float) or isinstance(b, float):
        # bitwise equality required — the whole point of the decimal-exact
        # discipline; tolerate only float32→float64 representation widening
        return a == b or (a == "NaN" and b == "NaN")
    return a == b


def check_duck_types(name, duck_cols, duck_types, spark_dtypes):
    """Fail when an oracle's DECLARED DuckDB result type cannot hash-match
    Spark's output type, regardless of values (see DUCK_TO_SPARK)."""
    spark_by_col = dict(spark_dtypes)
    problems = []
    for col, dtype in zip(duck_cols, duck_types):
        dt = str(dtype).upper()
        for tok in FORBIDDEN_TOKENS:
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
            elif dt in DUCK_TO_SPARK:
                if sdt not in DUCK_TO_SPARK[dt]:
                    problems.append(f"{col}: oracle {dt} vs spark {sdt}")
            # containers (LIST/STRUCT/MAP/ARRAY) pass the twin check once
            # the forbidden-token scan above cleared their element types
    return problems


def compare_results(
    name, spark_cols, spark_rows, spark_dtypes, duck_cols, duck_rows, duck_types
):
    """Full driver-style comparison of already-materialized results.
    Returns a list of problem strings (empty = parity)."""
    problems = check_duck_types(name, duck_cols, duck_types, spark_dtypes)
    if sorted(spark_cols) != sorted(duck_cols):
        problems.append(f"column mismatch {spark_cols} vs {duck_cols}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count {len(spark_rows)} vs {len(duck_rows)}")
        return problems
    s_norm, cols = normalize(spark_rows, spark_cols)
    d_norm, _ = normalize(duck_rows, duck_cols)
    mism = []
    for i, (srow, drow) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in enumerate(zip(srow, drow)):
            if not values_equal(sv, dv):
                mism.append((i, cols[c], sv, dv))
    if mism:
        problems.append(f"value mismatches (first 5): {mism[:5]}")
    return problems
