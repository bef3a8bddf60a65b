"""Decimal-exact aggregation helpers.

Floating-point aggregation is order-dependent: ``sum(double)`` over a
shuffled dataset gives different last-ulp results per partitioning, so
results can't be compared bitwise across engines (or across two runs of the
same engine at different parallelism). For deterministic, engine-portable
results we aggregate in DECIMAL (exact, associative) and convert to double
only at the very end — one deterministic IEEE operation.

Empirically verified bitwise-equal between Spark local[4] and DuckDB on the
sf0.01 testdata (sums, averages, product-sums; see tests/test_oracle_parity).

Scale note: Spark's decimal sum is a JVM-side hash aggregate with partial
(map-side) combine — same shuffle shape as a double sum, only marginally
heavier arithmetic; safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# scale=2 matches the testdata's money columns exactly (verified: every
# double round-trips through decimal(18,2) unchanged). Low scale matters for
# the final decimal→double cast: it is correctly rounded in both engines only
# while the unscaled value stays < 2^53, so the smallest sufficient scale is
# the safest.
DEFAULT_DECIMAL = "decimal(18,2)"


def dec(col: Column | str, typ: str = DEFAULT_DECIMAL) -> Column:
    """Cast to the exact decimal working type."""
    return F.col(col).cast(typ) if isinstance(col, str) else col.cast(typ)


def dec_sum(col: Column | str, typ: str = DEFAULT_DECIMAL) -> Column:
    """Exact sum, returned as double (deterministic final conversion)."""
    return F.sum(dec(col, typ)).cast("double")


def dec_avg(col: Column | str, typ: str = DEFAULT_DECIMAL) -> Column:
    """Exact-sum average: decimal sum → double, / count — a single IEEE
    division, bitwise-reproducible anywhere. Divides by the NON-NULL
    count of the column (SQL AVG semantics) — dividing by COUNT(*) would
    silently deflate the average the moment a nullable column is
    averaged, diverging from any AVG-based oracle."""
    d = dec(col, typ)
    return F.sum(d).cast("double") / F.count(d)


def dec_sumsq(col: Column | str, typ: str = DEFAULT_DECIMAL) -> Column:
    """Exact sum of squares: a scale-2 decimal squared is scale-4 exact,
    and the decimal sum stays exact — the second moment for variance/
    stddev computed without float accumulation order entering anywhere.
    Returned as double (one deterministic final conversion)."""
    d = dec(col, typ)
    return F.sum(d * d).cast("double")


def dec_sumprod(
    a: Column | str, b: Column | str, typ: str = DEFAULT_DECIMAL
) -> Column:
    """Exact sum of pairwise products Σ aᵢ·bᵢ — two scale-2 decimals
    multiply to a scale-4 exact decimal, and the sum stays exact. The
    cross moment for covariance / correlation / least-squares slope,
    order-free like the other dec_* aggregates. Returned as double."""
    return F.sum(dec(a, typ) * dec(b, typ)).cast("double")


def _double_sql(x: float) -> str:
    """SQL double literal that round-trips ``x`` bitwise: ``repr`` emits
    the shortest decimal string that parses back to the same IEEE-754
    double, and both Python's and the JVM's parsers are correctly
    rounded, so the value survives the text hop exactly. Infinities and
    NaN are rejected — they have no portable SQL literal."""
    if x != x or x in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite literal not portable: {x}")
    return f"{x!r}D"


def lit_double_array(values) -> Column:
    """Literal ``array<double>`` built as ONE parsed SQL expression.

    ``F.array(*[F.lit(x) ...])`` costs a py4j round-trip per element —
    a 5-query × 16-subspace × 32-centroid ADC lookup table is 2,560
    driver calls, several SECONDS of plan construction before Spark
    sees a single row. One ``F.expr`` string parse builds the same
    constant-folded literal ~40× faster, values bitwise-identical via
    shortest-round-trip formatting (_double_sql)."""
    if not values:
        # bare array() types as array<string>; an empty TYPED literal
        # keeps callers' zip_with/array_position analysis-valid
        return F.expr("CAST(array() AS ARRAY<DOUBLE>)")
    return F.expr("array(" + ",".join(_double_sql(float(x)) for x in values) + ")")


def lit_double_matrix(rows) -> Column:
    """Literal ``array<array<double>>`` as one parsed expression — same
    rationale as lit_double_array, for codebooks / centroid tables /
    per-query vectors."""
    if not rows:
        return F.expr("CAST(array() AS ARRAY<ARRAY<DOUBLE>>)")
    inner = ",".join(
        "array(" + ",".join(_double_sql(float(x)) for x in row) + ")"
        if row
        else "CAST(array() AS ARRAY<DOUBLE>)"
        for row in rows
    )
    return F.expr(f"array({inner})")


def lit_long_array(values) -> Column:
    """Literal ``array<bigint>`` as one parsed expression (``L`` suffix)
    — same single-round-trip rationale as lit_double_array."""
    if not values:
        return F.expr("CAST(array() AS ARRAY<BIGINT>)")
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in values) + ")")
