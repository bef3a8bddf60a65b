"""Schema-evolution-tolerant parquet reading.

A long-lived table accumulates batches written under different schema
generations: columns added, integer widths widened, event-time columns
re-encoded (this repo's testdata itself drifted TIMESTAMP(NANOS) →
TIMESTAMP(MICROS) between generations and bricked a hardcoded reader —
see workloads/tables.py). A production engine must read the union of
generations as ONE table, not error on the oldest file.

``read_parquet_evolved`` reads each batch, normalizes designated
event-time columns (raw-long nanos or any timestamp flavor →
TIMESTAMP_NTZ via the shared ``adapt_ts``), widens numerics to the
widest width observed across batches, fills columns missing from old
batches with NULL, and unions by name. Incompatible drift (string vs
numeric) raises instead of silently coercing.

Scale: per-batch conformance is a projection (no shuffle); the union is
a plan-level concatenation, so the result scans all files in one stage
with partition-level parallelism — identical cost to reading a single
homogeneous table.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from etl_manager_spark.workloads.tables import adapt_ts

# widening lattice: a type may be promoted to any type later in its chain
_NUMERIC_RANK: list[type[DataType]] = [ShortType, IntegerType, LongType]
_FLOAT_RANK: list[type[DataType]] = [FloatType, DoubleType]
_TS_RANK: list[type[DataType]] = [DateType, TimestampNTZType, TimestampType]


def _rank(t: DataType) -> tuple[str, int] | None:
    for family, chain in (
        ("int", _NUMERIC_RANK),
        ("float", _FLOAT_RANK),
        ("ts", _TS_RANK),
    ):
        for i, cls in enumerate(chain):
            if isinstance(t, cls):
                return family, i
    return None


def _widest(a: DataType, b: DataType) -> DataType:
    if a == b:
        return a
    ra, rb = _rank(a), _rank(b)
    if ra is None or rb is None or ra[0] != rb[0]:
        raise TypeError(f"incompatible schema drift: {a} vs {b}")
    return a if ra[1] >= rb[1] else b


def merge_schemas(schemas: list[StructType]) -> StructType:
    """Union of fields across batch schemas, first-seen order, each at
    its widest observed type; every field nullable (old batches lack the
    new columns).

    Names are merged case-insensitively (first-seen spelling wins) —
    Spark's analyzer resolves case-insensitively by default, and a batch
    written as ``TS`` next to one written as ``ts`` is the same column a
    generation apart, not two columns (keying by exact name made the
    downstream union fail with COLUMN_ALREADY_EXISTS)."""
    spelling: dict[str, str] = {}
    out: dict[str, DataType] = {}
    for schema in schemas:
        for f in schema.fields:
            low = f.name.lower()
            name = spelling.setdefault(low, f.name)
            out[name] = (
                _widest(out[name], f.dataType) if name in out else f.dataType
            )
    return StructType([StructField(n, t, True) for n, t in out.items()])


def conform_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: cast present columns (widening
    only — the merge already guaranteed compatibility), fill missing
    with typed NULLs. Pure projection, no shuffle.

    A Date/TIMESTAMP_NTZ → TIMESTAMP (tz-aware) cast is only a pure
    widening when the session timezone is UTC — otherwise Spark
    reinterprets the wall clock through the session zone and silently
    shifts every value. ``read_parquet_evolved`` pins UTC before calling
    here; direct callers get an explicit error instead of shifted data."""
    src_types = {f.name: f.dataType for f in df.schema.fields}
    src_types_lower = {f.name.lower(): f.dataType for f in df.schema.fields}
    needs_utc = any(
        isinstance(f.dataType, TimestampType)
        and isinstance(
            src_types_lower.get(f.name.lower()), (DateType, TimestampNTZType)
        )
        for f in target.fields
    )
    if needs_utc:
        tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            raise TypeError(
                "conform_to_schema: casting DATE/TIMESTAMP_NTZ to tz-aware "
                f"TIMESTAMP under session timezone {tz!r} would shift wall "
                "clocks; set spark.sql.session.timeZone=UTC first (or keep "
                "the target column TIMESTAMP_NTZ)"
            )
    from etl_manager_spark.sources.resolve import quoted, resolve_columns

    # case-insensitive source resolution (same rule as the read/write
    # conform paths — resolve.py): a batch spelling the column `TS` still
    # feeds a target field named `ts`; truly ambiguous duplicate
    # spellings raise instead of resolving by iteration order
    by_lower = resolve_columns(
        df.columns, [f.name for f in target.fields], "conform_to_schema"
    )
    cols = []
    for f in target.fields:
        src = by_lower.get(f.name.lower())
        if src is not None:
            src_t = src_types[src]
            if src_t != f.dataType:
                # refuse NARROWING: an explicit target narrower than the
                # data would wrap (non-ANSI) or fail per-row at runtime
                # (ANSI CAST_OVERFLOW) — surface it at plan time instead.
                # _widest also raises on cross-family drift (string vs
                # numeric), keeping this cast widening-only as documented.
                if _widest(src_t, f.dataType) != f.dataType:
                    raise TypeError(
                        f"conform_to_schema: target type {f.dataType} for "
                        f"column {f.name!r} is narrower than the data's "
                        f"{src_t} — widening casts only"
                    )
            cols.append(F.col(quoted(src)).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_parquet_evolved(
    spark: SparkSession,
    paths: list[str],
    ts_columns: tuple[str, ...] = (),
    target: StructType | None = None,
) -> DataFrame:
    """Read heterogeneous parquet batches as one conformed DataFrame.

    ``ts_columns`` names event-time columns that may appear as raw-long
    nanos (legacy NANOS encoding read under ``nanosAsLong``) or any
    timestamp flavor — each is normalized to TIMESTAMP_NTZ before schema
    merging. Pass ``target`` to pin the output schema explicitly (e.g.
    from the table's declared metadata); otherwise it is inferred as the
    widest union across the batches."""
    if not paths:
        raise ValueError(
            "read_parquet_evolved: no batch paths given (empty listing?)"
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # adapt_ts's raw-long→NTZ conversion renders the instant in the
    # SESSION timezone; pin UTC (same contract as workloads/tables) so a
    # legacy nanos batch and an NTZ batch land on the same wall clock.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    dfs = []
    for p in paths:
        df = spark.read.parquet(p)
        for c in ts_columns:
            if c in df.columns:
                df = adapt_ts(df, c)
        dfs.append(df)
    if target is None:
        target = merge_schemas([df.schema for df in dfs])
    return reduce(
        DataFrame.unionByName, [conform_to_schema(df, target) for df in dfs]
    )
