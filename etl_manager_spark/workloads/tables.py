"""Testdata table loading (TESTDATA.md contract).

One quirk: ``events.parquet``'s ``ts`` physical encoding has drifted across
testdata generations — TIMESTAMP(NANOS) (which Spark 4 reads as a raw long
under ``spark.sql.legacy.parquet.nanosAsLong``) in some, TIMESTAMP(MICROS)
in others. A production engine must survive schema drift in a fixture, so
the loader is schema-adaptive: it inspects the type Spark actually resolved
and applies the nanos→µs narrowing (floor division — exactly what DuckDB's
ns→us narrowing does, verified bitwise at sf0.01) only when ``ts`` arrives
as a raw long; timestamp-typed data is just cast to TIMESTAMP_NTZ.
"""

from __future__ import annotations

import os
from collections.abc import Mapping
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


# DataFrame definitions are immutable logical plans — memoize them so 77
# workload calls don't redo driver-side file listing + footer schema reads
# per call. The entry stores the owning session and is identity-checked on
# hit, so a restarted session re-resolves instead of reusing a dead plan.
_table_cache: dict[tuple[str, str], tuple[SparkSession, DataFrame]] = {}


def adapt_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP_NTZ regardless of how the
    parquet encoded it. Raw long = nanos-as-long (legacy NANOS files read
    under ``nanosAsLong``) → floor-divide to µs; timestamp-typed input only
    needs the NTZ cast (session TZ is pinned UTC so values are identical).
    Shared by the batch loader and the streaming reader so the two paths
    cannot diverge when the fixture's physical encoding drifts again."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, LongType):
        converted = F.timestamp_micros(F.expr(f"{col} div 1000"))
    else:
        converted = F.col(col)
    if isinstance(dtype, TimestampNTZType):
        return df
    return df.withColumn(col, converted.cast("timestamp_ntz"))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (sf_dir, name)
    cached = _table_cache.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    if name == "events":
        # Harmless when ts is already TIMESTAMP(MICROS); required to read
        # legacy TIMESTAMP(NANOS) files at all.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = adapt_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _table_cache[key] = (spark, df)
    return df


class LazyTables(Mapping):
    """Per-table lazy view over the testdata catalog: a table's plan is
    built on first access, so one broken fixture file cannot ERR queries
    that never touch it (a 98-query outage from one drifted parquet footer
    in round 3 motivates this)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir

    def __getitem__(self, name: str) -> DataFrame:
        if name not in TABLE_NAMES:
            raise KeyError(name)
        return load_table(self._spark, self._sf_dir, name)

    def __iter__(self) -> Iterator[str]:
        return iter(TABLE_NAMES)

    def __len__(self) -> int:
        return len(TABLE_NAMES)


def load_tables(spark: SparkSession, sf_dir: str) -> LazyTables:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return LazyTables(spark, sf_dir)


_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
    "p": 1024**5,
    "pb": 1024**5,
}


def _size_conf(spark: SparkSession, key: str, default: int) -> int:
    """Read a byte-size session conf accepting Spark's size-suffix syntax
    ('128m', '4mb', '1g' — JavaUtils.byteStringAs units), not just bare
    ints; an unparseable value falls back to Spark's documented default
    rather than raising inside every workload that probes file splits."""
    raw = str(spark.conf.get(key, str(default))).strip().lower()
    try:
        return int(raw)
    except ValueError:
        pass
    for suf in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if raw.endswith(suf):
            try:
                return int(raw[: -len(suf)].strip()) * _SIZE_SUFFIXES[suf]
            except ValueError:
                break
    return default


def spread(df: DataFrame, spark: SparkSession, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a scan whose file layout yields fewer splits
    than the session parallelism. A parquet file with one row group cannot
    be split below one Spark partition, so per-row-heavy stages (interpreted
    HOFs, Arrow UDFs) over a small local file serialize onto one core — at
    sf0.1 ``documents.parquet`` is a single split and the profile/lang-id
    stages ran single-threaded. Guarded: at production scale the input
    arrives in many splits and this is a no-op (no shuffle).

    The probe replays Spark's FilePartition math over ``df.inputFiles()``
    plus local file sizes (plan metadata + stat calls — never the RDD
    conversion ``df.rdd.getNumPartitions()`` forces): maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, bytesPerCore)), splits ≈
    padded-total / maxSplitBytes. A raw file COUNT would be wrong in both
    directions — many small files pack into few task partitions (probe
    must still repartition), one big file splits into many (probe must
    not add a full-table exchange). Non-local URIs (no cheap stat) are
    treated as already-spread: at scale not shuffling is the safe side."""
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 - non-scan plan → assume spread needed
        files = []
    sizes = []
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        if path.startswith(("s3", "hdfs", "abfs", "gs", "wasb")) or "://" in path:
            return df  # remote storage → production layout, leave it alone
        try:
            sizes.append(os.path.getsize(path))
        except OSError:
            return df
    if files:
        open_cost = _size_conf(
            spark, "spark.sql.files.openCostInBytes", 4 * 1024 * 1024
        )
        max_part = _size_conf(
            spark, "spark.sql.files.maxPartitionBytes", 128 * 1024 * 1024
        )
        padded = sum(s + open_cost for s in sizes)
        bytes_per_core = max(
            1, padded // spark.sparkContext.defaultParallelism
        )
        max_split = min(max_part, max(open_cost, bytes_per_core))
        n_splits = max(1, -(-padded // max_split))
    else:
        n_splits = 0
    if n_splits >= target:
        return df
    return df.repartition(target)
