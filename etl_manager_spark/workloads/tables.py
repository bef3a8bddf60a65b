"""Testdata table loading (TESTDATA.md contract).

One quirk: ``events.parquet`` stores TIMESTAMP(NANOS) which Spark 4 refuses
by default; we read it with ``spark.sql.legacy.parquet.nanosAsLong`` and
convert nanos → microsecond TIMESTAMP_NTZ (floor division — exactly what
DuckDB's ns→us narrowing does, verified bitwise at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
