"""Unit tests for sources/evolution.py — schema-drift-tolerant reads."""

import datetime

import pytest
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

from etl_manager_spark.sources.evolution import (
    conform_to_schema,
    merge_schemas,
    read_parquet_evolved,
)


def test_merge_widens_and_unions_first_seen_order():
    a = StructType(
        [
            StructField("id", IntegerType()),
            StructField("x", FloatType()),
        ]
    )
    b = StructType(
        [
            StructField("id", LongType()),
            StructField("x", DoubleType()),
            StructField("extra", StringType()),
        ]
    )
    merged = merge_schemas([a, b])
    assert [f.name for f in merged.fields] == ["id", "x", "extra"]
    assert isinstance(merged["id"].dataType, LongType)
    assert isinstance(merged["x"].dataType, DoubleType)
    assert all(f.nullable for f in merged.fields)


def test_merge_rejects_incompatible_drift():
    a = StructType([StructField("c", StringType())])
    b = StructType([StructField("c", LongType())])
    with pytest.raises(TypeError, match="incompatible"):
        merge_schemas([a, b])


def test_conform_fills_missing_with_typed_null(spark):
    df = spark.createDataFrame([(1,)], "id long")
    target = StructType(
        [StructField("id", LongType()), StructField("tag", StringType())]
    )
    row = conform_to_schema(df, target).collect()[0]
    assert row.id == 1 and row.tag is None


def test_read_evolved_reunifies_drifted_batches(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0, 123456)
    t1 = datetime.datetime(2024, 1, 2, 13, 30, 0, 654321)
    t0_nanos = (
        (t0 - datetime.datetime(1970, 1, 1)) // datetime.timedelta(microseconds=1)
    ) * 1000
    legacy = spark.createDataFrame([(1, t0_nanos, 7)], "id long, ts long, v int")
    new = spark.createDataFrame(
        [(2, t1, 9, "added")], "id long, ts timestamp_ntz, v long, note string"
    )
    p_legacy, p_new = str(tmp_path / "legacy"), str(tmp_path / "new")
    legacy.write.parquet(p_legacy)
    new.write.parquet(p_new)

    out = read_parquet_evolved(spark, [p_legacy, p_new], ts_columns=("ts",))
    assert isinstance(out.schema["ts"].dataType, TimestampNTZType)
    assert isinstance(out.schema["v"].dataType, LongType)
    rows = {r.id: r for r in out.collect()}
    assert rows[1].ts == t0 and rows[1].v == 7 and rows[1].note is None
    assert rows[2].ts == t1 and rows[2].v == 9 and rows[2].note == "added"


def test_read_evolved_rejects_empty_path_list(spark):
    with pytest.raises(ValueError, match="no batch paths"):
        read_parquet_evolved(spark, [])


def test_conform_ntz_to_tz_requires_utc_session(spark):
    """NTZ→tz-aware TIMESTAMP is only a widening under UTC; any other
    session zone must raise instead of silently shifting wall clocks."""
    from pyspark.sql.types import StructField, StructType, TimestampType

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1, 12, 0, 0))],
        "id long, ts timestamp_ntz",
    )
    target = StructType(
        [df.schema["id"], StructField("ts", TimestampType(), True)]
    )
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(TypeError, match="session timezone"):
            conform_to_schema(df, target)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    # under UTC the cast is a pure widening and proceeds
    row = conform_to_schema(df, target).collect()[0]
    assert row.id == 1


def test_merge_schemas_unifies_case_drift():
    """A column spelled TS in one generation and ts in the next is ONE
    column (Spark resolves case-insensitively); keying by exact name made
    the downstream union fail with COLUMN_ALREADY_EXISTS."""
    a = StructType([StructField("id", LongType()), StructField("TS", LongType())])
    b = StructType([StructField("id", LongType()), StructField("ts", LongType())])
    merged = merge_schemas([a, b])
    assert [f.name for f in merged.fields] == ["id", "TS"]  # first-seen spelling


def test_read_evolved_absorbs_case_drift(spark, tmp_path):
    spark.createDataFrame([(1, 10)], "id long, TS long").write.parquet(
        str(tmp_path / "c1")
    )
    spark.createDataFrame([(2, 20)], "id long, ts long").write.parquet(
        str(tmp_path / "c2")
    )
    out = read_parquet_evolved(spark, [str(tmp_path / "c1"), str(tmp_path / "c2")])
    assert out.columns == ["id", "TS"]
    assert sorted(tuple(r) for r in out.collect()) == [(1, 10), (2, 20)]


def test_conform_rejects_narrowing_target(spark):
    """An explicit target narrower than the data must fail at plan time
    with a clear error — the cast would wrap under non-ANSI sessions or
    throw per-row CAST_OVERFLOW at runtime under ANSI."""
    df = spark.createDataFrame([(2**40,)], "v long")
    tgt = StructType([StructField("v", IntegerType())])
    with pytest.raises(TypeError, match="narrower"):
        conform_to_schema(df, tgt)


def test_conform_resolves_source_case_insensitively(spark):
    df = spark.createDataFrame([(7,)], "TS long")
    tgt = StructType([StructField("ts", LongType())])
    out = conform_to_schema(df, tgt)
    assert out.columns == ["ts"]
    assert out.collect()[0][0] == 7
