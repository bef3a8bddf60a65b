"""Fixture-drift canary: load every testdata table and pin the logical
types the engine depends on. When the driver regenerates /root/testdata
with a different physical encoding (round 3: events.ts flipped from
TIMESTAMP(NANOS) to TIMESTAMP(MICROS)), this turns a 98-query mystery
outage into one obvious red line."""

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DateType,
    FloatType,
    IntegralType,
    StringType,
    TimestampNTZType,
)

from etl_manager_spark.workloads.tables import TABLE_NAMES, load_tables


def test_all_tables_load_and_key_types_hold(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    schemas = {name: t[name].schema for name in TABLE_NAMES}

    # events: ts must come out timestamp-like no matter the physical encoding
    ev = schemas["events"]
    assert isinstance(ev["ts"].dataType, TimestampNTZType), ev["ts"].dataType
    assert isinstance(ev["event_id"].dataType, IntegralType)
    assert isinstance(ev["user_id"].dataType, IntegralType)
    assert isinstance(ev["props"].dataType, StringType)

    # TPC-H-ish keys are integral; date columns are date-like (the fixture
    # has shipped both DATE and midnight-aligned TIMESTAMP encodings — both
    # are acceptable, anything else is drift to investigate)
    date_like = (DateType, TimestampNTZType)
    assert isinstance(schemas["orders"]["o_orderkey"].dataType, IntegralType)
    assert isinstance(schemas["orders"]["o_orderdate"].dataType, date_like)
    assert isinstance(schemas["lineitem"]["l_orderkey"].dataType, IntegralType)
    assert isinstance(schemas["lineitem"]["l_shipdate"].dataType, date_like)
    assert isinstance(schemas["customer"]["c_custkey"].dataType, IntegralType)

    # documents text + embeddings vector shapes
    assert isinstance(schemas["documents"]["text"].dataType, StringType)
    from pyspark.sql.types import NumericType

    emb = schemas["embeddings"]["embedding"].dataType
    assert isinstance(emb, ArrayType), emb
    assert isinstance(emb.elementType, NumericType), emb.elementType

    # every table must actually produce rows at sf0.001
    for name in TABLE_NAMES:
        assert t[name].limit(1).count() == 1, f"{name} is empty"


def test_events_ts_values_are_sane(spark, sf_dir):
    """Wrong-unit conversion (the silent 1000x corruption mode) lands
    timestamps in 1970; correct conversion lands in a plausible range."""
    import datetime

    t = load_tables(spark, sf_dir)
    row = t["events"].selectExpr("min(ts) AS lo", "max(ts) AS hi").first()
    assert row.lo.year >= 1990, f"ts too small (unit bug?): {row.lo}"
    assert row.hi.year <= 2100, f"ts too large (unit bug?): {row.hi}"
    assert isinstance(row.lo, datetime.datetime)


def test_lazy_tables_survive_one_broken_fixture(spark, tmp_path, sf_dir):
    """load_tables over a dir with a missing/corrupt table must still serve
    the tables that exist (the round-3 outage shape)."""
    import shutil

    for name in ("region", "nation"):
        shutil.copy(f"{sf_dir}/{name}.parquet", tmp_path / f"{name}.parquet")
    # events.parquet intentionally absent
    t = load_tables(spark, str(tmp_path))
    assert t["region"].count() > 0
    assert t["nation"].count() > 0
