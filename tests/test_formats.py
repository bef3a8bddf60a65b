"""Per-format write→read round-trips through TableMeta (SURVEY §2.B):
parquet, orc, avro, json-lines, headerless CSV, quoted CSV (all-string then
cast), header-skip override, regex scan."""

import os

import pytest
from pyspark.sql import Row

from etl_manager_spark import TableMeta

BASE_COLUMNS = [
    {"name": "id", "type": "int"},
    {"name": "name", "type": "character"},
    {"name": "score", "type": "double"},
]

ROWS = [Row(id=1, name="ann", score=1.5), Row(id=2, name="bob", score=2.25)]


@pytest.mark.parametrize("fmt", ["parquet", "orc", "avro", "json", "csv"])
def test_round_trip(fmt, spark, tmp_path):
    t = TableMeta(name="t", location="t", data_format=fmt, columns=BASE_COLUMNS)
    df = spark.createDataFrame(ROWS)
    path = str(tmp_path / fmt)
    try:
        t.write(df, path, mode="overwrite")
    except Exception as exc:  # noqa: BLE001
        if fmt == "avro" and "Failed to find data source: avro" in str(exc):
            # spark-avro is an external module; this environment's pyspark
            # ships without the connector jar. The reader/writer mapping is
            # still exercised wherever the jar is present.
            pytest.skip("spark-avro connector jar not on classpath")
        raise
    back = t.read(spark, path)
    assert back.schema == t.data_schema
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "ann", 1.5),
        (2, "bob", 2.25),
    ]


def test_par_alias_round_trip(spark, tmp_path):
    """The reference's type grammar lists ``par`` as a parquet alias
    (reference specs/table_schema.json:113): a `par`-declared table must
    write real parquet files and read back identically."""
    t = TableMeta(name="t", location="t", data_format="par", columns=BASE_COLUMNS)
    assert t.data_format == "parquet"  # normalized at construction
    df = spark.createDataFrame(ROWS)
    path = tmp_path / "par"
    t.write(df, str(path), mode="overwrite")
    assert any(f.endswith(".parquet") for f in os.listdir(path)), (
        "par alias must produce parquet data files"
    )
    back = t.read(spark, str(path))
    assert back.schema == t.data_schema
    assert sorted((r.id, r.name, r.score) for r in back.collect()) == [
        (1, "ann", 1.5),
        (2, "bob", 2.25),
    ]


def test_csv_quoted_all_string_then_cast(spark, tmp_path):
    # OpenCSVSerDe parity: quoted fields with embedded delimiters
    path = tmp_path / "quoted"
    path.mkdir()
    (path / "data.csv").write_text('1,"smith, ann",1.5\n2,"o\'brien, bob",2.25\n')
    t = TableMeta(
        name="t", location="t", data_format="csv_quoted_nodate", columns=BASE_COLUMNS
    )
    rows = sorted((r.id, r.name, r.score) for r in t.read(spark, str(path)).collect())
    assert rows == [(1, "smith, ann", 1.5), (2, "o'brien, bob", 2.25)]


def test_csv_header_skip_override(spark, tmp_path):
    path = tmp_path / "hdr"
    path.mkdir()
    (path / "data.csv").write_text("id,name,score\n1,ann,1.5\n")
    t = TableMeta(
        name="t",
        location="t",
        data_format="csv",
        columns=BASE_COLUMNS,
        format_options={"header": "true"},
    )
    assert t.read(spark, str(path)).collect() == [Row(id=1, name="ann", score=1.5)]


def test_regex_scan(spark, tmp_path):
    path = tmp_path / "logs"
    path.mkdir()
    (path / "a.log").write_text("127.0.0.1 GET /index 200\n10.0.0.5 POST /api 503\n")
    t = TableMeta(
        name="logs",
        location="logs",
        data_format="regex",
        columns=[
            {"name": "ip", "type": "character"},
            {"name": "verb", "type": "character"},
            {"name": "path", "type": "character"},
            {"name": "status", "type": "int"},
        ],
        format_options={"input.regex": r"(\S+) (\S+) (\S+) (\d+)"},
    )
    rows = sorted((r.ip, r.verb, r.status) for r in t.read(spark, str(path)).collect())
    assert rows == [("10.0.0.5", "POST", 503), ("127.0.0.1", "GET", 200)]


def test_partitioned_write_layout_and_read(spark, tmp_path):
    t = TableMeta(
        name="t",
        location="t",
        data_format="parquet",
        columns=BASE_COLUMNS + [{"name": "year", "type": "int"}],
        partitions=["year"],
    )
    df = spark.createDataFrame(
        [Row(id=1, name="a", score=0.5, year=2023), Row(id=2, name="b", score=1.0, year=2024)]
    )
    path = str(tmp_path / "part")
    t.write(df, path, mode="overwrite")
    assert sorted(d for d in os.listdir(path) if d.startswith("year=")) == [
        "year=2023",
        "year=2024",
    ]
    back = t.read(spark, path)
    # declared order with partition column last, cast to declared int type
    assert back.columns == ["id", "name", "score", "year"]
    assert dict((r.id, r.year) for r in back.collect()) == {1: 2023, 2: 2024}


def test_nested_types_round_trip(spark, tmp_path):
    t = TableMeta(
        name="nested",
        location="nested",
        data_format="parquet",
        columns=[
            {"name": "entity_id", "type": "int"},
            {"name": "test_array", "type": "array<int>"},
            {"name": "test_struct", "type": "struct<num:int,desc:character>"},
            {"name": "test_decimal", "type": "decimal(38,0)"},
        ],
    )
    from decimal import Decimal

    df = spark.createDataFrame(
        [(1, [1, 2], (7, "x"), Decimal(12345678901234567890))], t.spark_schema
    )
    path = str(tmp_path / "nested")
    t.write(df, path, mode="overwrite")
    row = t.read(spark, path).collect()[0]
    assert row.test_array == [1, 2]
    assert row.test_struct.num == 7 and row.test_struct.desc == "x"
    assert int(row.test_decimal) == 12345678901234567890


def test_overwrite_partitions_dynamic(spark, tmp_path):
    from etl_manager_spark.sources.writers import overwrite_partitions, write_table

    t = TableMeta(
        name="t",
        location="t",
        data_format="parquet",
        columns=BASE_COLUMNS + [{"name": "day", "type": "character"}],
        partitions=["day"],
    )
    path = str(tmp_path / "dynpart")
    full = spark.createDataFrame(
        [
            Row(id=1, name="ann", score=1.5, day="d1"),
            Row(id=2, name="bob", score=2.25, day="d2"),
            Row(id=3, name="cat", score=3.0, day="d2"),
        ]
    )
    write_table(full, t, path, mode="overwrite")

    # rewrite ONLY d2 with one replacement row
    patch = spark.createDataFrame([Row(id=9, name="zed", score=9.0, day="d2")])
    overwrite_partitions(patch, t, path)

    back = sorted((r.id, r.day) for r in t.read(spark, path).collect())
    assert back == [(1, "d1"), (9, "d2")]  # d1 untouched, d2 replaced
    # session default restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        != "dynamic"
    )


def test_overwrite_partitions_requires_partitions(spark, tmp_path):
    from etl_manager_spark.sources.writers import overwrite_partitions

    t = TableMeta(name="t", location="t", data_format="parquet", columns=BASE_COLUMNS)
    with pytest.raises(ValueError, match="partitioned"):
        overwrite_partitions(spark.createDataFrame(ROWS), t, str(tmp_path / "x"))


def test_fixedwidth_read_trim_cast_and_refusals(spark, tmp_path):
    from etl_manager_spark.meta.table import TableMeta

    lines = [
        "1           alpha   12.5                ",
        "23          beta    -0.25               ",
    ]
    src = tmp_path / "fw"
    src.mkdir()
    (src / "part-0.txt").write_text("\n".join(lines) + "\n")
    meta = TableMeta(
        name="fw",
        location="fw",
        data_format="fixedwidth",
        columns=[
            {"name": "id", "type": "long"},
            {"name": "tag", "type": "character"},
            {"name": "val", "type": "double"},
        ],
        format_options={"widths": "12,8,20"},
    )
    rows = {r["id"]: (r["tag"], r["val"]) for r in meta.read(spark, str(src)).collect()}
    assert rows == {1: ("alpha", 12.5), 23: ("beta", -0.25)}

    import pytest as _pytest

    bad = TableMeta(
        name="fw2", location="fw2", data_format="fixedwidth",
        columns=[{"name": "id", "type": "long"}],
        format_options={"widths": "12,8"},
    )
    with _pytest.raises(ValueError, match="one width per declared column"):
        bad.read(spark, str(src))

    from etl_manager_spark.sources.writers import write_table

    with _pytest.raises(ValueError, match="read-only"):
        write_table(spark.range(1), meta, str(tmp_path / "out"))


@pytest.mark.parametrize("fmt", ["csv_quoted_nodate", "regex", "fixedwidth"])
def test_text_formats_keep_partition_columns(fmt, spark, tmp_path):
    """Text-derived formats must surface Hive-style partition columns like
    the columnar ones do — the early-return projections used to drop them."""
    cols = [
        {"name": "id", "type": "int"},
        {"name": "name", "type": "character"},
        {"name": "year", "type": "int"},
    ]
    opts = {}
    if fmt == "regex":
        opts = {"format_options": {"input.regex": "^([0-9]+),(\\w+)$"}}
    elif fmt == "fixedwidth":
        opts = {"format_options": {"widths": "3,5"}}
    t = TableMeta(
        name="t", location="t", data_format=fmt, columns=cols,
        partitions=["year"], **opts,
    )
    base = tmp_path / fmt
    for year, rows in [(2023, ["1,ann"]), (2024, ["2,bob"])]:
        d = base / f"year={year}"
        d.mkdir(parents=True)
        if fmt == "fixedwidth":
            rows = [r.replace(",", "").ljust(8) for r in
                    [f"{r.split(',')[0]:<3}{r.split(',')[1]:<5}" for r in rows]]
        (d / "part-0.txt" if fmt != "csv_quoted_nodate" else d / "part-0.csv").write_text(
            "\n".join(rows) + "\n"
        )
    back = t.read(spark, str(base))
    assert "year" in back.columns, back.columns
    got = sorted((r.id, r.name, r.year) for r in back.collect())
    assert got == [(1, "ann", 2023), (2, "bob", 2024)]


def test_regex_nonmatching_line_yields_null_row(spark, tmp_path):
    """RegexSerDe parity: a line that does not match the pattern yields a
    NULL row — regexp_extract alone returns '', which under ANSI killed
    the whole read when cast to int."""
    t = TableMeta(
        name="t", location="t", data_format="regex",
        columns=[{"name": "status", "type": "int"},
                 {"name": "msg", "type": "character"}],
        format_options={"input.regex": "^([0-9]+) (\\w+)$"},
    )
    p = tmp_path / "log"
    p.mkdir()
    (p / "a.txt").write_text("200 ok\nMALFORMED LINE !!\n404 missing\n")
    got = sorted(
        ((r.status, r.msg) for r in t.read(spark, str(p)).collect()),
        key=lambda x: (x[0] is None, x),
    )
    assert got == [(200, "ok"), (404, "missing"), (None, None)]


def test_parquet_read_conforms_declared_schema(spark, tmp_path):
    """Read-side conform: a declared nullable column missing from older
    files is filled with typed nulls; a missing non-nullable column is an
    error; present columns cast to declared types."""
    old = spark.createDataFrame([Row(id=1, name="ann")])
    p = str(tmp_path / "t")
    old.write.parquet(p)
    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[
            {"name": "id", "type": "int"},
            {"name": "name", "type": "character"},
            {"name": "score", "type": "double", "nullable": True},
        ],
    )
    back = t.read(spark, p)
    assert back.schema["score"].dataType.simpleString() == "double"
    assert [r.score for r in back.collect()] == [None]
    t2 = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[
            {"name": "id", "type": "int"},
            {"name": "missing_hard", "type": "int", "nullable": False},
        ],
    )
    with pytest.raises(ValueError, match="non-nullable"):
        t2.read(spark, p)


def test_parquet_read_survives_column_case_drift(spark, tmp_path):
    """A file column 'ID' must satisfy a declared 'id' (case-insensitive,
    like Spark's own resolution and the write-side conform()) — the old
    case-sensitive check branched to "absent" and withColumn's resolver
    then REPLACED the real data with typed nulls."""
    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.readers import read_table

    p = str(tmp_path / "drift")
    spark.createDataFrame([(1, "x")], "ID long, VAL string").write.parquet(p)
    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "id", "type": "long"},
                 {"name": "val", "type": "character"}],
    )
    rows = read_table(spark, t, p).collect()
    assert rows == [__import__("pyspark").sql.Row(id=1, val="x")]
    # partitioned variant: the recovered partition dir column survives
    p2 = str(tmp_path / "driftp")
    spark.createDataFrame(
        [(1, "x", "a")], "ID long, VAL string, day string"
    ).write.partitionBy("day").parquet(p2)
    t2 = TableMeta(
        name="t2", location="t2", data_format="parquet",
        columns=[{"name": "id", "type": "long"},
                 {"name": "val", "type": "character"},
                 {"name": "day", "type": "character"}],
        partitions=["day"],
    )
    r2 = read_table(spark, t2, p2).collect()
    assert [(r.id, r.val, r.day) for r in r2] == [(1, "x", "a")]


def test_parquet_read_rejects_case_ambiguous_file_columns(spark, tmp_path):
    import pytest as _pytest

    from etl_manager_spark import TableMeta
    from etl_manager_spark.meta.table import MetadataError
    from etl_manager_spark.sources.readers import read_table

    # Spark itself refuses to WRITE case-duplicate columns
    # (COLUMN_ALREADY_EXISTS); other writers don't — craft the file with
    # pyarrow, the way such files arrive in practice
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "ambig")
    os.makedirs(p)
    pq.write_table(
        pa.table({"ID": [1], "id": [2]}), os.path.join(p, "part-0.parquet")
    )
    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "id", "type": "long"}],
    )
    # Spark's parquet reader itself refuses case-duplicate columns under
    # caseSensitive=false (COLUMN_ALREADY_EXISTS); read_table's own
    # MetadataError covers case-sensitive sessions. Either way: refused,
    # never silently resolved.
    from pyspark.errors.exceptions.captured import AnalysisException

    with _pytest.raises(
        (MetadataError, AnalysisException), match="ambiguous|already exists"
    ):
        read_table(spark, t, p).collect()


def test_regex_requires_full_line_match(spark, tmp_path):
    """Hive/Athena RegexSerDe uses Matcher.matches(): a line the pattern
    matches only PARTIALLY is an all-NULL row. find()-semantics rlike/
    regexp_extract would instead accept (and extract from) the first
    partial match."""
    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.readers import read_table

    d = tmp_path / "rx"
    d.mkdir()
    (d / "f.txt").write_text("12-ab\n99-zz TRAILING\nnomatch\n")
    t = TableMeta(
        name="r", location="r", data_format="regex",
        columns=[{"name": "n", "type": "int"},
                 {"name": "w", "type": "character"}],
        format_options={"input.regex": r"(\d+)-(\w+)"},
    )
    rows = sorted(
        [(r.n, r.w) for r in read_table(spark, t, str(d)).collect()],
        key=str,
    )
    assert rows == [(12, "ab"), (None, None), (None, None)]
    # an already-anchored pattern behaves identically (the non-capturing
    # wrap preserves group numbering)
    t2 = TableMeta(
        name="r2", location="r2", data_format="regex",
        columns=[{"name": "n", "type": "int"},
                 {"name": "w", "type": "character"}],
        format_options={"input.regex": r"^(\d+)-(\w+)$"},
    )
    rows2 = sorted(
        [(r.n, r.w) for r in read_table(spark, t2, str(d)).collect()],
        key=str,
    )
    assert rows2 == rows


def test_partition_column_case_drift_is_resolved(spark, tmp_path):
    """Partition directories written as DAY=... must satisfy a declared
    'day' partition — the same case-insensitive resolution as data
    columns, or the recovered partition column silently vanishes from
    the declared-order select."""
    import shutil

    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.readers import read_table

    p = tmp_path / "pcase"
    spark.createDataFrame(
        [(1, "x", "a"), (2, "y", "b")], "id long, val string, DAY string"
    ).write.partitionBy("DAY").parquet(str(p))
    # sanity: directories really are DAY=...
    assert any(d.name.startswith("DAY=") for d in p.iterdir())
    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "id", "type": "long"},
                 {"name": "val", "type": "character"},
                 {"name": "day", "type": "character"}],
        partitions=["day"],
    )
    rows = sorted(
        [(r.id, r.val, r.day) for r in read_table(spark, t, str(p)).collect()]
    )
    assert rows == [(1, "x", "a"), (2, "y", "b")]
    shutil.rmtree(p)


def test_extra_file_column_with_dot_in_name_is_readable(spark, tmp_path):
    """An undeclared file column literally named 'a.b' must be pruned,
    not parsed as struct access (which breaks the whole read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.readers import read_table

    p = tmp_path / "dotcol"
    p.mkdir()
    pq.write_table(
        pa.table({"id": [1, 2], "price.usd": [9.5, 7.25]}),
        str(p / "part-0.parquet"),
    )
    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "id", "type": "long"}],
    )
    out = read_table(spark, t, str(p))
    assert out.columns == ["id"]
    assert sorted(r.id for r in out.collect()) == [1, 2]


def test_regex_nonparticipating_group_is_null(spark, tmp_path):
    """RegexSerDe parity: Matcher.group(i) is null for a non-participating
    optional group, so the column is NULL — including string columns,
    where regexp_extract alone would yield ''."""
    from etl_manager_spark import TableMeta
    from etl_manager_spark.sources.readers import read_table

    d = tmp_path / "optg"
    d.mkdir()
    (d / "f.txt").write_text("12-ab\n34\n")
    t = TableMeta(
        name="r", location="r", data_format="regex",
        columns=[{"name": "n", "type": "int"},
                 {"name": "w", "type": "character"}],
        format_options={"input.regex": r"(\d+)(?:-(\w+))?"},
    )
    rows = sorted(
        [(r.n, r.w) for r in read_table(spark, t, str(d)).collect()],
        key=str,
    )
    assert rows == [(12, "ab"), (34, None)]
