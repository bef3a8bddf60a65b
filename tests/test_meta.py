"""TableMeta/DatabaseMeta behavior parity (reference test themes:
``tests/test_tests.py:320-784``) — fresh assertions, not copied tests."""

import json

import pytest

from etl_manager_spark import DatabaseMeta, TableMeta, read_database_folder
from etl_manager_spark.meta.io import read_table_json, table_from_dict
from etl_manager_spark.meta.table import MetadataError, MetaColumnTypeMismatch

EMPLOYEES = {
    "name": "employees",
    "description": "employee list",
    "data_format": "parquet",
    "location": "employees",
    "columns": [
        {"name": "employee_id", "type": "int", "description": "pk"},
        {"name": "employee_name", "type": "character", "description": ""},
        {"name": "employee_dob", "type": "date", "description": ""},
    ],
    "primary_key": ["employee_id"],
}

TEAMS = {
    "name": "teams",
    "description": "team membership snapshots",
    "data_format": "parquet",
    "location": "teams",
    "columns": [
        {"name": "team_id", "type": "int", "nullable": False},
        {"name": "team_name", "type": "character"},
        {
            "name": "employee_id",
            "type": "int",
            "pattern": r"\d+",
            "sensitivity": "personal_data",
            "redacted": False,
        },
        {"name": "snapshot_year", "type": "int"},
        {"name": "snapshot_month", "type": "int", "enum": list(range(1, 13))},
    ],
    "partitions": ["snapshot_year", "snapshot_month"],
    "primary_key": ["team_id"],
}


def make_db():
    db = DatabaseMeta(name="workforce", bucket="/tmp/warehouse/workforce")
    table_from_dict(EMPLOYEES, db)
    table_from_dict(TEAMS, db)
    return db


def test_round_trip_table_dict():
    t = table_from_dict(TEAMS)
    assert t.to_dict()["columns"] == TEAMS["columns"]
    assert t.to_dict()["partitions"] == ["snapshot_year", "snapshot_month"]
    assert table_from_dict(t.to_dict()).to_dict() == t.to_dict()


def test_partitions_forced_last():
    cols = [
        {"name": "snapshot_year", "type": "int"},
        {"name": "value", "type": "double"},
        {"name": "uid", "type": "long"},
    ]
    t = TableMeta(name="t", location="t", columns=cols, partitions=["snapshot_year"])
    assert t.column_names == ["value", "uid", "snapshot_year"]
    # adding a column keeps partitions last
    t.add_column("extra", "character")
    assert t.column_names == ["value", "uid", "extra", "snapshot_year"]


def test_add_remove_update_column():
    t = table_from_dict(EMPLOYEES)
    t.add_column("grade", "int", enum=[1, 2, 3], nullable=False)
    assert t.column_names[-1] == "grade"
    t.update_column("grade", type="long", description="pay grade")
    assert [c for c in t.columns if c["name"] == "grade"][0]["type"] == "long"
    t.remove_column("grade")
    assert "grade" not in t.column_names
    with pytest.raises(MetadataError):
        t.remove_column("grade")


def test_remove_column_cascades():
    t = table_from_dict(TEAMS)
    t.remove_column("snapshot_month")
    assert t.partitions == ["snapshot_year"]
    t.remove_column("team_id")
    assert t.primary_key == []


def test_reorder_columns_partitions_stay_last():
    t = table_from_dict(TEAMS)
    t.reorder_columns(
        ["team_name", "employee_id", "team_id", "snapshot_year", "snapshot_month"]
    )
    assert t.column_names[:3] == ["team_name", "employee_id", "team_id"]
    with pytest.raises(MetadataError):
        t.reorder_columns(
            ["snapshot_year", "team_name", "employee_id", "team_id", "snapshot_month"]
        )


def test_validation_failures():
    with pytest.raises(MetadataError):
        TableMeta(name="Bad-Name", location="x", columns=[])
    with pytest.raises(MetadataError):
        TableMeta(name="t", location="x", columns=[{"name": "a", "type": "string"}])
    with pytest.raises(MetadataError):
        TableMeta(
            name="t",
            location="x",
            columns=[{"name": "a", "type": "int"}, {"name": "a", "type": "int"}],
        )
    with pytest.raises(MetadataError):
        TableMeta(
            name="t",
            location="x",
            columns=[{"name": "a", "type": "int", "enum": "notalist"}],
        )
    with pytest.raises(MetadataError):
        TableMeta(
            name="t",
            location="x",
            columns=[{"name": "a", "type": "int"}],
            partitions=["missing"],
        )
    with pytest.raises(MetadataError):
        TableMeta(
            name="t",
            location="x",
            columns=[{"name": "a", "type": "int", "sensitivity": "top_secret"}],
        )


def test_redact_drop_mask_and_read_integration(tmp_path, spark):
    """Declared ``redacted`` flags are enforced: drop removes the columns,
    mask keeps the schema (string → '[REDACTED]', other types → typed NULL),
    and TableMeta.read(redact=...) applies it at the read boundary."""
    t = table_from_dict(TEAMS)
    t.update_column("employee_id", redacted=True)
    t.update_column("team_name", redacted=True)
    df = spark.createDataFrame(
        [(1, "alpha", 7, 2026, 1)],
        "team_id int, team_name string, employee_id int, snapshot_year int, snapshot_month int",
    )
    dropped = t.redact(df, mode="drop")
    assert dropped.columns == ["team_id", "snapshot_year", "snapshot_month"]

    masked = t.redact(df, mode="mask")
    assert masked.columns == df.columns  # schema preserved
    row = masked.collect()[0]
    assert row.team_name == "[REDACTED]"
    assert row.employee_id is None
    assert row.team_id == 1 and row.snapshot_year == 2026

    with pytest.raises(MetadataError, match="drop.*mask|mask.*drop"):
        t.redact(df, mode="scramble")

    # no-op when nothing is declared redacted
    t2 = table_from_dict(EMPLOYEES)
    assert t2.redact(df) is df

    # read-boundary integration (unpartitioned copy so a bare parquet
    # write round-trips)
    t3 = table_from_dict(
        {**TEAMS, "partitions": [], "name": "teams_flat", "location": "teams_flat"}
    )
    t3.update_column("employee_id", redacted=True)
    path = str(tmp_path / "teams_flat")
    t3.write(df, path)
    full = t3.read(spark, path)
    nonsensitive = t3.read(spark, path, redact="drop")
    assert "employee_id" in full.columns
    assert "employee_id" not in nonsensitive.columns
    assert nonsensitive.count() == 1


def test_sensitivity_derivation():
    t = table_from_dict(TEAMS)
    assert t.table_sensitivity == ["personal_data"]
    t.update_column("team_name", sensitivity="special_category_data")
    assert t.table_sensitivity == ["personal_data", "special_category_data"]


def test_cross_table_type_alignment():
    db = make_db()
    db.test_column_types_align()  # employee_id is int in both — passes
    db.table("teams").update_column("employee_id", type="long")
    with pytest.raises(MetaColumnTypeMismatch, match="employee_id"):
        db.test_column_types_align()
    db.test_column_types_align(exclude_tables=["teams"])


def test_duplicate_table_rejected():
    db = make_db()
    with pytest.raises(MetadataError):
        table_from_dict(EMPLOYEES, db)


def test_database_folder_round_trip(tmp_path):
    db = make_db()
    db.write_to_json(str(tmp_path / "database.json"))
    for t in db.tables:
        t.write_to_json(str(tmp_path / f"{t.name}.json"))
    db2 = read_database_folder(str(tmp_path))
    assert db2.table_names == ["employees", "teams"]
    assert db2.table("teams").to_dict() == db.table("teams").to_dict()


def test_glue_specific_header_skip_translation(tmp_path):
    # reference pay.json:19-28 — skip.header.line.count=1 via glue_specific
    pay = {
        "name": "pay",
        "data_format": "csv",
        "location": "pay",
        "columns": [
            {"name": "employee_id", "type": "int"},
            {"name": "annual_salary", "type": "float"},
        ],
        "glue_specific": {"Parameters": {"skip.header.line.count": "1"}},
    }
    path = tmp_path / "pay.json"
    path.write_text(json.dumps(pay))
    t = read_table_json(str(path))
    assert t.format_options == {"header": "true"}


def test_ddl_generation():
    db = make_db()
    ddl = db.table("teams").ddl()
    assert "CREATE TABLE workforce.teams" in ddl
    assert "PARTITIONED BY (`snapshot_year` int, `snapshot_month` int)" in ddl
    assert "LOCATION '/tmp/warehouse/workforce/teams'" in ddl
    assert "`team_id` int NOT NULL" in ddl
    # partition columns are not in the storage column list
    assert ddl.index("PARTITIONED BY") > ddl.index("USING parquet")


def test_markdown_doc():
    doc = make_db().table("teams").generate_markdown_doc()
    assert "| snapshot_month | int |" in doc
    assert "partition" in doc
    assert "sensitivity" in doc


def test_columns_setter_refuses_dropping_partition_or_pk():
    from etl_manager_spark.meta.table import MetadataError, TableMeta

    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[
            {"name": "a", "type": "int"},
            {"name": "year", "type": "int"},
        ],
        partitions=["year"],
    )
    import pytest as _pytest

    with _pytest.raises(MetadataError, match="partition column"):
        t.columns = [{"name": "a", "type": "int"}]
    # object not corrupted: partitions and schema still intact
    assert t.partitions == ["year"] and t.column_names == ["a", "year"]
    t2 = TableMeta(
        name="t2", location="t2", data_format="parquet",
        columns=[{"name": "pk", "type": "int"}, {"name": "v", "type": "int"}],
        primary_key=["pk"],
    )
    with _pytest.raises(MetadataError, match="primary-key"):
        t2.columns = [{"name": "v", "type": "int"}]


def test_partitions_setter_refuses_duplicates():
    from etl_manager_spark.meta.table import MetadataError, TableMeta

    t = TableMeta(
        name="t", location="t", data_format="parquet",
        columns=[{"name": "a", "type": "int"}, {"name": "y", "type": "int"}],
    )
    import pytest as _pytest

    with _pytest.raises(MetadataError, match="duplicate partition"):
        t.partitions = ["y", "y"]


def test_ddl_escapes_quotes_in_options():
    from etl_manager_spark.meta.table import TableMeta

    t = TableMeta(
        name="t", location="t", data_format="csv",
        columns=[{"name": "a", "type": "int"}],
        format_options={"quote": "'"},
    )

    class _Db:
        base_path = "/tmp/x"
        name = "db"

    t.database = _Db()
    ddl = t.ddl()
    assert "\\'" in ddl  # the quote option value is escaped
