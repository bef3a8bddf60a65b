"""Constraint-enforcement report (the reference declares but never enforces;
we make enforcement optional and observable)."""

from etl_manager_spark import TableMeta
from etl_manager_spark.validation import validate


def test_validate_reports_all_violation_kinds(spark):
    t = TableMeta(
        name="people",
        location="people",
        columns=[
            {"name": "pid", "type": "int", "nullable": False},
            {"name": "grade", "type": "int", "enum": [1, 2, 3]},
            {"name": "code", "type": "character", "pattern": r"[a-z]{3}"},
        ],
        primary_key=["pid"],
    )
    df = spark.createDataFrame(
        [
            (1, 1, "abc"),
            (1, 2, "abc"),   # duplicate pk
            (None, 9, "ABC"),  # null pk + bad enum + bad pattern
            (3, None, None),   # nulls in nullable cols are fine
        ],
        "pid int, grade int, code string",
    )
    report = validate(df, t)
    assert not report.ok
    assert report.row_count == 4
    assert report.violations["pid.nullable"] == 1
    assert report.violations["grade.enum"] == 1
    assert report.violations["code.pattern"] == 1
    assert report.violations["primary_key"] == 1


def test_validate_clean_data_ok(spark):
    t = TableMeta(
        name="clean",
        location="clean",
        columns=[{"name": "pid", "type": "int", "nullable": False}],
        primary_key=["pid"],
    )
    df = spark.createDataFrame([(1,), (2,)], "pid int")
    report = validate(df, t)
    assert report.ok and report.row_count == 2
