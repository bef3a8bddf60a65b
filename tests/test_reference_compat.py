"""The reference's own example metadata must load unchanged (SURVEY §7
guiding decision: keep the agnostic metadata format compatible)."""

import os

import pytest

from etl_manager_spark import read_database_folder

REF_DB1 = "/root/reference/example/meta_data/db1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DB1), reason="reference example metadata not present"
)


def test_reference_db1_loads():
    db = read_database_folder(REF_DB1)
    assert db.name == "workforce"
    assert db.bucket == "my-bucket"
    assert db.base_folder == "database/database1"
    assert sorted(db.table_names) == ["employees", "pay", "teams"]


def test_reference_teams_table_semantics():
    db = read_database_folder(REF_DB1)
    teams = db.table("teams")
    assert teams.partitions == ["snapshot_year", "snapshot_month"]
    assert teams.primary_key == ["team_id"]
    # partitions forced last (reference meta.py:166-176)
    assert teams.column_names[-2:] == ["snapshot_year", "snapshot_month"]
    assert teams.table_sensitivity == ["personal_data"]
    schema = teams.spark_schema
    assert schema["team_id"].nullable is False
    assert schema["snapshot_month"].metadata["enum"] == list(range(1, 13))


def test_reference_glue_specific_header_skip():
    db = read_database_folder(REF_DB1)
    pay = db.table("pay")
    assert pay.data_format == "csv"
    assert pay.format_options == {"header": "true"}


def test_reference_paths_compose_like_glue():
    db = read_database_folder(REF_DB1)
    # s3://bucket/base_folder/location composition (meta.py:697-702),
    # modulo the s3a scheme Spark uses
    assert db.table("teams").full_path == (
        "s3a://my-bucket/database/database1/teams"
    )
