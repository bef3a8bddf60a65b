"""Type-grammar parity with the reference's acceptance table
(``/root/reference/tests/test_column_types.py:52-77`` — spec reproduced in
FIXTURES.md, not copied as code)."""

import pytest
from pyspark.sql import types as T

from etl_manager_spark.meta.types import (
    AgnosticTypeError,
    agnostic_to_spark_type,
    spark_type_to_agnostic,
    validate_agnostic_type,
)

VALID = [
    "character",
    "int",
    "long",
    "float",
    "double",
    "decimal(38,0)",
    "date",
    "datetime",
    "binary",
    "boolean",
    "struct<num:int>",
    "array<int>",
    "array<array<int>>",
    "struct<num:int,newnum:int>",
    "struct<num:int,arr:array<int>>",
    "array<struct<num:int,desc:character>>",
    "struct<num:int,desc:character>",
    "array<decimal(38,0)>",
]

INVALID = [
    "struct",
    "array",
    "array()",
    "string",
    "varchar",
    "int8",
    "array<>",
    "struct<>",
    "array<int",
    "struct<num:int",
    "decimal",
    "decimal(10)",
    "array<string>",
    "character extra",
    "",
]


@pytest.mark.parametrize("type_str", VALID)
def test_valid_types_accepted(type_str):
    assert validate_agnostic_type(type_str), type_str


@pytest.mark.parametrize("type_str", INVALID)
def test_invalid_types_rejected(type_str):
    assert not validate_agnostic_type(type_str), type_str


def test_parse_results():
    assert agnostic_to_spark_type("character") == T.StringType()
    assert agnostic_to_spark_type("datetime") == T.TimestampType()
    assert agnostic_to_spark_type("decimal(38,0)") == T.DecimalType(38, 0)
    assert agnostic_to_spark_type("array<array<int>>") == T.ArrayType(
        T.ArrayType(T.IntegerType())
    )
    # struct maps to StructType — deliberately fixing the reference's
    # struct→MapType quirk (glue_spark_dict.json:46-49)
    assert agnostic_to_spark_type("struct<num:int,desc:character>") == T.StructType(
        [
            T.StructField("num", T.IntegerType()),
            T.StructField("desc", T.StringType()),
        ]
    )


def test_deep_nesting_round_trip():
    # The FIXTURES.md test_nest type (from the reference's live test)
    s = (
        "struct<arr_key:array<character>,dict_key:struct<nest_arr:array<long>,"
        "nest_dict:struct<a_key:character,b_key:character>>>"
    )
    assert spark_type_to_agnostic(agnostic_to_spark_type(s)) == s


@pytest.mark.parametrize("type_str", VALID)
def test_round_trip_all_valid(type_str):
    assert spark_type_to_agnostic(agnostic_to_spark_type(type_str)) == type_str


def test_error_message_contains_position():
    with pytest.raises(AgnosticTypeError, match="position"):
        agnostic_to_spark_type("array<in t>")


def test_struct_field_name_roundtrip_gate():
    """spark_type_to_agnostic must only emit strings its documented
    inverse accepts: a struct field named 'Num' (legal in parquet,
    illegal in the agnostic grammar) raises at conversion time instead
    of producing metadata that can never be loaded back."""
    import pytest
    from pyspark.sql import types as T

    from etl_manager_spark.meta.types import (
        AgnosticTypeError,
        spark_type_to_agnostic,
    )

    bad = T.StructType([T.StructField("Num", T.IntegerType())])
    with pytest.raises(AgnosticTypeError, match="Num"):
        spark_type_to_agnostic(bad)
    ok = T.StructType([T.StructField("num", T.IntegerType())])
    assert spark_type_to_agnostic(ok) == "struct<num:int>"
