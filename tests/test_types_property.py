"""Property-based checks for the agnostic type grammar (SURVEY §1.2):
any type the recursive grammar can produce must validate, parse to a
Spark DataType, and round-trip back to the identical string. Complements
the reference's fixed accept/reject table in tests/test_types.py with
randomized deep nesting."""

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_manager_spark.meta.types import (
    agnostic_to_spark_type,
    spark_type_to_agnostic,
    validate_agnostic_type,
)

_SIMPLE = st.sampled_from(
    [
        "character",
        "int",
        "long",
        "float",
        "double",
        "date",
        "datetime",
        "boolean",
        "binary",
        "decimal(18,2)",
        "decimal(38,0)",
        "decimal(7,7)",
    ]
)

_FIELD_NAME = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)


def _types(depth: int):
    if depth == 0:
        return _SIMPLE
    sub = _types(depth - 1)
    arr = st.builds("array<{}>".format, sub)
    struct = st.builds(
        lambda fields: "struct<" + ",".join(f"{n}:{t}" for n, t in fields) + ">",
        st.lists(
            st.tuples(_FIELD_NAME, sub),
            min_size=1,
            max_size=3,
            unique_by=lambda kv: kv[0],
        ),
    )
    return st.one_of(_SIMPLE, arr, struct)


@settings(max_examples=300, deadline=None)
@given(_types(3))
def test_generated_types_validate_parse_round_trip(type_str):
    assert validate_agnostic_type(type_str), type_str
    dtype = agnostic_to_spark_type(type_str)
    assert spark_type_to_agnostic(dtype) == type_str


@settings(max_examples=100, deadline=None)
@given(_types(2))
def test_wrapping_preserves_validity(type_str):
    assert validate_agnostic_type(f"array<{type_str}>")
    assert validate_agnostic_type(f"struct<x:{type_str}>")
    # bare complex heads stay invalid no matter what surrounds them
    assert not validate_agnostic_type("array")
    assert not validate_agnostic_type("struct")
    assert not validate_agnostic_type(f"array<{type_str}")
