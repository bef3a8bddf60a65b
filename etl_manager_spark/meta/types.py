"""Agnostic column-type grammar and conversion to/from Spark types.

The reference validates column types with a recursive regex
(``/root/reference/etl_manager/utils.py:160-166``) accepting::

    character | int | long | float | double | decimal(p,s) | date
    | datetime | binary | boolean
    | array<T>
    | struct<name:T, name:T, ...>

with arbitrary nesting (acceptance table:
``/root/reference/tests/test_column_types.py:52-77``). Bare ``struct`` /
``array`` without ``<...>`` are invalid. We implement the same grammar as a
recursive-descent parser (Python's ``re`` lacks ``(?R)``), which also gives
us the parse tree for free, and map it onto ``pyspark.sql.types``.

Two deliberate departures from the reference, both documented:

* The reference's ``glue_spark_dict.json:46-49`` labels the Spark type for
  ``struct`` as ``MapType`` — a quirk/bug. We emit ``StructType``.
* We add an inverse mapping from any Spark ``DataType`` back to the agnostic
  grammar (the reference only supports this for the subset appearing in
  parquet metadata, ``meta.py:1009-1035``).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Simple (non-parameterised) agnostic types → Spark type constructors.
# Mirrors the translation table in the reference's glue_spark_dict.json:1-50
# (agnostic → glue → spark), collapsed to one hop.
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "character": T.StringType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
}

# Struct field names follow the same legality rule as column names
# (reference utils.py:82-94): lowercase alnum + underscore.
_FIELD_NAME_RE = re.compile(r"^[a-z0-9_]+$")


class AgnosticTypeError(ValueError):
    """Raised when a type string does not conform to the agnostic grammar."""


class _Parser:
    """Recursive-descent parser for the agnostic type grammar."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def fail(self, msg: str) -> None:
        raise AgnosticTypeError(
            f"invalid agnostic type {self.text!r} at position {self.pos}: {msg}"
        )

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            self.fail(f"expected {ch!r}")
        self.pos += 1

    def _take_word(self) -> str:
        start = self.pos
        while self.pos < len(self.text) and (
            self.text[self.pos].isalnum() or self.text[self.pos] == "_"
        ):
            self.pos += 1
        if self.pos == start:
            self.fail("expected a type name")
        return self.text[start : self.pos]

    def parse_type(self) -> T.DataType:
        word = self._take_word()
        if word == "array":
            self.expect("<")
            elem = self.parse_type()
            self.expect(">")
            return T.ArrayType(elem)
        if word == "struct":
            self.expect("<")
            fields = [self.parse_field()]
            while self.peek() == ",":
                self.pos += 1
                fields.append(self.parse_field())
            self.expect(">")
            return T.StructType(fields)
        if word == "decimal":
            self.expect("(")
            precision = self._take_int()
            self.expect(",")
            scale = self._take_int()
            self.expect(")")
            return T.DecimalType(precision, scale)
        if word in _SIMPLE_TYPES:
            return _SIMPLE_TYPES[word]
        self.fail(f"unknown type name {word!r}")
        raise AssertionError("unreachable")

    def parse_field(self) -> T.StructField:
        name = self._take_word()
        if not _FIELD_NAME_RE.match(name):
            self.fail(f"illegal struct field name {name!r}")
        self.expect(":")
        return T.StructField(name, self.parse_type())

    def _take_int(self) -> int:
        start = self.pos
        while self.peek().isdigit():
            self.pos += 1
        if self.pos == start:
            self.fail("expected an integer")
        return int(self.text[start : self.pos])


def agnostic_to_spark_type(type_str: str) -> T.DataType:
    """Parse an agnostic type string into a ``pyspark.sql.types.DataType``.

    Raises :class:`AgnosticTypeError` on any string the reference grammar
    rejects (e.g. bare ``struct``, ``array()``, ``string``).
    """
    parser = _Parser(type_str)
    result = parser.parse_type()
    if parser.pos != len(type_str):
        parser.fail("trailing characters")
    return result


def validate_agnostic_type(type_str: str) -> bool:
    """True iff ``type_str`` conforms to the agnostic grammar."""
    try:
        agnostic_to_spark_type(type_str)
        return True
    except AgnosticTypeError:
        return False


def assert_agnostic_type(type_str: str) -> None:
    """Raise with a helpful message if ``type_str`` is invalid (the
    construction-time gate the reference applies per column,
    ``meta.py:135-136``)."""
    agnostic_to_spark_type(type_str)


def spark_type_to_agnostic(dtype: T.DataType) -> str:
    """Inverse of :func:`agnostic_to_spark_type` for supported Spark types.

    Used for schema import from existing data (the reference's
    ``tablemeta_from_parquet_meta``, ``meta.py:1038-1060``). Spark types with
    no agnostic spelling (map, char/varchar, interval, timestamp_ntz) raise.
    """
    if isinstance(dtype, T.StringType):
        return "character"
    if isinstance(dtype, T.IntegerType):
        return "int"
    if isinstance(dtype, (T.ShortType, T.ByteType)):
        # Narrow ints widen to the agnostic "int" (reference has no short/byte)
        return "int"
    if isinstance(dtype, T.LongType):
        return "long"
    if isinstance(dtype, T.FloatType):
        return "float"
    if isinstance(dtype, T.DoubleType):
        return "double"
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    if isinstance(dtype, T.DateType):
        return "date"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        # Parquet files with isAdjustedToUTC=false surface as TIMESTAMP_NTZ in
        # Spark 4; the agnostic model has a single "datetime"
        return "datetime"
    if isinstance(dtype, T.BinaryType):
        return "binary"
    if isinstance(dtype, T.BooleanType):
        return "boolean"
    if isinstance(dtype, T.ArrayType):
        return f"array<{spark_type_to_agnostic(dtype.elementType)}>"
    if isinstance(dtype, T.StructType):
        for f in dtype.fields:
            if not _FIELD_NAME_RE.match(f.name):
                # emit only strings the inverse parser accepts: a verbatim
                # 'struct<Num:int>' would fail the construction-time
                # grammar gate later with a confusing parse error
                raise AgnosticTypeError(
                    f"struct field name {f.name!r} is not expressible in "
                    "the agnostic grammar (lowercase alnum + underscore); "
                    "rename the field before importing the schema"
                )
        inner = ",".join(
            f"{f.name}:{spark_type_to_agnostic(f.dataType)}" for f in dtype.fields
        )
        return f"struct<{inner}>"
    raise AgnosticTypeError(f"Spark type {dtype} has no agnostic equivalent")


def columns_to_struct_type(columns: list[dict]) -> T.StructType:
    """Build a Spark schema from agnostic column dicts.

    Column properties beyond name/type travel in ``StructField.metadata``
    (description, pattern, enum, sensitivity, redacted), mirroring the
    reference's column dict shape (``meta.py:248-288``). ``nullable`` maps to
    the StructField nullable flag.
    """
    fields = []
    for col in columns:
        metadata = {
            k: col[k]
            for k in ("description", "pattern", "enum", "sensitivity", "redacted")
            if k in col and col[k] is not None
        }
        fields.append(
            T.StructField(
                col["name"],
                agnostic_to_spark_type(col["type"]),
                nullable=col.get("nullable", True),
                metadata=metadata or None,
            )
        )
    return T.StructType(fields)


def struct_type_to_columns(schema: T.StructType) -> list[dict]:
    """Inverse of :func:`columns_to_struct_type` (drops empty properties)."""
    columns = []
    for field in schema.fields:
        col = {"name": field.name, "type": spark_type_to_agnostic(field.dataType)}
        meta = field.metadata or {}
        for key in ("description", "pattern", "enum", "sensitivity", "redacted"):
            if key in meta:
                col[key] = meta[key]
        if not field.nullable:
            col["nullable"] = False
        columns.append(col)
    return columns
