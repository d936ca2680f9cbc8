"""ClickHouse-type-string → Spark type + sentinel default.

Reference parity (main.py:62-175):

- type mapping & sentinel defaults: main.py:116-149 — every branch
  reproduced below, including the precision-lossy UInt64 sentinel
  18446744073709500000 (noted lossy in-source, main.py:124). Spark has
  no unsigned integers, so each UInt type widens one step; UInt64 maps
  to DECIMAL(20,0).
- JSON-type classes for validation: ch_type_to_json_schema
  (main.py:62-91) — substring matching on the lowered type name, same
  precedence order, permissive string fallback.
- ``db_insert_time`` is excluded from the cast plan (popped at
  main.py:168) so the sink's DEFAULT expression fills it.
- ``required`` comes from configuration, not CH nullability
  (main.py:167, main.py:555).
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

from pyspark.sql.types import (
    ByteType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampType,
)

from kafka2clickhouse_py_streamer_spark.schema.model import ColumnMeta, TableSchema

EXCLUDED_COLUMNS = ("db_insert_time",)  # sink-side DEFAULT fills these

# (spark_type, sentinel default, json_type) per CH base type —
# defaults table from main.py:116-132, dtype map main.py:135-149.
_TYPE_TABLE = {
    "int8": (ByteType(), -127, "integer"),
    "int16": (ShortType(), -32767, "integer"),
    "int32": (IntegerType(), -2147483647, "integer"),
    "int64": (LongType(), -9223372036854775808, "integer"),
    "uint8": (ShortType(), 255, "integer"),
    "uint16": (IntegerType(), 65535, "integer"),
    "uint32": (LongType(), 4294967295, "integer"),
    # UInt64 exceeds LongType; sentinel is precision-lossy by design
    # (main.py:124) — DECIMAL(20,0) holds the full unsigned range.
    "uint64": (DecimalType(20, 0), Decimal(18446744073709500000), "integer"),
    "float32": (FloatType(), 2000000000.0, "number"),
    "float64": (DoubleType(), 999999999999999.9, "number"),
    "datetime": (TimestampType(), datetime(1970, 1, 1), "string"),
    "date": (DateType(), date(1970, 1, 1), "string"),
}


def ch_type_to_spark(
    name: str, ch_type: str, string_enum_columns: set[str] | None = None
) -> ColumnMeta:
    """Map one ClickHouse-style column to a :class:`ColumnMeta`.

    Substring matching on the lowered type name, same precedence as the
    reference (ints before floats, datetime before date, enum special-
    cased, permissive string fallback, main.py:62-91 + 153-165).
    """
    low = ch_type.lower()
    string_enums = string_enum_columns or set()

    if "enum" in low:
        if name in string_enums:
            # string-enum columns cast to text, null -> "DEFAULT"
            # (main.py:275-281)
            return ColumnMeta(name, ch_type, StringType(), "DEFAULT", "enum",
                              is_string_enum=True)
        return ColumnMeta(name, ch_type, ShortType(), 127, "enum")

    # unsigned before signed ("uint64" contains "int64"); datetime
    # before date ("datetime" contains "date")
    for key in ("uint8", "uint16", "uint32", "uint64",
                "int8", "int16", "int32", "int64",
                "float32", "float64", "datetime", "date"):
        if key in low:
            spark_type, default, json_type = _TYPE_TABLE[key]
            return ColumnMeta(
                name, ch_type, spark_type, default, json_type,
                is_datetime=key in ("datetime", "date"),
            )

    if "decimal" in low:
        return ColumnMeta(name, ch_type, DoubleType(), 999999999999999.9,
                          "number")

    # string / uuid / anything else: permissive string (main.py:87-91)
    return ColumnMeta(name, ch_type, StringType(), "", "string")


def build_table_schema(
    ch_columns: list[tuple[str, str]],
    required_columns: list[str] | None = None,
    string_enum_columns: list[str] | None = None,
    datetime_columns: list[str] | None = None,
) -> TableSchema:
    """Build the pipeline's :class:`TableSchema` from (name, ch_type)
    pairs — the shape DESCRIBE TABLE returns (main.py:51-60).

    ``datetime_columns`` forces the datetime cast path for columns whose
    CH type is not Date/DateTime (env ``DATETIME_COLUMNS``); Date/
    DateTime-typed columns always take it.
    """
    dt_forced = set(datetime_columns or [])
    cols: list[ColumnMeta] = []
    for name, ch_type in ch_columns:
        if name in EXCLUDED_COLUMNS:
            continue  # popped: sink DEFAULT fills it (main.py:168)
        meta = ch_type_to_spark(name, ch_type, set(string_enum_columns or []))
        if name in dt_forced and not meta.is_datetime:
            meta = ColumnMeta(
                meta.name, meta.ch_type, TimestampType(),
                datetime(1970, 1, 1), "string", is_datetime=True,
            )
        cols.append(meta)
    return TableSchema(columns=cols, required=list(required_columns or []))
