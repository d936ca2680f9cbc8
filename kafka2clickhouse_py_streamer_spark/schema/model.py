"""Schema model: the sink table's schema drives validation + casting.

Mirrors the reference's design where the ClickHouse table (via DESCRIBE
TABLE, main.py:29-60) is the source of truth, projected into a
validation schema and a cast plan (main.py:93-175). Here the projection
targets Spark types; the sentinel-default semantics are preserved
exactly (main.py:116-132).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql.types import DataType, StructField, StructType


@dataclass(frozen=True)
class ColumnMeta:
    """One sink column: Spark type + null/missing sentinel + JSON-type
    class used for validation."""

    name: str
    ch_type: str  # original ClickHouse-style type string
    spark_type: DataType
    default: Any  # sentinel used for null/missing values (main.py:116-132)
    json_type: str  # 'integer' | 'number' | 'string' | 'enum'
    is_datetime: bool = False
    is_string_enum: bool = False


@dataclass
class TableSchema:
    """Full sink schema + env-driven knobs (REQUIRED_COLUMNS etc.,
    main.py:553-557)."""

    columns: list[ColumnMeta]
    required: list[str] = field(default_factory=list)

    def spark_schema(self) -> StructType:
        return StructType(
            [StructField(c.name, c.spark_type, True) for c in self.columns]
        )

    def column(self, name: str) -> ColumnMeta:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    @property
    def names(self) -> list[str]:
        return [c.name for c in self.columns]
