"""The pipeline core: JSON decode → schema-validate split → typed
cast-with-defaults projection.

Reference parity (semantics from /root/reference/main.py, re-expressed
Spark-first — no code is translated):

- P1 decode + tombstone filter (main.py:516-520): empty / whitespace-only
  / malformed-JSON messages are silently dropped.
- P2 validate-split (main.py:200-228): each row either passes the
  sink-schema validation or is routed to the DLQ frame carrying
  ``{'row': <original>, 'error': <message>}``.
- P3 cast-project (main.py:230-302): one fused ``select`` casting every
  surviving row to exactly the sink schema — null/missing values replaced
  by per-type sentinel defaults (main.py:116-132), empty-string and
  unparseable datetimes → 1970-01-01 (main.py:267-273), string-enum
  nulls → "DEFAULT" (main.py:275-281), missing columns materialized from
  their defaults (main.py:296-298), extra fields dropped by projection
  (main.py:302).

Architecture: P1+P2 run in ONE Arrow-batched pandas UDF over the raw
message value (per-field JSON *type* checking — "is 5 vs '5'" — needs
the raw token, which no Column-expression JSON parser exposes; a single
vectorized UDF per batch is the sanctioned Python path). P3 is pure
Column expressions — whole-stage-codegen, no Python. At 100 TB the UDF
cost is one Arrow round-trip per input row; everything downstream is
JVM-side.
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka2clickhouse_py_streamer_spark.schema.model import ColumnMeta, TableSchema

# Marker distinguishing "drop silently" (reference main.py:516-520) from
# "route to DLQ with an error" inside the single validation UDF.
_DROP = "\x00DROP"


def _json_class_type(meta: ColumnMeta):
    """Spark type used to *receive* the raw JSON value before P3 casts it.

    Mirrors ch_type_to_json_schema (main.py:62-91): integers arrive as
    JSON ints (LongType is wide enough to receive any sane input; the
    UInt64 sentinel path widens later in P3), numbers as doubles →
    received as StringType so P3's try_cast sees the exact token (Spark's
    from_json would round-trip doubles fine, but strings are uniform and
    let P3 own ALL casting), dates as strings, enums as string-or-int →
    StringType (Jackson renders numeric tokens as their text).
    """
    return StringType()


def receiving_schema(schema: TableSchema) -> StructType:
    """All-string receiving schema: from_json extracts raw tokens, P3
    casts. A number arriving as 1.5 parses to "1.5"; explicit JSON null
    parses to SQL NULL; absent keys parse to SQL NULL too — P2 has
    already split on the present-vs-absent distinction, so P3 can treat
    both as "use the sentinel default"."""
    return StructType(
        [StructField(c.name, _json_class_type(c), True) for c in schema.columns]
    )


def _make_validator(cols: dict[str, str], required: list[str], drop: str):
    """Row validator returning None (valid), ``drop``, or an error string
    (fastjsonschema-style wording, main.py:227).

    Built as a closure over plain data so cloudpickle serializes it BY
    VALUE — executors need neither this package on sys.path nor any
    import beyond stdlib json (the UDF must survive a cluster where the
    engine is driver-side only)."""
    import json as _json

    def validate_row(raw):
        if raw is None or raw.strip() == "":
            return drop
        try:
            obj = _json.loads(raw)
        except (ValueError, RecursionError):
            return drop  # decode errors silently dropped (main.py:519)
        if not isinstance(obj, dict):
            return drop
        for req in required:
            if req not in obj:
                return f"data must contain ['{req}'] properties"
        for name, jtype in cols.items():
            if name not in obj:
                continue  # absent optional key: valid; P3 fills default
            v = obj[name]
            if v is None:
                continue  # present-null: valid; P3 fills the sentinel
            if jtype == "integer":
                if isinstance(v, bool) or not isinstance(v, int):
                    return f"data.{name} must be integer"
            elif jtype == "number":
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return f"data.{name} must be number"
            elif jtype == "enum":
                if isinstance(v, bool) or not isinstance(v, (str, int)):
                    return f"data.{name} must be string or integer"
            else:  # string / permissive fallback (main.py:87-91)
                if not isinstance(v, str):
                    return f"data.{name} must be string"
        return None

    return validate_row


def tag_errors(
    raw_df: DataFrame, schema: TableSchema, value_col: str = "value"
) -> DataFrame:
    """P1+P2 tagging stage: adds an ``_err`` column (NULL = valid, the
    drop marker, or the validation error). Callers that consume BOTH
    splits more than once (the streaming job: valid write + DLQ write)
    should persist this frame so the validation UDF runs once per
    batch instead of once per downstream action."""
    validate_row = _make_validator(
        {c.name: c.json_type for c in schema.columns},
        list(schema.required),
        _DROP,
    )

    @F.pandas_udf(StringType())
    def _validate(vals: pd.Series) -> pd.Series:
        return vals.map(validate_row)

    return raw_df.withColumn("_err", _validate(F.col(value_col)))


def split_tagged(
    tagged: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Split a tagged frame into (valid_raw, dlq)."""
    valid = tagged.filter(F.col("_err").isNull()).drop("_err")
    dlq = (
        tagged.filter(F.col("_err").isNotNull() & (F.col("_err") != _DROP))
        .select(F.col(value_col).alias("row"), F.col("_err").alias("error"))
    )
    return valid, dlq


def validate_split(
    raw_df: DataFrame, schema: TableSchema, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """P1+P2: split raw JSON messages into (valid_raw, dlq).

    ``valid_raw`` keeps the original message column (P3 parses it);
    ``dlq`` carries ``row`` (original message text) + ``error`` — the
    Spark shape of the reference's ``{'row': …, 'error': …}`` records
    (main.py:227). Empty/whitespace/malformed messages appear in
    neither (main.py:516-520).
    """
    return split_tagged(tag_errors(raw_df, schema, value_col), value_col)


def _cast_expr(meta: ColumnMeta, present: bool):
    """P3 for one column (main.py:260-302), as a Column expression."""
    t = meta.spark_type
    if not present:
        # missing column → lit(default) (main.py:296-298)
        return F.lit(meta.default).cast(t).alias(meta.name)
    col = F.col(meta.name)
    if meta.is_datetime:
        # ''→default; unparseable→null→default (main.py:267-273)
        parsed = F.try_to_timestamp(F.nullif(col, F.lit("")))
        if isinstance(t, DateType):
            parsed = parsed.cast(DateType())
        expr = F.coalesce(parsed, F.lit(meta.default).cast(t))
    elif meta.is_string_enum:
        # null → "DEFAULT" (main.py:275-281)
        expr = F.coalesce(col.cast(StringType()), F.lit("DEFAULT"))
    else:
        # fail-soft cast, null → sentinel (main.py:283-294)
        expr = F.coalesce(col.try_cast(t), F.lit(meta.default).cast(t))
    return expr.alias(meta.name)


def cast_project(parsed_df: DataFrame, schema: TableSchema) -> DataFrame:
    """P3: one fused select casting to exactly the sink schema — drops
    extras, orders columns, fills sentinels (main.py:230-302)."""
    present = set(parsed_df.columns)
    return parsed_df.select(
        *[_cast_expr(c, c.name in present) for c in schema.columns]
    )


def process_batch(
    raw_df: DataFrame, schema: TableSchema, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """The batch-mode pipeline API (reference `process_packets`,
    main.py:394-466, minus the sink/retry shell — see streaming/job.py):
    raw messages → (typed valid frame, DLQ frame)."""
    valid_raw, dlq = validate_split(raw_df, schema, value_col)
    parsed = valid_raw.withColumn(
        "_parsed", F.from_json(F.col(value_col), receiving_schema(schema))
    ).select("_parsed.*")
    return cast_project(parsed, schema), dlq
