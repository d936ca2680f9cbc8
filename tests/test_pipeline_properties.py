"""Property-based pipeline tests (hypothesis): for ANY JSON-ish input,
the validate/cast core must satisfy its routing and schema invariants.

Driven through a single Spark batch per hypothesis example-set (one
example per row) to keep JVM round-trips off the per-example path.
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka2clickhouse_py_streamer_spark.pipeline import process_batch
from kafka2clickhouse_py_streamer_spark.schema.clickhouse import build_table_schema

SCHEMA = build_table_schema(
    [
        ("device_id", "UInt32"),
        ("speed", "Float32"),
        ("note", "String"),
        ("mode", "Enum8('a'=1)"),
        ("event_ts", "DateTime"),
    ],
    required_columns=["device_id"],
    string_enum_columns=[],
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**40), max_value=2**40),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=20),
)

payloads = st.one_of(
    # arbitrary JSON objects over the schema's keys + a foreign key
    st.dictionaries(
        st.sampled_from(
            ["device_id", "speed", "note", "mode", "event_ts", "extra"]
        ),
        json_scalars,
        max_size=6,
    ).map(json.dumps),
    # raw garbage
    st.text(max_size=30),
)


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from kafka2clickhouse_py_streamer_spark.session import get_spark

        _spark = get_spark(app_name="hypothesis", shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


@settings(max_examples=10, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=30))
def test_routing_partition_invariants(raw_payloads):
    spark = _get_spark()
    raw = spark.createDataFrame([(p,) for p in raw_payloads], "value string")
    valid, dlq = process_batch(raw, SCHEMA)
    v_rows = valid.collect()
    d_rows = dlq.collect()

    # 1. no row is both valid and DLQ'd; none invented
    assert len(v_rows) + len(d_rows) <= len(raw_payloads)

    # 2. output schema is exactly the sink schema, in order
    assert [f.name for f in valid.schema.fields] == SCHEMA.names

    # 3. sentinel guarantee: valid rows never carry nulls
    for r in v_rows:
        assert None not in list(r)

    # 4. every DLQ record carries the original payload + an error
    originals = set(raw_payloads)
    for d in d_rows:
        assert d.row in originals
        assert d.error

    # 5. dropped rows are exactly the undecodable/empty ones
    def decodable(p):
        if p is None or p.strip() == "":
            return False
        try:
            return isinstance(json.loads(p), dict)
        except ValueError:
            return False

    n_keepable = sum(1 for p in raw_payloads if decodable(p))
    assert len(v_rows) + len(d_rows) == n_keepable


@settings(max_examples=10, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["speed", "note", "mode", "event_ts"]),
        json_scalars,
        max_size=4,
    )
)
def test_valid_rows_cast_types_hold(extra_fields):
    """Any payload with a valid required key either routes to DLQ (a
    type violation among the extras) or casts with the sentinel/type
    contract intact — never crashes, never emits a null."""
    spark = _get_spark()
    payload = json.dumps({"device_id": 1, **extra_fields})
    raw = spark.createDataFrame([(payload,)], "value string")
    valid, dlq = process_batch(raw, SCHEMA)
    v, d = valid.collect(), dlq.collect()
    assert len(v) + len(d) == 1
    if v:
        [r] = v
        assert r.device_id == 1
        assert isinstance(r.note, str)
        assert isinstance(r.mode, int)
        assert r.event_ts is not None
        assert not math.isnan(r.speed)


@settings(max_examples=15, deadline=None)
@given(st.lists(payloads, min_size=1, max_size=40))
def test_jvm_and_pandas_validators_agree(raw_payloads):
    """Differential twin: the VariantType CASE expression (default)
    and the Arrow pandas-UDF closure must produce the IDENTICAL _err
    column — same drop markers, same error strings, same first-failing
    check — for arbitrary JSON-ish input."""
    import os

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        tag_errors,
    )

    spark = _get_spark()
    raw = spark.createDataFrame(
        [(i, p) for i, p in enumerate(raw_payloads)], "id long, value string"
    )

    def errs(mode):
        os.environ["SPARK_GRAFT_VALIDATOR"] = mode
        try:
            return {
                r["id"]: r["_err"]
                for r in tag_errors(raw, SCHEMA).collect()
            }
        finally:
            os.environ.pop("SPARK_GRAFT_VALIDATOR", None)

    assert errs("jvm") == errs("pandas")


def test_jvm_validator_has_no_python_ops():
    """The opt-in VariantType validator keeps the whole ingest tag
    stage JVM-side: no BatchEvalPython AND no ArrowEvalPython in the
    plan. (It is NOT the default — semantics are twin-proven but
    variant expression evaluation measured ~30x slower than the Arrow
    UDF on current Spark; this pin keeps the plan shape honest for
    when a later Spark version inverts that.)"""
    import os

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        tag_errors,
    )
    from kafka2clickhouse_py_streamer_spark.plans.analysis import (
        formatted_plan,
    )

    spark = _get_spark()
    raw = spark.createDataFrame([("{}",)], "value string")
    os.environ["SPARK_GRAFT_VALIDATOR"] = "jvm"
    try:
        plan = formatted_plan(tag_errors(raw, SCHEMA))
    finally:
        os.environ.pop("SPARK_GRAFT_VALIDATOR", None)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan

    # and the DEFAULT remains the Arrow-batched UDF (one per batch)
    plan_default = formatted_plan(tag_errors(raw, SCHEMA))
    assert "ArrowEvalPython" in plan_default
    assert "BatchEvalPython" not in plan_default


def test_jvm_mode_falls_back_on_hostile_required_name():
    """r8 advice: the jvm-mode identifier guard checked only
    schema.columns, but the CASE text also interpolates the configured
    REQUIRED_COLUMNS names raw into variant_get path literals and error
    strings — a quote/dot/$ there must route to the pandas validator,
    not produce an AnalysisException or a silently wrong JSON path."""
    import os

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        tag_errors,
    )
    from kafka2clickhouse_py_streamer_spark.plans.analysis import (
        formatted_plan,
    )

    hostile = build_table_schema(
        [("device_id", "UInt32")],
        required_columns=["a'b.c$d"],
        string_enum_columns=[],
    )
    spark = _get_spark()
    raw = spark.createDataFrame([("{}",)], "value string")
    os.environ["SPARK_GRAFT_VALIDATOR"] = "jvm"
    try:
        plan = formatted_plan(tag_errors(raw, hostile))
    finally:
        os.environ.pop("SPARK_GRAFT_VALIDATOR", None)
    # fell back to the Arrow UDF — no variant expressions in the plan
    assert "ArrowEvalPython" in plan
    assert "variant_get" not in plan


def test_jvm_and_pandas_validators_agree_on_parser_edges():
    """Deterministic adversarial parse shapes — the class the random
    strategy under-samples. Trailing garbage after a complete object
    (Jackson is lenient; the wrapped-array parse restores strictness),
    concatenated objects, leading zeros, single quotes, deep nesting,
    unicode whitespace, BOM, numeric edge tokens."""
    import os

    from kafka2clickhouse_py_streamer_spark.pipeline.core import (
        tag_errors,
    )

    cases = [
        '{"device_id": 1}{truncated',
        '{"device_id": 1} junk',
        '{"device_id": 1},{"device_id": 2}',
        '{"device_id": 1}   ',
        '  {"device_id": 1}',
        '{"device_id": 01}',
        "{'device_id': 1}",
        '{"device_id": 1e999}',
        '{"device_id": 99999999999999999999}',
        '{"device_id": 1.0}',
        '{"device_id": 0.0}',
        '{"device_id": true}',
        '{"device_id": "1"}',
        '{"device_id": 1, "speed": [1,2]}',
        '{"device_id": 1, "note": {"x": 1}}',
        '﻿{"device_id": 1}',
        " ",
        "\t\n",
        "null",
        "true",
        '"str"',
        "[1]",
        "[]",
        "{}",
        '{"device_id": null}',
        '{"": 1, "device_id": 1}',
        '{"device_id": -0}',
        '{"device_id": 1E2}',
        '{"device_id": 0.1e1}',
    ]
    spark = _get_spark()
    raw = spark.createDataFrame(
        [(i, p) for i, p in enumerate(cases)], "id long, value string"
    )

    def errs(mode):
        os.environ["SPARK_GRAFT_VALIDATOR"] = mode
        try:
            return {
                r["id"]: r["_err"] for r in tag_errors(raw, SCHEMA).collect()
            }
        finally:
            os.environ.pop("SPARK_GRAFT_VALIDATOR", None)

    jvm, pandas_ = errs("jvm"), errs("pandas")
    for i, c in enumerate(cases):
        assert jvm[i] == pandas_[i], (c, jvm[i], pandas_[i])
