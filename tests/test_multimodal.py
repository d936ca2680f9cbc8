"""Multimodal plumbing tests beyond the oracle checks: the stubbed
real-codec path must fail loudly, and payloads must stay binary."""

from __future__ import annotations

import pytest

from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
    decode_media,
    media_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_real_codec_is_stubbed(spark):
    m = media_table(spark, SF_DIR)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(m, use_real_codec=True)


def test_payload_is_binary(spark):
    m = media_table(spark, SF_DIR)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.orderBy("doc_id").first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == len(row.payload)
    assert row.n_bytes % 16 == 0  # whole MD5 copies
