"""Multimodal plumbing tests beyond the oracle checks: the stubbed
real-codec path must fail loudly, and payloads must stay binary."""

from __future__ import annotations

import pytest

from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
    decode_media,
    media_table,
    resize_media,
)

SF_DIR = "/root/testdata/sf0.001"


def test_real_codec_is_stubbed(spark):
    m = media_table(spark, SF_DIR)
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(m, use_real_codec=True)
    with pytest.raises(NotImplementedError, match="PIL"):
        resize_media(m, 8, use_real_codec=True)


def test_fake_resize_truncates_and_pads(spark):
    m = media_table(spark, SF_DIR)
    small = resize_media(m, 8)
    big = resize_media(m, 100)
    assert dict(small.dtypes)["payload"] == "binary"
    assert {r.n_bytes for r in small.select("n_bytes").distinct().collect()} == {8}
    assert {r.n_bytes for r in big.select("n_bytes").distinct().collect()} == {100}
    r = big.orderBy("doc_id").first()
    assert bytes(r.payload).endswith(b"\x00" * 4)  # zero-padded tail


def test_payload_is_binary(spark):
    m = media_table(spark, SF_DIR)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.orderBy("doc_id").first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == len(row.payload)
    assert row.n_bytes % 16 == 0  # whole MD5 copies


def test_codec_injection_seam(spark):
    """A cluster WITH an imaging library injects its decoder through the
    ``codec`` parameter and the same operator runs unchanged — verified
    with a stub codec whose output is distinguishable from the fake."""
    m = media_table(spark, SF_DIR)

    def stub_codec(payload: bytes) -> tuple[int, int]:
        return len(payload), 7  # "decoded" dims no fake would produce

    rows = (
        decode_media(m, codec=stub_codec)
        .orderBy("doc_id")
        .limit(4)
        .collect()
    )
    assert all(r.height == 7 for r in rows)
    assert all(r.width == r.n_bytes for r in rows)
    # default (no injection) still yields the deterministic fake dims
    fake = decode_media(m).orderBy("doc_id").limit(4).collect()
    assert all(1 <= r.width <= 64 and 1 <= r.height <= 64 for r in fake)


def test_m08_clusters_cover_m07_pairs(spark):
    """Canonicalization honesty: every m07 near-dup pair must land in
    the SAME m08 cluster, member counts must sum to the media corpus,
    and dup_bytes must equal the total payload size of non-canonical
    members (re-derived serially from the labels + sizes)."""
    from kafka2clickhouse_py_streamer_spark.llm.multimodal import (
        m07_phash_neardup,
        m08_media_canonical,
    )

    labels = {}
    sizes = {}
    for r in media_table(spark, SF_DIR).select("doc_id", "n_bytes").collect():
        sizes[r.doc_id] = r.n_bytes
    clusters = m08_media_canonical(spark, SF_DIR).collect()
    rows_by_cluster = {r.cluster_id: r for r in clusters}
    assert sum(r.n_members for r in clusters) == len(sizes)

    # rebuild the components serially (union-find over m07 pairs)
    parent = {d: d for d in sizes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    pairs = m07_phash_neardup(spark, SF_DIR).collect()
    for p in pairs:
        ra, rb = find(p.doc_a), find(p.doc_b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for d in sizes:
        comp.setdefault(find(d), []).append(d)
    assert set(comp) == set(rows_by_cluster)
    for cid, members in comp.items():
        row = rows_by_cluster[cid]
        assert row.n_members == len(members)
        assert row.dup_bytes == sum(
            sizes[d] for d in members if d != cid
        )
