"""Custom stateful streaming operators via ``applyInPandasWithState``.

For semantics the built-in windowed aggregations can't express — here a
per-key *running* aggregate that emits the cumulative value every
micro-batch (windowed aggs only emit per window; a streaming "lifetime
counter" needs user state).

Scale notes: state is one small tuple per key, maintained by the state
store; a processing-time timeout expires idle keys so state stays
bounded (the same discipline as watermark.py — unbounded state never
ships). The UDF is Arrow-batched per key group.

The builder returns a transformation usable under ``readStream`` (its
real home) and in batch tests via the shared foreachBatch harness.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)
RUNNING_STATE = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    Emits one row per key per micro-batch in which the key appears,
    carrying the lifetime-so-far totals. ``idle_timeout_ms`` expires a
    key's state after that much processing-time inactivity (emits
    nothing on expiry; the next event starts from zero).
    """

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        update, RUNNING_OUTPUT, RUNNING_STATE, "update", timeout
    )


PACK_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("stream_offset", LongType()),
        StructField("pack_id", LongType()),
        StructField("offset_in_pack", LongType()),
    ]
)
PACK_STATE = StructType([StructField("offset", LongType())])


def streaming_packer(
    docs: DataFrame,
    budget: int = 512,
    key_col: str = "shard",
) -> DataFrame:
    """Streaming twin of the batch sequence packer (llm/sampling p03):
    per-shard concat-and-chunk that keeps the running token offset in
    user state, so packing positions are contiguous ACROSS micro-batches
    — the bookkeeping a continuously-fed shard writer needs, and
    something no built-in windowed aggregation expresses.

    Within a batch, docs are packed in doc_id order (the shard's
    deterministic intake order). State per key is a single long; one
    state-store row per shard, bounded by shard count, not stream
    length. Input needs (shard, doc_id, n_tokens) columns."""

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (off,) = state.get if state.exists else (0,)
        # Materialize the WHOLE group before sorting: the runtime hands a
        # group's micro-batch as multiple Arrow chunks (~10k rows each),
        # and sorting chunks independently would make offsets depend on
        # chunk boundaries — non-deterministic under batch replay.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("doc_id")
            starts = pdf["n_tokens"].cumsum().shift(fill_value=0) + off
            yield pd.DataFrame(
                {
                    "shard": key[0],
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_tokens": pdf["n_tokens"].to_numpy(),
                    "stream_offset": starts.to_numpy(),
                    "pack_id": (starts // budget).to_numpy(),
                    "offset_in_pack": (starts % budget).to_numpy(),
                }
            )
            off = int(starts.iloc[-1] + pdf["n_tokens"].iloc[-1])
        state.update((int(off),))

    return docs.groupBy(key_col).applyInPandasWithState(
        update, PACK_OUTPUT, PACK_STATE, "append", GroupStateTimeout.NoTimeout
    )


CHUNK_PACK_OUTPUT = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("chunk_id", LongType()),
        StructField("n_chunk_tokens", LongType()),
        StructField("stream_offset", LongType()),
        StructField("pack_id", LongType()),
        StructField("offset_in_pack", LongType()),
    ]
)
CHUNK_PACK_STATE = StructType([StructField("offset", LongType())])


def streaming_chunk_packer(
    docs: DataFrame, budget: int = 512, n_shards: int = 4
) -> DataFrame:
    """Streamed chunk→pack — the composition of t17's STATELESS chunk
    projection (identical code under readStream) with the stateful
    per-shard packer, in one streaming DAG: each (doc_id, text) row
    becomes overlapping passages, passages lay end-to-end per shard,
    and the shard's running token offset lives in user state so pack
    positions are CONTIGUOUS ACROSS MICRO-BATCHES — the RAG/
    pretraining shard-writer shape the reference's foreachBatch
    architecture (main.py:492-520's poll loop) exists to serve.

    Twin: batch `llm.sampling.p17_chunk_pack` (same shard hash, same
    (doc_id, chunk_id) order, shared `chunk_pack_batch` arithmetic) —
    equality over any micro-batch cut and replay idempotence are
    tested in tests/test_streaming.py. Requires docs to arrive in
    non-decreasing doc_id order per shard (the deterministic intake
    order, same precondition as `streaming_packer`).

    State per shard is ONE long; emission is append-mode, so the
    checkpointed state store replays a failed micro-batch with the
    same starting offset — replay produces identical rows, never a
    double-advance."""
    from pyspark.sql import functions as F

    from kafka2clickhouse_py_streamer_spark.llm.text import chunk_passages

    chunks = chunk_passages(docs).select(
        (F.col("doc_id") % n_shards).cast("long").alias("shard"),
        "doc_id",
        "chunk_id",
        "n_chunk_tokens",
    )

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (off,) = state.get if state.exists else (0,)
        group = [p for p in pdfs if len(p)]
        if group:
            pdf = pd.concat(group).sort_values(["doc_id", "chunk_id"])
            starts = (
                pdf["n_chunk_tokens"].cumsum().shift(fill_value=0) + off
            )
            yield pd.DataFrame(
                {
                    "shard": key[0],
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "chunk_id": pdf["chunk_id"].to_numpy(),
                    "n_chunk_tokens": pdf["n_chunk_tokens"].to_numpy(),
                    "stream_offset": starts.to_numpy(),
                    "pack_id": (starts // budget).to_numpy(),
                    "offset_in_pack": (starts % budget).to_numpy(),
                }
            )
            off = int(starts.iloc[-1] + pdf["n_chunk_tokens"].iloc[-1])
        state.update((int(off),))

    return chunks.groupBy("shard").applyInPandasWithState(
        update,
        CHUNK_PACK_OUTPUT,
        CHUNK_PACK_STATE,
        "append",
        GroupStateTimeout.NoTimeout,
    )
