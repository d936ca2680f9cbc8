"""Streaming as-of enrichment — q26's timeline join maintained
incrementally under ``readStream``.

One interleaved stream carries BOTH row kinds (the same tagged-union
frame q26's batch core sorts): dimension versions (``is_event = 0``,
order rows) and fact events (``is_event = 1``). Each micro-batch
persists its dimension versions to their own ``batch_id`` partition
and enriches its events against ALL persisted versions plus this
batch's own — through the SAME :func:`asof_carry_enrich` core as the
batch q26, so the streamed output equals batch q26 over the
concatenated input by construction (twin-tested).

Ordering contract (same class as the dedup admitters' id-ordered
cut): micro-batch cuts must respect event time ACROSS KINDS — a
dimension version must not arrive in a later batch than a fact it
should enrich. Within a batch, order is irrelevant (the carry sort
puts same-instant dimensions before facts). This is exactly the
guarantee a watermarked upstream provides.

State/recovery contract (the corpus_stream module conventions):

- Dimension partitions are ``batch_id=N`` under dynamic partition
  overwrite; enriched outputs are partitioned the same way — an
  at-least-once re-delivery overwrites BOTH its own partitions, and
  because :func:`_read_prior_state` never reads the current batch's
  partition, a replay enriches against the identical version set.
- State grows with dimension versions, not facts. The maintenance
  step is :func:`compact_asof_state`: under a watermark ``w``, any
  version that is neither the per-key LATEST at-or-before ``w`` nor
  newer than ``w`` is dominated — no future fact (t ≥ w) can ever
  pick it — so the fold keeps exactly the per-key SCD frontier.
  Same crash-recoverable fold-and-swap as the sketch compactors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kafka2clickhouse_py_streamer_spark.streaming.corpus_stream import (
    COMPACTED_BATCH_ID,
    _fold_and_swap,
    _fs,
    _list_foldable,
    _read_prior_state,
    _recover_compaction,
)

# the interleaved stream's schema: dimension rows fill the o_* columns
# (is_event = 0), fact rows fill event_id/user_id/ts (is_event = 1)
ASOF_STREAM_SCHEMA = (
    "is_event int, event_id long, user_id long, ts timestamp, "
    "o_custkey long, o_orderkey long, o_orderdate timestamp, "
    "o_totalprice double"
)

_DIM_COLS = ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]


def asof_enrich_batch(
    batch_df: DataFrame, batch_id: int, out_dir: str, state_dir: str
) -> None:
    """Process one interleaved micro-batch: persist its dimension
    versions, enrich its facts against (prior state ∪ own versions)
    through the shared q26 core, append enriched rows to ``out_dir``.

    Module-level (not a closure) so replay idempotency is testable
    without a running stream — the corpus_stream discipline."""
    from kafka2clickhouse_py_streamer_spark.operators.joins import (
        asof_carry_enrich,
    )

    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    dims = batch_df.filter(F.col("is_event") == 0).select(*_DIM_COLS)
    facts = batch_df.filter(F.col("is_event") == 1).select(
        "event_id", "user_id", "ts"
    )
    prior = _read_prior_state(spark, state_dir, batch_id)
    versions = (
        dims
        if prior is None
        else dims.unionByName(prior.select(*_DIM_COLS))
    )
    enriched = asof_carry_enrich(facts, versions).withColumn(
        "batch_id", F.lit(batch_id)
    )
    enriched.write.mode("overwrite").partitionBy("batch_id").parquet(
        out_dir
    )
    (
        dims.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .parquet(state_dir)
    )


def start_streaming_asof(
    stream_df: DataFrame,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Wire ``asof_enrich_batch`` under writeStream.foreachBatch."""
    return (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: asof_enrich_batch(df, bid, out_dir, state_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_asof_state(
    spark, state_dir: str, through_batch: int, watermark,
    _crash_point: str | None = None,
) -> int:
    """Timeline maintenance: fold the dimension partitions up to
    ``through_batch`` into ONE compacted partition holding only the
    per-key SCD frontier under ``watermark``: every version newer
    than the watermark, plus the single per-key winner at-or-before
    it (max o_orderdate, ties to max o_orderkey — the EXACT pick
    :func:`asof_carry_enrich` would make for any future fact, so
    enrichment of facts with t ≥ watermark is provably unchanged).
    Same safety contract and shared swap/recovery mechanics as the
    sketch compactors. Returns the number of partitions removed."""
    _recover_compaction(spark, state_dir)
    jvm, fs, root = _fs(spark, state_dir)
    old_parts = _list_foldable(fs, root, through_batch)
    if not old_parts:
        return 0

    state = spark.read.parquet(state_dir).filter(
        (F.col("batch_id") == COMPACTED_BATCH_ID)
        | (F.col("batch_id") <= through_batch)
    )
    fresh = state.filter(F.col("o_orderdate") > F.lit(watermark))
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    frontier = (
        state.filter(F.col("o_orderdate") <= F.lit(watermark))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    consolidated = fresh.unionByName(frontier).select(*_DIM_COLS)
    _fold_and_swap(
        spark, state_dir, consolidated, old_parts, through_batch,
        _crash_point=_crash_point,
    )
    return len(old_parts)
