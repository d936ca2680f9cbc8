"""Shared plumbing for the query registry.

Oracle-parity rules (every query in the registry follows these):

- Alias every computed column identically in Spark and SQL (the driver
  sorts columns by name before hashing values).
- Computed integers are cast to BIGINT on both sides (Spark's
  ``row_number``/``month`` return INT, DuckDB's return BIGINT; DuckDB's
  ``SUM(int)`` returns HUGEINT — normalize everything to long).
- Floating aggregates are ``round()``-ed to a fixed scale on both sides
  (summation order differs between engines; rounding absorbs the ulp-level
  drift).
- Timestamp semantics pinned to UTC (session conf) so Spark and DuckDB
  (UTC-naive) agree.
- Every query orders deterministically or is order-insensitive (the
  driver's compare sorts rows anyway; determinism matters for ``LIMIT``).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """One verifiable operator: Spark program + optional DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


# events.ts is parquet timestamp[ns], which Spark's vectorized reader
# rejects. Read it as long (legacy conf, set at runtime so it also works
# under a session we didn't build) and truncate to microseconds via
# timestamp_micros(ts div 1000). No oracle-side wrapper is needed:
# DuckDB reads the ns column natively and its ns->us conversion
# truncates identically, so both engines see the same microsecond
# timestamps.


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The harness may hand us a session we didn't build: pin UTC at
    # read time so timestamp rendering matches the UTC-naive oracle
    # regardless of the host session's timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)")
            )
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow scan up to the session's parallelism.

    Single-file parquet tables (documents/embeddings/events fixtures)
    arrive as ONE partition, serializing every CPU-heavy downstream
    operator (tokenize/shingle/hash/vector math) onto one core. A
    round-robin repartition costs one shuffle of the raw rows — trivial
    next to the per-row compute it parallelizes 32×. At 100 TB inputs
    arrive in thousands of splits and this is a no-op (we only widen,
    never coalesce).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Verification priority: the driver walks ``queries()`` in dict order and
# round 1 recorded rows for exactly the first 50 entries, leaving the LLM
# pipeline family (d04+, s*, t*, m*, p*, w*) unproven. List the queries
# that still need a green CORRECTNESS row FIRST so a capped run covers
# them; previously-green queries follow (their r01 rows already stand).
_VERIFY_FIRST = [
    # LLM pipeline: dedup, similarity, text, multimodal, sampling, stream
    "d04_simhash", "d05_embedding_neardup", "d06_simhash_pairs",
    "d07_dedup_clusters", "d08_canonical_corpus",
    "s01_cosine_topk", "s02_lsh_buckets", "s03_lsh_topk", "s04_ivf_topk",
    "t01_token_count", "t02_quality_score", "t03_langid",
    "t04_fingerprint", "t05_rolling_hash", "t06_repetition",
    "m01_media_metadata", "m02_decode_stats", "m03_frame_sample",
    "m04_feature_extract",
    "p01_train_test_split", "p02_stratified_sample",
    "p03_sequence_packing", "p04_global_shuffle",
    "w01_tumbling", "w02_sliding", "w03_session_window",
    # fixed this round (array->scalar canon)
    "q27_approx_stats", "q38_collect_agg", "q41_map_fns",
    # new this round
    "q48_salted_join", "p05_clean_corpus", "q49_upsert_merge",
    "s05_trained_ivf",
    "d09_contamination", "p06_domain_mix", "s06_quantize",
    "t07_vocab_idf", "w04_enriched_windows", "q50_range_join",
    "t08_unigram_logprob", "m05_media_dedup", "p07_corpus_pipeline",
    "q51_skew_profile", "s07_knn_label",
    "t09_pii_scrub", "w05_attribution",
]


def all_queries() -> dict[str, Query]:
    """Merge every operator module's registry. Import here (not at module
    top) so a bug in one module doesn't take down the whole registry at
    import time of the package."""
    from kafka2clickhouse_py_streamer_spark.operators import (
        aggregates,
        joins,
        scalar_fns,
        statistics,
        windows,
    )
    from kafka2clickhouse_py_streamer_spark.llm import (
        dedup,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from kafka2clickhouse_py_streamer_spark.streaming import batch_windows

    merged: dict[str, Query] = {}
    for mod in (aggregates, joins, windows, scalar_fns, statistics,
                dedup, similarity, text, multimodal, sampling,
                batch_windows):
        for q in mod.QUERIES:
            if q.name in merged:
                raise ValueError(f"duplicate query name: {q.name}")
            merged[q.name] = q
    ordered: dict[str, Query] = {}
    for name in _VERIFY_FIRST:
        if name in merged:
            ordered[name] = merged.pop(name)
    ordered.update(merged)
    return ordered
