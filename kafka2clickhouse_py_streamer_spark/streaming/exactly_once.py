"""Exactly-once file sink for foreachBatch via deterministic overwrite.

The reference (and our PipelineJob) is at-least-once: a micro-batch that
fails after a partial write is replayed wholesale, so duplicates are
possible (main.py:525-526; SURVEY.md §7 documents the contract). For
sinks that support it, Structured Streaming's canonical exactly-once
recipe is *idempotent re-execution*: make the write a deterministic
function of the batch id, so a replay overwrites exactly what the
failed attempt wrote instead of appending next to it.

Here that is a directory-per-batch parquet layout:

    {path}/_batch_id={id}/part-*.parquet   (mode=overwrite)

- replayed batch → same directory → overwrite → no duplicates;
- reader sees `_batch_id` as a normal partition column and can prune on
  it. At 100 TB the same recipe holds on object stores (the overwrite
  is per-batch-directory, never a global truncate); transactional table
  formats replace the directory with a commit, same idea.

JDBC sinks get exactly-once by keying a staging table on
(batch_id, row) or by DELETE WHERE batch_id = ? before insert — the
same deterministic-replay shape; not implemented here because the
container has no live warehouse.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def idempotent_parquet_sink(path: str):
    """foreachBatch-compatible ``(df, batch_id) -> None`` writer whose
    re-execution for the same batch id is a no-op on the final state."""

    def write(df: DataFrame, batch_id: int) -> None:
        (
            df.write.mode("overwrite").parquet(
                os.path.join(path, f"_batch_id={batch_id}")
            )
        )

    return write


def read_idempotent(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read everything the sink has committed; ``_batch_id`` surfaces as
    a partition column (pruneable).

    Before the first batch commits (or after a reset wiped the output)
    the glob matches nothing; with ``schema`` given the reader returns
    an empty frame instead of failing, so a consumer polling the sink
    survives the startup race."""
    import glob as _glob

    if not _glob.glob(os.path.join(path, "_batch_id=*")):
        if schema is not None:
            return spark.createDataFrame([], schema)
        raise FileNotFoundError(
            f"no committed batches under {path!r} yet; pass `schema` to "
            "receive an empty frame instead"
        )
    return spark.read.option("basePath", path).parquet(
        os.path.join(path, "_batch_id=*")
    )
