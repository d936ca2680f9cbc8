"""Sink library for :class:`PipelineJob` and batch jobs.

Reference parity:

- K1 ClickHouse Arrow/async insert (main.py:305-356) → `jdbc_sink` with
  the async-insert URL settings passed through (main.py:329-335), or
  `clickhouse_connect_sink` using the same client library as the
  reference where it is installed (import-gated; not in this container).
- Parquet is the batch/test sink; `partitioned_parquet_sink` is the
  100 TB shape: partition by a low-cardinality date/key column,
  `maxRecordsPerFile` bounds file sizes so downstream scans parallelize.

All sinks are plain callables ``DataFrame -> None`` — no Catalyst
extension is needed anywhere (SURVEY.md §4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

# ClickHouse server-side async-insert batching, as the reference
# configures it (main.py:329-335).
CLICKHOUSE_ASYNC_INSERT_SETTINGS = {
    "async_insert": "1",
    "wait_for_async_insert": "1",
    "async_insert_threads": "4",
    "async_insert_busy_timeout_ms": "500",
    "async_insert_max_data_size": "100000000",
}

Sink = Callable[[DataFrame], None]


def parquet_sink(path: str, mode: str = "append") -> Sink:
    def write(df: DataFrame) -> None:
        df.write.mode(mode).parquet(path)

    return write


def partitioned_parquet_sink(
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 1_000_000,
    mode: str = "append",
) -> Sink:
    """The at-scale parquet layout: directory-partitioned on a
    low-cardinality column (partition pruning on read), file sizes
    bounded so a 1000-executor scan gets balanced splits."""

    def write(df: DataFrame) -> None:
        (
            df.write.mode(mode)
            .option("maxRecordsPerFile", max_records_per_file)
            .partitionBy(*partition_cols)
            .parquet(path)
        )

    return write


def orc_sink(path: str, mode: str = "append") -> Sink:
    """ORC writer (mirror of ``parquet_sink``; reader in
    ``sources.files.read_orc``)."""

    def write(df: DataFrame) -> None:
        df.write.mode(mode).orc(path)

    return write


def bucketed_parquet_sink(
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> Sink:
    """Bucketed (hash-clustered) parquet table: rows are pre-partitioned
    into ``num_buckets`` files by hash of ``bucket_cols`` and optionally
    sorted within each bucket.

    This is the co-located-join layout for 100 TB fact tables: two
    tables bucketed the same way join with ZERO shuffle — the exchange
    is paid once at write time instead of on every downstream
    join/aggregation. (``sort_cols`` orders rows within each bucket
    FILE; Spark still inserts a per-partition sort before a sort-merge
    join unless each bucket is a single file, so the pinned win is the
    eliminated exchange, and the in-file ordering additionally buys
    min/max-stat row-group skipping.)
    Registered via ``saveAsTable`` with an explicit ``path`` (external
    table) because bucket metadata lives in the catalog, not the files.
    """

    def write(df: DataFrame) -> None:
        w = (
            df.write.mode(mode)
            .option("path", path)
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            w = w.sortBy(*sort_cols)
        w.format("parquet").saveAsTable(table)

    return write


def jdbc_sink(
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batch_size: int = 25_000,
    async_insert: bool = True,
) -> Sink:
    """JDBC writer for a ClickHouse-compatible warehouse. The reference's
    async-insert settings ride as URL query parameters; batch size
    defaults to the reference's 25 000-row micro-batch (main.py:569)."""
    if async_insert and "async_insert" not in url:
        sep = "&" if "?" in url else "?"
        url = url + sep + "&".join(
            f"{k}={v}" for k, v in CLICKHOUSE_ASYNC_INSERT_SETTINGS.items()
        )

    def write(df: DataFrame) -> None:
        (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("batchsize", batch_size)
            .options(**(properties or {}))
            .mode("append")
            .save()
        )

    return write


def clickhouse_connect_sink(
    host: str, port: int, table: str, database: str = "default"
) -> Sink:
    """Arrow-native insert through clickhouse-connect (the reference's
    client, main.py:341-355): ``df.toArrow()`` on the driver per batch.
    Import-gated — the library is not installed in this container.

    Suitable for micro-batch sizes that fit the driver (the reference's
    25 k-row batches); larger batches should use jdbc_sink, which writes
    from executors."""
    try:
        import clickhouse_connect  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "clickhouse-connect is not installed; use jdbc_sink"
        ) from exc

    def write(df: DataFrame) -> None:
        client = clickhouse_connect.get_client(
            host=host, port=port, database=database,
            settings=CLICKHOUSE_ASYNC_INSERT_SETTINGS,
        )
        client.insert_arrow(table, df.toArrow())

    return write
