"""Per-batch streaming metrics — the reference's per-batch wall-time
log (main.py:466: "Total time taken ... for {n} packets") as a
StreamingQueryListener.

The listener receives Structured Streaming's progress events off the
query thread and keeps a bounded in-memory history the driver can poll
(or forward to a metrics system). Nothing here touches the data path —
observability is free at any scale.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Records (batch_id, input rows, batch duration ms, rows/sec) per
    completed micro-batch; ``history`` keeps the most recent
    ``max_history`` entries."""

    def __init__(self, max_history: int = 1000) -> None:
        self.history: list[dict] = []
        self._max = max_history

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        duration_ms = (p.durationMs or {}).get("triggerExecution")
        entry = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "duration_ms": duration_ms,
            "rows_per_sec": p.processedRowsPerSecond,
        }
        self.history.append(entry)
        if len(self.history) > self._max:
            del self.history[: -self._max]

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(e["num_input_rows"] or 0 for e in self.history)
