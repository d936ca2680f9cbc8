"""Readiness probe — reference parity with probe.py:7-50 (`SELECT 1`
against the sink + Kafka list_topics, exit 0/1), re-targeted at this
engine's dependencies: the JVM/SparkSession comes up, the data root is
readable, and the checkpoint/sink root is writable.

Run as ``python -m kafka2clickhouse_py_streamer_spark.probe``; K8s-style
deployments exec it as a readinessProbe
(sample_k8s_deployment.yaml:20-27 in the reference).
"""

from __future__ import annotations

import os
import sys
import tempfile


def check_spark() -> bool:
    """SELECT 1 — the engine's equivalent of probe.py:10."""
    try:
        from kafka2clickhouse_py_streamer_spark.session import get_spark

        spark = get_spark(app_name="probe", shuffle_partitions=1)
        return spark.sql("SELECT 1").collect()[0][0] == 1
    except Exception as exc:  # noqa: BLE001
        print(f"spark check failed: {exc}", file=sys.stderr)
        return False


def check_data_root(data_root: str) -> bool:
    """Source reachability — the engine's list_topics (probe.py:19)."""
    ok = os.path.isdir(data_root) and os.access(data_root, os.R_OK)
    if not ok:
        print(f"data root unreadable: {data_root}", file=sys.stderr)
    return ok


def check_sink_root(sink_root: str) -> bool:
    """Sink writability (the reference's insert path implies it)."""
    try:
        os.makedirs(sink_root, exist_ok=True)
        with tempfile.NamedTemporaryFile(dir=sink_root):
            pass
        return True
    except OSError as exc:
        print(f"sink root unwritable: {sink_root}: {exc}", file=sys.stderr)
        return False


def main() -> int:
    data_root = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sink_root = os.environ.get("SPARK_GRAFT_SINK_DIR", tempfile.gettempdir())
    ok = check_data_root(data_root) and check_sink_root(sink_root) and check_spark()
    print("ready" if ok else "not ready")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
