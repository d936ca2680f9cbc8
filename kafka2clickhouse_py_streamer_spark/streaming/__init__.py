"""Structured Streaming surface: batch twins of the streaming windows
(oracle-verifiable), plus the streaming pipeline shell (Kafka source →
validate/cast → sink + DLQ via foreachBatch)."""
