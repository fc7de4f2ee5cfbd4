"""Bounded-lateness helpers — Spark analog of reference
util/BoundedLatenessGenerator.scala / BoundedLatenessWatermarkStrategy.scala.

Flink's per-source watermark generator with bounded lateness maps directly
onto ``withWatermark(eventTimeCol, lateness)`` in Structured Streaming:
state for aggregations/joins is retained until the watermark passes
(event_time - lateness), after which late rows are dropped — the same
allowed-lateness contract the reference configures per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def with_bounded_lateness(df: DataFrame, ts_col: str, max_lateness: str) -> DataFrame:
    """e.g. with_bounded_lateness(stream, "ts", "10 minutes")"""
    if not df.isStreaming:
        return df  # batch: event-time completeness is guaranteed by the scan
    return df.withWatermark(ts_col, max_lateness)
