"""Windowed aggregation — the Spark form of StreamJob.windowedAggregation
(reference flink/StreamJob.scala:286 + WindowedAggregationInitializer).

Flink's window assigners map onto ``F.window`` (tumbling/sliding) and
``F.session_window`` (session gap). In batch these are plain groupBy
expressions (one shuffle, partial aggregation); the same expressions work
unchanged on a Structured Streaming DataFrame with ``withWatermark`` (the
Spark analog of the reference's BoundedLatenessGenerator allowed-lateness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _finish(df: DataFrame, keys: list[str]) -> DataFrame:
    rest = [c for c in df.columns if c != "_w" and c not in keys]
    return df.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        *keys,
        *rest,
    )


def tumbling_agg(
    df: DataFrame, ts: str, size: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    return _finish(df.groupBy(F.window(ts, size).alias("_w"), *keys).agg(*aggs), keys)


def sliding_agg(
    df: DataFrame, ts: str, size: str, slide: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    return _finish(
        df.groupBy(F.window(ts, size, slide).alias("_w"), *keys).agg(*aggs), keys
    )


def session_agg(
    df: DataFrame, ts: str, gap: str, keys: list[str], aggs: list[Column]
) -> DataFrame:
    return _finish(
        df.groupBy(F.session_window(ts, gap).alias("_w"), *keys).agg(*aggs), keys
    )
