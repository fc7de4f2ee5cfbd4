"""Control-stream gating — Spark form of StreamJob.filterByControlSource
(reference flink/StreamJob.scala: a connected control+data stream where data
events are emitted only while the latest control event for their key has
``$active == true``; README.md:388).

Spark-first design: tag and union the two inputs (the batch/streaming analog
of a connected stream), then compute "latest control state as of each data
event" with a single window pass per key — ``last(active, ignorenulls)``
over rows up to the current one in (ts, tiebreak) order. One shuffle on the
key; no per-event state, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def filter_by_control(
    control: DataFrame,
    data: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    active_col: str = "active",
) -> DataFrame:
    """Emit data rows whose latest preceding-or-same-time control row (same
    key) is active. Control rows sort before data rows on ties so a control
    switch applies to same-timestamp data (tiebreak column disambiguates
    total order within each kind)."""
    data_cols = data.columns
    ctl = control.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(0).alias("_kind"),
        F.col(active_col).alias("_active"),
        *[F.lit(None).cast(dict(data.dtypes)[c]).alias(c) for c in data_cols],
    )
    dat = data.select(
        F.col(key).alias("_k"),
        F.col(ts).alias("_ts"),
        F.col(tiebreak).alias("_tb"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast("boolean").alias("_active"),
        *data_cols,
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_kind", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ctl.unionByName(dat).withColumn(
        "_state", F.last("_active", ignorenulls=True).over(w)
    )
    return merged.filter((F.col("_kind") == 1) & F.col("_state")).select(*data_cols)
