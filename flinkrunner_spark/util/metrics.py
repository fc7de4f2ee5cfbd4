"""Job metrics — Spark analog of the reference's MetricUtils (counters /
rates around operators, reference util/MetricUtils.scala).

Spark already meters every query; this module surfaces those numbers the
way the reference exposes operator metrics:

* ``StreamMetrics``: a ``StreamingQueryListener`` aggregating per-query
  micro-batch progress (input rows, processed rows/sec, batch durations)
  — the streaming counters the reference registers per operator.
* ``time_query``: wall-clock + row count for a batch action.

Listener callbacks run on the driver's listener bus — keep them O(1):
we only accumulate scalars per query, never rows.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class QueryStats:
    name: str = ""
    num_batches: int = 0
    input_rows: int = 0
    total_batch_ms: float = 0.0
    last_rows_per_sec: float = 0.0

    @property
    def avg_batch_ms(self) -> float:
        return self.total_batch_ms / self.num_batches if self.num_batches else 0.0


class StreamMetrics(StreamingQueryListener):
    """Aggregates micro-batch progress per streaming query id."""

    def __init__(self) -> None:
        self.stats: dict[str, QueryStats] = {}

    # StreamingQueryListener interface
    def onQueryStarted(self, event) -> None:
        self.stats[str(event.id)] = QueryStats(name=event.name or str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        s = self.stats.setdefault(str(p.id), QueryStats(name=p.name or str(p.id)))
        s.num_batches += 1
        s.input_rows += int(p.numInputRows or 0)
        s.total_batch_ms += float(
            (p.durationMs or {}).get("triggerExecution", 0) or 0
        )
        s.last_rows_per_sec = float(p.processedRowsPerSecond or 0.0)

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        pass

    def attach(self, spark: SparkSession) -> "StreamMetrics":
        spark.streams.addListener(self)
        return self

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)

    def by_name(self, name: str) -> QueryStats | None:
        for s in self.stats.values():
            if s.name == name:
                return s
        return None


@dataclass
class BatchTiming:
    rows: int
    seconds: float

    @property
    def rows_per_sec(self) -> float:
        return self.rows / self.seconds if self.seconds else 0.0


def time_query(df: DataFrame) -> BatchTiming:
    """Run a batch plan to completion (count action) and report
    rows + wall seconds — the batch analog of a rate meter."""
    t0 = time.perf_counter()
    n = df.count()
    return BatchTiming(rows=n, seconds=time.perf_counter() - t0)
