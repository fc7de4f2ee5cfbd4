"""Side outputs — Spark analog of Flink's OutputTag side streams
(reference flink/SideOutputSpec.scala: sinks marked ``side.output = true``
receive tagged side streams next to the main output).

Spark-first form: a side output is just another DataFrame derived from
the same plan — ``side_outputs`` returns one filtered frame per tag, and
``StreamJob.sink`` routes a dict of frames to the same-named configured
sinks. Catalyst pushes each tag's predicate into the shared scan; when
the upstream is expensive and several tags are written in one job, persist
the parent first (one materialization, N cheap filters) — the batch
equivalent of Flink emitting both streams in a single pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def side_outputs(
    df: DataFrame, outputs: dict[str, Column], persist: bool = False
) -> dict[str, DataFrame]:
    """Split ``df`` into tagged outputs. Conditions may overlap (Flink
    side outputs are independent emits, not a partition)."""
    if persist:
        df = df.persist()
    return {name: df.filter(cond) for name, cond in outputs.items()}
