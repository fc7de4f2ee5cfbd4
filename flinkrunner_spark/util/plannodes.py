"""Plan-node introspection — the Spark analog of the reference's
`model/StreamNodeInfo.scala` (which walks the Flink StreamGraph and
reports each node's id/name/kind for metrics and debugging): here the
tree is Catalyst's executed SparkPlan, serialized via the engine's own
``toJSON`` so the inventory reflects exactly what will run (after AQE,
codegen collapsing, exchange insertion)."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame


def stream_nodes(df: DataFrame) -> list[dict]:
    """One dict per physical plan node, pre-order: ``id`` (position),
    ``name`` (simple class name, e.g. HashAggregateExec),
    ``num_children``, and ``kind`` — ``source`` for leaves (scans),
    ``sink`` for the root (where rows leave the plan), ``transform``
    otherwise; mirroring StreamNodeInfo's source/transform/sink
    classification of graph nodes."""
    plan = df._jdf.queryExecution().executedPlan()
    # AQE wraps the real tree in AdaptiveSparkPlanExec, which serializes
    # as a single childless node — unwrap to its current physical plan
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    raw = json.loads(plan.toJSON())
    out = []
    for i, node in enumerate(raw):
        n_children = int(node.get("num-children", 0))
        kind = (
            "sink" if i == 0 else "source" if n_children == 0 else "transform"
        )
        out.append(
            {
                "id": i,
                "name": node["class"].split(".")[-1],
                "num_children": n_children,
                "kind": kind,
            }
        )
    return out
