"""Connected components (operators/graph.py): exact labeling on known
graphs, including a chain (forces multi-round propagation) and isolated
nodes (must self-label)."""

from __future__ import annotations

from flinkrunner_spark.operators.graph import connected_components


def _run(spark, edges, nodes):
    e = spark.createDataFrame(edges, ["src", "dst"])
    n = spark.createDataFrame([(x,) for x in nodes], ["id"])
    out = connected_components(e, n)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_components_and_singleton(spark):
    got = _run(spark, [(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 99])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}


def test_chain_needs_propagation(spark):
    # 0-1-2-...-9 as a path: diameter 9, min label must reach the far end
    edges = [(i, i + 1) for i in range(9)]
    got = _run(spark, edges, list(range(10)))
    assert got == {i: 0 for i in range(10)}


def test_cycle_and_cross_edge(spark):
    got = _run(spark, [(5, 6), (6, 7), (7, 5), (7, 3)], [3, 5, 6, 7])
    assert got == {3: 3, 5: 3, 6: 3, 7: 3}
