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


def test_rounds_reported_and_chain_worst_case(spark):
    """The stats out-param pins the round count: a clique converges in
    ~2 rounds; a length-L chain needs ~L (diameter) rounds — the
    worst-case shape the MAX_ROUNDS guard is sized against."""
    import pytest

    from pyspark.sql import functions as F

    # near-clique (the dedup shape): star 0-{1..5} plus chords
    stats = {}
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(1, 2), (3, 4)], ["src", "dst"]
    )
    n = spark.range(6).select(F.col("id").cast("long"))
    out = connected_components(e, n, stats=stats)
    assert {r["component"] for r in out.collect()} == {0}
    assert stats["converged"] and stats["rounds"] <= 3
    # a near-clique never reaches the shortcut — its plan is the pure
    # propagation loop (r6 verdict: docs_dup_clusters plan unchanged)
    assert stats["shortcut_rounds"] == 0

    # chain of 20 (diameter 19): pointer doubling engages after round 3
    # and squares the covered distance — convergence in O(log n), far
    # under the old ~diameter rounds
    stats = {}
    e = spark.createDataFrame([(i, i + 1) for i in range(19)], ["src", "dst"])
    n = spark.range(20).select(F.col("id").cast("long"))
    out = connected_components(e, n, stats=stats)
    assert {r["component"] for r in out.collect()} == {0}
    assert stats["converged"] and 4 <= stats["rounds"] <= 10
    assert stats["shortcut_rounds"] >= 1

    # guard: a cap too small to cover the diameter still RAISES instead
    # of returning silently-wrong labels
    e = spark.createDataFrame([(i, i + 1) for i in range(19)], ["src", "dst"])
    n = spark.range(20).select(F.col("id").cast("long"))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(e, n, max_rounds=4)


def test_ten_thousand_chain_converges_logarithmically(spark):
    """r6 verdict #5's done-criterion: a 10k-node chain (diameter 9999 —
    propagation alone would need ~10k rounds and the old code RAISED at
    the 50-round guard) converges via the interleaved pointer-doubling
    in O(log n) rounds, with exact labels."""
    from pyspark.sql import functions as F

    stats = {}
    e = spark.range(9999).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    n = spark.range(10000).select(F.col("id").cast("long"))
    out = connected_components(e, n, stats=stats)
    got = {r["id"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(10000)}
    assert stats["converged"]
    assert stats["rounds"] <= 20, stats  # ~log2(10^4) + seed + confirm
    assert stats["shortcut_rounds"] >= 5
