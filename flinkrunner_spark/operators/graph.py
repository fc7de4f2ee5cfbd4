"""Distributed connected components over a DataFrame edge list.

The LLM-dedup pipeline needs this as the step after pairwise near-dup
detection: duplicate PAIRS must become duplicate CLUSTERS (one keeper per
component) before filtering, or transitively-linked copies survive.

Algorithm: iterative min-label propagation — every node repeatedly adopts
the smallest label among itself and its neighbors until a fixpoint. Each
round is one shuffle-join (labels ⋈ edges) plus one aggregation, all
JVM-side; the driver only checks the scalar convergence count. Rounds
needed = graph diameter, which for near-dup clusters is small (dup sets
are near-cliques — LSH links most pairs directly). For adversarially long
chain graphs the Kiveris et al. two-phase star algorithm ("Connected
Components in MapReduce and Beyond", SoCC'14) bounds rounds at O(log²n)
with the same join primitive; the propagation loop below is the right
trade for dedup workloads and stays exact regardless — it just takes more
rounds on a chain.

Scale notes (100 TB):
* State per round is one (node, label) frame — never driver-side; the
  convergence check collects a single count.
* ``localCheckpoint`` truncates the lineage each round so the plan doesn't
  grow unboundedly (iteration over DataFrames otherwise re-plans the whole
  history every round).
* Superseded round checkpoints are freed EAGERLY (``_free_checkpoint``):
  once round N+1 is materialized, round N's blocks are garbage — waiting
  for the JVM ContextCleaner would hold O(rounds) copies of the labels
  frame in executor storage, a real ceiling on a 100 TB corpus.
* Labels shuffle on the node id both in the join and the agg — one
  partitioning, reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 50


def _free_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a localCheckpoint'ed frame.

    ONLY safe on a frame nothing will read again: unpersisting a local
    checkpoint destroys its data (the lineage was truncated — there is
    nothing to recompute from). The frame must be checkpoint-backed
    directly (its analyzed plan is the LogicalRDD node)."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # not checkpoint-backed / context gone — nothing to free


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    label_col: str = "component",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` lists all node ids — isolated nodes label themselves.
    Returns (id_col, label_col), eagerly materialized (localCheckpoint):
    every intermediate round frame is freed before returning, so the
    caller holds exactly one checkpointed frame — release it with
    ``_free_checkpoint`` (or just drop the reference) when done.
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=True)

    # Iterate ONLY over nodes that touch an edge — at dedup scale that is
    # a tiny fraction of the corpus; isolated nodes join back (self-
    # labeled) once at the end instead of riding every round. The seed
    # already folds in round one: label = min(self, neighbors).
    ckpt = sym.groupBy("v").agg(
        F.least(F.first("v"), F.min("u")).alias("label")
    ).select(F.col("v").alias("id"), "label").localCheckpoint(eager=True)
    labels = ckpt

    for _ in range(max_rounds):
        # smallest label reachable in one hop (every iterated node has
        # neighbors by construction, so the join is inner)
        msgs = (
            sym.join(labels, sym["u"] == labels["id"])
            .groupBy("v")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(msgs, labels["id"] == msgs["v"])
            .select(
                "id",
                F.least(F.col("label"), F.col("nbr_label")).alias("new_label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
        ).localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("changed")).count()
        labels = updated.select("id", F.col("new_label").alias("label"))
        _free_checkpoint(ckpt)  # superseded — round N+1 is materialized
        ckpt = updated
        if n_changed == 0:
            break

    result = (
        nodes.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left_outer")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("label", "id").alias(label_col),
        )
    ).localCheckpoint(eager=True)
    _free_checkpoint(sym)
    _free_checkpoint(ckpt)
    return result
