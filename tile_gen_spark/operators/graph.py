"""Iterative graph operators — near-dup GROUP resolution (dedup family).

The dedup operators emit candidate PAIRS (minhash_pairs, simhash_near_dups,
embedding_near_dup_pairs); an actual training-data dedup keeps ONE document
per transitively-connected group. That closure is the canonical iterative
DataFrame algorithm: min-label propagation, one equi-join + one partial agg
per round, O(component diameter) rounds.

100 TB shape: each round is one shuffle join (labels ⋈ symmetric edge list)
plus one map-side-combined min-agg — the GraphX/GraphFrames connected-
components shape re-expressed on DataFrames. Near-dup components are
shallow (dup clusters, not social graphs), so rounds stay single-digit; the
loop cuts lineage with localCheckpoint every round so plan depth — and task
re-execution cost on failure — stays O(1) per round, not O(rounds).
Convergence is detected with a count of changed labels (a scalar per round,
not a collect of data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """(id) vertices + (id_a, id_b) undirected edges → (id, component),
    component = min id reachable. Isolated vertices keep their own id.

    Min-label propagation to a fixpoint: each round every vertex takes the
    min of its own label and its neighbors' labels. Terminates in at most
    `diameter` rounds; raises if max_iter rounds don't converge (a signal
    the input is not the shallow near-dup regime this is tuned for).
    """
    sym = (edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
           .unionByName(edges.select(F.col("id_b").alias("src"),
                                     F.col("id_a").alias("dst"))))
    # near-dup edge lists are tiny relative to the corpus; let AQE pick the
    # join strategy (broadcast at test scale, shuffle hash at 100 TB)
    lbl = vertices.select(F.col("id"), F.col("id").alias("component"))
    lbl = lbl.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (sym.join(lbl, sym.src == lbl.id)
                   .groupBy(F.col("dst").alias("id"))
                   .agg(F.min("component").alias("nbr_component")))
        nxt = (lbl.join(nbr_min, "id", "left")
               .select("id",
                       F.least("component", F.coalesce("nbr_component",
                                                       "component"))
                       .alias("component"),
                       (F.col("nbr_component") < F.col("component"))
                       .alias("_changed")))
        nxt = nxt.localCheckpoint(eager=True)     # cut lineage every round
        changed = nxt.filter("_changed").count()  # scalar convergence probe
        lbl = nxt.drop("_changed")
        if changed == 0:
            return lbl
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the near-dup regime this loop targets")


def near_dup_groups(vertices: DataFrame, pairs: DataFrame,
                    max_iter: int = 25) -> DataFrame:
    """Dedup resolution over candidate pairs: (id, component, is_keeper) —
    one keeper per transitively-connected group (the min id, deterministic),
    everything else is the drop set."""
    cc = connected_components(vertices, pairs, max_iter=max_iter)
    return cc.select("id", "component",
                     (F.col("id") == F.col("component")).alias("is_keeper"))
