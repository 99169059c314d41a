"""Connected components by min-label propagation: the clustering step
that turns near-duplicate *pairs* into dedup *groups* (keep one doc per
component).

Iterative DataFrame algorithm (the GraphX/GraphFrames-free version):
each node's label starts as its own id; every round, each node takes
the min of its label and its neighbors' labels; converges in
O(component diameter) rounds. Per round: one shuffle (the groupBy on
the edge src).

Scale rules encoded here:
- localCheckpoint each round: an iterative loop otherwise builds an
  unbounded lineage -- plan size grows linearly, and the optimizer
  re-analyzes the whole history every round.
- convergence is checked with a count of changed labels (an action per
  round -- inherent to any fixpoint loop).
- for web-scale graphs the upgrade is the large-star/small-star
  algorithm (fewer rounds on skewed degree distributions); the
  min-label round below is the right tool for dedup graphs, whose
  components are small and shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 25) -> DataFrame:
    """(src, dst) edge list -> (id, component) with component = min
    node id in the component. Nodes = every endpoint; callers union in
    isolated nodes afterwards if needed.

    Raises RuntimeError if the fixpoint has not converged after
    max_iter rounds (component diameter > max_iter) -- silently
    returning split components would corrupt downstream dedup groups
    without any signal (ADVICE r1)."""
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neigh_min = (
            sym.join(labels, sym["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neigh_min, labels["id"] == neigh_min["a"], "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # cut lineage every round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); raise max_iter or switch "
            "to the large-star/small-star variant for deep components"
        )
    return labels
