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
- for web-scale or deep graphs use connected_components_two_phase
  (large-star/small-star, implemented below): O(log^2 diameter)
  rounds vs O(diameter); the min-label round is the simpler tool for
  dedup graphs, whose components are small and shallow, and each
  labels components identically (equivalence-tested).
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

    changed = -1  # max_iter <= 0 must hit the non-convergence raise
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
            f"({changed} labels still changing); raise max_iter or use "
            "connected_components_two_phase for deep components"
        )
    return labels


def connected_components_two_phase(edges: DataFrame, src: str = "src",
                                   dst: str = "dst",
                                   max_iter: int = 25) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    'Connected Components in MapReduce and Beyond') -- the web-scale
    upgrade over min-label propagation: rounds needed are
    O(log^2 diameter) rather than O(diameter), so deep/chained
    components (exactly what near-dup graphs degenerate into when a
    template document links long chains) converge in a handful of
    rounds.

    Each round rewrites the edge set:
    - large-star: for every node u, connect each strictly-larger
      neighbor v > u to m = min(neighborhood(u) + u). Breaks tall
      stars apart without losing connectivity.
    - small-star: connect each neighbor v <= u (and u) to m. Flattens
      everything onto local minima.
    Per round each phase is a groupBy("a").agg(min("b")) -- which DOES
    combine map-side, so a star root costs one number per map task --
    joined back to the edge list to emit (v, m) per edge. No neighbor
    array is ever materialized (a collect_list would put an entire
    component's neighborhood into one reducer row for star roots --
    ADVICE r2); the residual hot spot is join skew on the root's key,
    which AQE's skew-join splitting handles.

    Returns (id, comp) = min node id of each component, identical to
    connected_components (equivalence is regression-tested)."""
    # materialize the input ONCE: nodes and e both derive from raw, and
    # the caller's edge list may carry an arbitrarily expensive lineage
    # (the curation capstone feeds the whole banded-LSH chain in here)
    # -- without this checkpoint that upstream would evaluate twice
    raw = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    # node set from RAW edges, before the self-loop filter: a node whose
    # only edge is a self-loop must still appear in the output (as its
    # own component), matching connected_components
    nodes = raw.select(F.col("a").alias("id")).union(
        raw.select(F.col("b").alias("id"))
    ).distinct()
    # canonical undirected edge set, no self loops
    e = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint()
    )

    def _is_star_forest(cur: DataFrame) -> bool:
        # Fixpoint test, checked BEFORE each round: the canonical edge
        # set is a correct answer iff (1) no node is both a parent (a)
        # and a member (b) and (2) no member has two parents. The
        # edges then form disjoint two-level stars; every stored edge
        # has a < b, so each root is strictly below all its members
        # and no other edge touches the star, i.e. the root IS the
        # component minimum (the Kiveris et al. fixpoint shape), and
        # since every round preserves connectivity this labels the
        # ORIGINAL graph correctly too. Both violation scans union
        # into one limit(1) job over checkpointed data -- vs. the
        # count+exceptAll set-equality check this replaces, which
        # also needed a whole extra (no-op) round just to observe
        # that nothing changed. Condition (2) is not redundant:
        # {(1,3),(2,3)} passes (1) alone but under-merges.
        parent_and_member = (
            cur.select("a")
            .join(cur.select(F.col("b").alias("a")), "a", "left_semi")
            .select(F.lit(1).alias("v"))
        )
        multi_parent = (
            cur.groupBy("b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(F.lit(1).alias("v"))
        )
        return parent_and_member.union(multi_parent).limit(1).count() == 0

    for _ in range(max_iter):
        if _is_star_forest(e):
            break
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        # large-star: per node u, m = min(min neighbor, u); emit (v, m)
        # for neighbors v > u. min() combines map-side; the per-edge
        # fan-out comes from joining the scalar m back to the edges, so
        # no task ever holds a whole neighborhood (ADVICE r2).
        mins = sym.groupBy("a").agg(F.min("b").alias("min_nbr"))
        m = F.least(F.col("a"), F.col("min_nbr"))
        large = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(
                F.least(F.col("b"), m).alias("a"),
                F.greatest(F.col("b"), m).alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star on the large-star output
        sym2 = large.union(
            large.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        mins2 = sym2.groupBy("a").agg(F.min("b").alias("min_nbr"))
        m2 = F.least(F.col("a"), F.col("min_nbr"))
        new_e = (
            sym2.join(mins2, "a")
            .filter(F.col("b") <= F.col("a"))
            .select(
                F.least(F.col("b"), m2).alias("na"),
                F.greatest(F.col("b"), m2).alias("nb"),
            )
            .union(mins2.select(m2.alias("na"), F.col("a").alias("nb")))
            .filter(F.col("na") != F.col("nb"))
            .select(F.col("na").alias("a"), F.col("nb").alias("b"))
            .distinct()
            .localCheckpoint()
        )
        e = new_e
    else:
        if not _is_star_forest(e):
            raise RuntimeError(
                f"two-phase connected components did not converge in "
                f"{max_iter} rounds"
            )
    # at fixpoint every edge is (root, member); roots label themselves
    labels = e.select(F.col("b").alias("id"), F.col("a").alias("comp"))
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("comp", F.col("id")).alias("comp"))
    )
