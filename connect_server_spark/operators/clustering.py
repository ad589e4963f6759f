"""Near-dup clustering: connected components over candidate-pair output,
then canonical-document selection — the stage between "these pairs are
near-duplicates" and "keep THIS copy, drop those" that a training-data
pipeline actually acts on.

Scale design: min-label propagation with **pointer jumping** over the
(undirected) pair edges. Every iteration is two narrow shuffles — edges
join the current label table on an 8-byte id and aggregate a per-node
neighbor minimum (map-side combined); then labels self-join once to
compress ``component → component-of-component`` (the pointer-doubling /
path-halving step of classic PRAM connectivity, same device as
Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014). The jump makes the distance a label travels per round
roughly double, so a length-k chain converges in O(log k) rounds, not k
— near-dup stars/cliques still finish in 2–3, and adversarial chains
are bounded instead of hitting the iteration cap. Labels are
``localCheckpoint``-ed each round to keep the lineage flat (an
iterative DataFrame loop otherwise re-plans the whole history each
round), and the loop STOPS as soon as a round changes nothing.

Correctness invariants: labels start at self, only ever decrease, and
never drop below the true component minimum (both the neighbor-min and
the jump assign some reachable node's current label); at the fixpoint
every edge's endpoints agree, so all labels in a component equal its
minimum id. The driver-side loop only ever touches counts — node labels
stay distributed throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from connect_server_spark.execution import stage_boundary

__all__ = ["connected_components", "assign_clusters"]


class ConvergenceError(RuntimeError):
    """Raised when label propagation hits ``max_iterations`` while labels
    are still moving — wrong components must never be returned silently."""


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``, where
    ``component`` is the minimum node id reachable through the pair
    graph — deterministic, engine-independent labels."""
    # Materialize the edge list ONCE: every round re-references it, and
    # without the checkpoint each iteration would re-run the entire
    # upstream candidate-pair pipeline (MinHash, prefix filtering, ...)
    # — the iterative loop must iterate over edges, not over the plan
    # that produced them.
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionAll(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .transform(stage_boundary, eager=True, pin=True)
    )
    # r12 (guide §1.2/§5.4 — cut sequential driver jobs, same fixpoint):
    # initialize each label at min(id, min neighbor) instead of self.
    # The init aggregation costs the same one shuffle the old
    # distinct() did (edges are symmetrized, so every node appears as
    # `a`), but it performs round 1's neighbor-min for free — one fewer
    # full loop round. Every invariant is preserved: the init value is
    # a reachable node's id, labels still only decrease, and the
    # fixpoint (= component minimum) is algorithm-independent.
    labels = (
        edges.groupBy("a")
        .agg(F.min("b").alias("_mb"))
        .select(
            F.col("a").alias("id"),
            F.least(F.col("a"), F.col("_mb")).alias("component"),
        )
        .transform(stage_boundary, pin=True)
    )
    for _ in range(max_iterations):
        nbr_min = (
            edges.join(labels, edges["b"] == labels["id"])
            .groupBy("a")
            .agg(F.min("component").alias("_nbr"))
        )
        merged = labels.join(
            nbr_min, labels["id"] == nbr_min["a"], "left"
        ).select(
            labels["id"],
            labels["component"].alias("_old"),
            F.least(
                labels["component"],
                F.coalesce(F.col("_nbr"), labels["component"]),
            ).alias("_c1"),
        )
        # pointer jump: component ← component's own (post-min) label.
        # Component values are always node ids present in the label table,
        # so the lookup is a plain equi-join; labels only decrease
        # (ℓ(x) ≤ x throughout), so the jump preserves monotonicity.
        lookup = merged.select(
            F.col("id").alias("_jid"), F.col("_c1").alias("_jc")
        )
        # r12 (guide §5.4): the boundary is LAZY and the convergence
        # count is its materializing action — one job per round where
        # the old eager-checkpoint-then-count shape ran two. The count
        # touches every partition, so the round's labels are fully
        # pinned (and lineage severed) by the time the next round — or
        # the return — reads them.
        jumped = (
            merged.join(lookup, merged["_c1"] == lookup["_jid"], "left")
            .select(
                "id",
                "_old",
                F.coalesce(F.col("_jc"), F.col("_c1")).alias("component"),
            )
            .transform(stage_boundary, pin=True)
        )
        changed = jumped.filter(F.col("component") != F.col("_old")).count()
        labels = jumped.drop("_old")
        if changed == 0:
            return labels
    raise ConvergenceError(
        f"components still moving after {max_iterations} iterations"
    )


def assign_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Fold components back over the FULL corpus: every document gets a
    ``component`` (its own id when it has no near-dup), a
    ``cluster_size``, and ``is_canonical`` (the minimum id of its
    component — the copy a dedup pass keeps). The corpus body columns
    never enter the component computation, and — critically for the
    100 TB bar — the corpus is never partitioned by ``component``: a
    boilerplate farm collapsing 10⁸ documents into one component must
    not land them all in one task (which is exactly what a
    ``Window.partitionBy(component)`` or a shuffle join-back on
    component would do).

    ``cluster_size`` instead comes from the GRAPH-NODE label table
    (one row per near-dup document): ``groupBy(component).count()``
    there is skew-proof — hash partial aggregation combines map-side,
    so the reduce side sees one partial row per (task, component), not
    the raw rows (the same device as an explicit two-phase
    ``groupBy(component, salt)`` → ``groupBy(component)``, done by the
    engine per task). The resulting one-row-per-component sizes table
    is bounded by the number of multi-document clusters, so it
    **broadcast**-joins back to the corpus on ``component`` — the full
    corpus is shuffled by nothing at all. Documents outside the pair
    graph never enter the join; their size coalesces to 1."""
    comps = connected_components(pairs, src, dst)
    sizes = comps.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    assigned = docs.join(
        comps.withColumnRenamed("id", id_col), on=id_col, how="left"
    ).withColumn("component", F.coalesce("component", F.col(id_col)))
    return (
        assigned.join(F.broadcast(sizes), on="component", how="left")
        .withColumn("cluster_size", F.coalesce("cluster_size", F.lit(1)))
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
        .select(*docs.columns, "component", "cluster_size", "is_canonical")
    )
