"""Connected components over a pair graph — the missing last step of
any near-dup pipeline: LSH/Jaccard emit PAIRS, but dedup needs
CLUSTERS (one keeper per duplicate set, transitively closed:
A~B, B~C => {A,B,C} share a keeper).

Spark-first iterative algorithm (the reference has no iterative
operator at all — this extends SURVEY.md X1): min-label propagation
accelerated with POINTER JUMPING. Each node starts labeled with
itself; every round each node adopts the minimum label among itself
and its neighbors (two keyed shuffles: neighbor-join + min-agg), then
shortcuts through the label graph — component <- label(component) —
which halves remaining path lengths (one more keyed self-join). With
the shortcut step, rounds needed = O(log diameter) instead of
O(diameter): a 1000-node chain converges in ~10 rounds, not 999 (the
large/small-star family's bound, achieved with simpler per-round
plans). `localCheckpoint` truncates the growing lineage each round so
the plan stays bounded, and non-convergence within `max_iter` raises
(or warns) instead of silently returning split clusters.

At 100 TB: per-round work is three keyed shuffles on the edge/label
lists; duplicate-cluster graphs are tiny relative to the corpus
because the pair stage already pruned.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    use_checkpoint: bool = True,
    strict: bool = True,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with its
    component's minimum vertex id.

    Input: edge frame with columns ``src``/``dst``.
    Output: (node long, component long), one row per distinct vertex.

    If the labels have not converged after ``max_iter`` rounds the
    result would be WRONG (split clusters), so this raises
    ``RuntimeError`` (``strict=True``, default) or emits a
    ``RuntimeWarning`` (``strict=False``) rather than stay silent.
    With pointer jumping, max_iter=20 covers diameters up to ~2^19.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # undirected: keep both directions, so one join covers all neighbors
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if use_checkpoint:
        # materialize the edge list ONCE: every propagation round joins
        # against sym, and without this the whole upstream pair
        # pipeline (LSH banding + verify) re-enters the plan — and may
        # re-execute — per round; duplicate-cluster edge lists are
        # collision-bounded, so the materialization is small
        sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("nbr_component", F.col("component"))
            ).alias("component"),
        )
        # pointer jumping: component <- label(component). The label is
        # always a node id inside the same component, so shortcutting
        # through it stays correct, is monotone decreasing, and halves
        # the remaining hop distance to the component minimum.
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_component")
        )
        jumped = (
            stepped.join(parent, stepped.component == parent.p_node, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("p_component", F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = (
            labels.select(F.col("node"), F.col("component").alias("old_component"))
            .join(jumped, "node")
            .select(
                "node",
                "component",
                (F.col("component") < F.col("old_component")).alias("_changed"),
            )
        )
        if use_checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break

    if not converged:
        msg = (
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds; labels would be split clusters. Raise max_iter."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels
