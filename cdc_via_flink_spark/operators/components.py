"""Connected components over a pair graph — the missing last step of
any near-dup pipeline: LSH/Jaccard emit PAIRS, but dedup needs
CLUSTERS (one keeper per duplicate set, transitively closed:
A~B, B~C => {A,B,C} share a keeper).

Spark-first iterative algorithm (the reference has no iterative
operator at all — this extends SURVEY.md X1): min-label propagation.
Each node starts labeled with itself; every round each node adopts the
minimum label among itself and its neighbors; fixpoint = components
labeled by their minimum member. The driver loop only orchestrates —
per-round work is two keyed DataFrame shuffles (neighbor-join +
min-agg), all data stays distributed. Rounds needed = graph diameter
(near-dup clusters are shallow — a handful of rounds); `max_iter`
bounds the worst case, and `localCheckpoint` truncates the growing
lineage each round so the plan stays bounded.

At 100 TB: this is the standard large/small-star-family shape (two
shuffles per round on the edge list); duplicate-cluster graphs are
tiny relative to the corpus because the pair stage already pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    use_checkpoint: bool = True,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with its
    component's minimum vertex id.

    Input: edge frame with columns ``src``/``dst``.
    Output: (node long, component long), one row per distinct vertex.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # undirected: keep both directions, so one join covers all neighbors
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
                (
                    F.coalesce("nbr_component", F.col("component"))
                    < F.col("component")
                ).alias("_changed"),
            )
        )
        if use_checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels
