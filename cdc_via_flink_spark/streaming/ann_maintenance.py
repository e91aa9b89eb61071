"""Streaming ANN index maintenance — incremental IVF append as new
vectors ARRIVE (SURVEY.md X2 index lifecycle, live form): each
micro-batch of embeddings is routed to the persisted index's FIXED
centroid set (operators/ivf.py append semantics) and committed as a
cluster-partitioned DELTA directory behind an atomically-renamed
pointer, so the index a prober sees is always a consistent base ∪
committed-deltas view and a probe after maintenance is value-identical
to probing a monolithic rebuild with the same centroids (the invariant
sim_ivf_append_topk pins with an exact oracle).

Crash-atomicity (exactly-once epochs, compaction recovery, foreign-
checkpoint refusal) comes from the shared maintained-index kernel
(streaming/index_kernel.py — see its module docstring for the
protocol); this adapter contributes only the IVF-specific content:
what a delta holds (broadcast-argmin cluster assignments of the
batch, partitioned by cluster_id) and what a folded base looks like.

Scale: per-batch work is one map-side broadcast-argmin assignment of
the batch plus a delta-sized write; the base lists are never read or
rewritten. Readers take one extra parquet-path union per retained
delta — compaction folds committed deltas into the base offline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.operators.ivf import assign_clusters
from cdc_via_flink_spark.streaming import index_kernel as ik

MAINT_PTR = "_MAINT_COMMITTED"
COMPACT_MARKER = ik.COMPACT_MARKER


def committed_delta_dirs(index_path: str) -> list[str]:
    """Delta dirs covered by the committed pointer, epoch order."""
    return ik.committed_deltas(index_path, MAINT_PTR)


def read_maintained_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) over base lists ∪ committed deltas.
    All paths share the cluster_id partition layout, so a probe's
    dynamic partition pruning applies to every path in the union.
    Recovers a crashed compaction first so readers never observe the
    mid-swap window."""
    ik.recover_compaction(index_path, "lists")
    cents = spark.read.parquet(index_path + "/centroids")
    paths = [index_path + "/lists"] + committed_delta_dirs(index_path)
    assigned = spark.read.option("basePath", paths[0]).parquet(paths[0])
    for p in paths[1:]:
        assigned = assigned.unionByName(spark.read.parquet(p))
    return assigned, cents


def compact_maintained_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base lists: rewrite base ∪
    deltas as one cluster-partitioned layout and drop the folded delta
    dirs. MAINTAINER MUST BE STOPPED; the maintenance pointer survives
    (its epoch high-water must keep replayed epochs skipping). Crash
    at any step recovers via the kernel. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        assigned, _cents = read_maintained_index(spark, index_path)
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)

    return ik.compact_index(index_path, MAINT_PTR, "lists", write_folded)


def ann_maintenance_query(
    new_vectors: DataFrame,
    index_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the maintenance query over a streaming embeddings frame
    (vec_id long, embedding array<float>). Caller awaits."""

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        spark = batch.sparkSession
        cents = spark.read.parquet(index_path + "/centroids")
        assigned = assign_clusters(batch, cents)
        assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
            delta_tmp
        )

    return ik.run_maintenance(
        new_vectors, index_path, MAINT_PTR, "ANN index", checkpoint_dir, process
    )


# kept for callers/tests that referenced the module-level helpers
def _read_maint_ptr(index_path: str) -> tuple[int, str] | None:
    return ik.read_ptr(index_path, MAINT_PTR)


def _write_maint_ptr(index_path: str, epoch: int, run: str) -> None:
    ik.write_ptr(index_path, MAINT_PTR, epoch, run)


def _recover_compaction(index_path: str) -> None:
    ik.recover_compaction(index_path, "lists")
