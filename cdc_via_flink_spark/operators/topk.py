"""Two-level (segmented) per-group top-k — kept as an explicit
fallback, NOT used on the hot paths.

The worry: `row_number() OVER (PARTITION BY query_id ORDER BY score)`
sorts each query's ENTIRE candidate set on one task — at 100 TB × few
queries that is a single-task sort of the whole corpus. The measured
reality on Spark ≥3.5: Catalyst's rank-limit pushdown (SPARK-37099,
`WindowGroupLimit`) already makes the naive window two-level — each
map task keeps only the top-k per group BEFORE the shuffle, so only
k × n_partitions rows reach the final per-group sort. On the hot
shape (20M candidates, ONE query) the naive form beat this manual
rewrite 2.4× (scripts/bench_topk_stress.py), so the similarity/IVF/
kmeans reranks use the naive window and a plan test pins the
`WindowGroupLimit ... Partial` node that provides the guarantee.

This operator remains for engines/plans where the pushdown cannot
fire (e.g. a rank filter Catalyst can't see through):

  level 1: salt each row with its input-partition block id and take
           the top-k within every (group, block);
  level 2: top-k of the surviving ≤ k×n_blocks rows per group.

The result is IDENTICAL to the single-level window for any blocking:
the global top-k of a group is contained in the union of its blocks'
top-k, and the (score desc, id asc) total order makes the selection
unique — the output does not depend on partition layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def two_level_topk(
    scored: DataFrame,
    k: int,
    group_col: str = "query_id",
    order_col: str = "cos",
    id_col: str = "vec_id",
    n_blocks: int = 256,
) -> DataFrame:
    """Per-`group_col` top-k of `scored` by (`order_col` desc, `id_col`
    asc), computed with bounded-size sorts. Output keeps the input
    columns plus `rn` (long, 1..k)."""
    w1 = W.partitionBy(group_col, "_blk").orderBy(
        F.col(order_col).desc(), F.col(id_col)
    )
    partial = (
        scored.withColumn(
            "_blk", F.pmod(F.spark_partition_id(), F.lit(n_blocks))
        )
        .withColumn("_prn", F.row_number().over(w1))
        .filter(F.col("_prn") <= k)
        .drop("_prn", "_blk")
    )
    w2 = W.partitionBy(group_col).orderBy(F.col(order_col).desc(), F.col(id_col))
    return (
        partial.withColumn("rn", F.row_number().over(w2).cast("long"))
        .filter(F.col("rn") <= k)
    )
