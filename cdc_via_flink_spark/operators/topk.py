"""Two-level (segmented) per-group top-k.

`row_number() OVER (PARTITION BY query_id ORDER BY score)` sorts each
query's ENTIRE candidate set on one task — at 100 TB × few queries
that is a single-task sort of the whole corpus, the same skewed-window
failure mode the reconstruction path solves with `skew_block_size`.
This applies the identical segmentation idiom to top-k:

  level 1: salt each row with its input-partition block id and take
           the top-k within every (group, block) — the window's
           partitions are bounded by one input split's rows, so every
           sort is small and parallelism = n_groups × n_blocks;
  level 2: top-k of the surviving ≤ k×n_blocks rows per group — a
           trivially small sort.

The result is IDENTICAL to the single-level window for any blocking:
the global top-k of a group is contained in the union of its blocks'
top-k, and the (score desc, id asc) total order makes the selection
unique — so oracle parity is unaffected and the output does not
depend on partition layout.
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
