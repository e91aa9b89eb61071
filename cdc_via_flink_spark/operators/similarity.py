"""Similarity search over embedding columns (SURVEY.md X2).

- brute_force_topk: exact cosine top-k of every query vector against
  the corpus — the oracle-verifiable baseline. Query side is tiny and
  broadcast; corpus side streams. All vector math is Catalyst
  expressions (zip_with/aggregate fold) — no Python in the hot path.
- signed random-projection LSH (sim-hash for vectors): 8 deterministic
  integer projections -> 8 sign bits -> bucket id; candidates share the
  query's bucket, then exact cosine re-rank. The scale path: bucket
  equi-join replaces the N×Q cross product. Deterministic projections
  (universal-hash ints, not RNG) keep it cross-engine reproducible.

At 100 TB the same plans hold: broadcast the query set, partition the
corpus, per-partition fold — no shuffle at all for brute-force scoring
(only the final top-k), bucket-hash shuffle for LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from cdc_via_flink_spark.functions.vectors import cosine, dot, to_double

PROJ_MOD = 1009
PROJ_SHIFT = 504
NUM_PROJ = 8


def proj_vector(j: int, dim: int = 64) -> list[int]:
    """Deterministic integer projection vector r_j (universal-hash
    family; cross-engine reproducible, no RNG)."""
    return [((2 * j + 3) * (d + 1) + 5 * j + 7) % PROJ_MOD - PROJ_SHIFT for d in range(dim)]


def with_bucket(df: DataFrame, vec_col: str, dim: int = 64) -> DataFrame:
    """Add the signed-random-projection bucket id (0..2^NUM_PROJ-1)."""
    v = to_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for j in range(NUM_PROJ):
        r = F.array(*[F.lit(float(x)) for x in proj_vector(j, dim)])
        bit = F.when(dot(v, r) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + bit * F.lit(1 << j).cast("long")
    return df.withColumn("bucket", bucket)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector. Output: query_id, vec_id,
    cos (rounded 6 — also the ordering key, with vec_id tie-break)."""
    from cdc_via_flink_spark.sources.tables import ensure_min_partitions

    c = ensure_min_partitions(corpus).select(
        F.col(id_col).alias("vec_id"), to_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"), to_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
        )
    )
    # The rank<=k filter lets Catalyst insert WindowGroupLimit (rank-
    # limit pushdown): each map task keeps only top-k per query BEFORE
    # the shuffle, so no task ever sorts a whole query's candidate set
    # even at 100 TB × few queries. Pinned by a plan test; a manual
    # two-level rewrite measured 2.4x SLOWER (scripts/bench_topk_stress.py).
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
