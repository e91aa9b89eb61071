"""Distributed Lloyd's k-means over embedding arrays (SURVEY.md X2
scale path: the trained-centroid upgrade the IVF module's docstring
promises — `ivf.py` uses selection-based centroids so its results are
SQL-oracle-checkable; this module trains real ones).

Deterministic by construction (reproducible across engines, runs, and
cluster sizes): every-Kth-vector init, fixed iteration count, cosine
assignment on rounded scores with centroid-id tie-break. Iterative
algorithms are exempt from the SQL-oracle gate (driver records
rows-only); correctness is pinned by invariant tests instead
(tests/test_kmeans.py).

Scale shape per iteration: assignment = corpus × broadcast(centroids)
(no corpus shuffle); update = posexplode to (cluster, dim) partial
sums — ONE shuffle of k×64 keys regardless of corpus size; the new
centroid table is k rows, re-broadcast next round. `localCheckpoint`
truncates lineage so the plan doesn't grow with iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from cdc_via_flink_spark.functions.vectors import cosine, to_double


def _nearest(v_df: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each (vec_id, v) row its nearest centroid_id."""
    scored = v_df.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "centroid_id",
        F.round(cosine(F.col("v"), F.col("cv")), 6).alias("c_cos"),
    )
    w = W.partitionBy("vec_id").orderBy(F.col("c_cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", F.col("centroid_id").alias("cluster_id"))
    )


def kmeans_fit(
    corpus: DataFrame,
    every_k: int = 40,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Train centroids; returns (centroid_id long, cv array<double>).

    centroid_id is the ordinal of the init vector (stable across
    iterations so downstream tie-breaks stay deterministic).
    """
    v_df = corpus.select(
        F.col(id_col).alias("vec_id"), to_double(F.col(vec_col)).alias("v")
    )
    cents = v_df.filter(F.col("vec_id") % every_k == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
    )
    for _ in range(max_iter):
        assigned = _nearest(v_df, cents)
        # per-dimension means via posexplode: the update shuffle is
        # k×dim keys — independent of corpus size.
        upd = (
            assigned.select("cluster_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cv")
            )
            .select(F.col("cluster_id").alias("centroid_id"), "cv")
        )
        cents = upd.localCheckpoint(eager=True)
    return cents


def ivf_kmeans_topk(
    corpus: DataFrame,
    query_ids_below: int = 5,
    every_k: int = 40,
    max_iter: int = 3,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF probe over TRAINED centroids: same plan shape as
    ivf.ivf_topk (broadcast centroids, bounded nprobe candidate
    lists), with kmeans_fit supplying the index."""
    cents = kmeans_fit(corpus, every_k=every_k, max_iter=max_iter)
    v_df = corpus.select(
        F.col("vec_id"), to_double(F.col("embedding")).alias("v")
    )
    assigned = _nearest(v_df, cents)

    q = assigned.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    q_scored = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "centroid_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("c_cos"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("centroid_id"))
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cluster_id"))
    )
    cand = probes.join(assigned, "cluster_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
    )
    # rank<=k lets Catalyst bound the sort via WindowGroupLimit
    # (see operators/similarity.py and scripts/bench_topk_stress.py).
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
