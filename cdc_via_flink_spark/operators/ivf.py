"""IVF-style ANN index (SURVEY.md X2 scale path, alternative to the
random-projection LSH): partition the corpus into inverted lists by
nearest centroid; queries probe only the nprobe closest lists.

Real IVF trains centroids with k-means; to stay deterministic and
cross-engine-verifiable this uses selection-based centroids (every
K-th vector by id — "training-free IVF"). The plan shapes are
identical to a trained index: centroid table broadcast everywhere,
corpus shuffled once by cluster id, queries probing a bounded number
of lists. Swapping in k-means centroids changes only the centroid
frame.

Scale: assignment = corpus × centroids broadcast (no shuffle of the
corpus), probe = equi-join on cluster_id (shuffle bounded by the
candidate lists, not the corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from cdc_via_flink_spark.functions.vectors import cosine, to_double


IVF_NLIST_FACTOR = 4  # FAISS guidance: nlist ≈ 4–16 · √n


def ivf_plan(n: int, nlist_factor: int = IVF_NLIST_FACTOR) -> tuple[int, int]:
    """Data-driven IVF sizing: (every_k, nlist_estimate) for a corpus
    of n vectors, targeting nlist ≈ nlist_factor·√n (the FAISS
    operating band). A FIXED every_k makes nlist = n/every_k grow
    LINEARLY with the corpus — at 10⁹ vectors that is 2.5·10⁷
    centroids (a ~13 GB broadcast array) and an O(n·nlist) = O(n²/40)
    assignment argmin: the same flat-assignment scale bug SemDeDup's
    two-level rebuild fixed. √n-sizing keeps both sides bounded: the
    broadcast centroid row is O(√n) structs (126 k / ~65 MB at 10⁹ —
    an explicit broadcast, cheap against executor memory) and a probe
    scans nprobe·n/nlist = O(√n) candidates per query. Beyond ~10⁶
    lists, route assignment through kmeans.two_level_fit/assign
    (O(n·√nlist) work) instead of the flat argmin.

    Declared queries pin every_k explicitly (their SQL oracles mirror
    the stride); this helper is the production caller's sizing,
    derived from a catalog rowcount or the one-row count probe the
    every_k=None auto path performs."""
    import math

    every_k = max(1, round(math.sqrt(max(n, 1)) / nlist_factor))
    return every_k, max(1, n // every_k)


def centroids(corpus: DataFrame, every_k: int | None = 40) -> DataFrame:
    """Deterministic centroid selection: every K-th vector.
    every_k=None derives the stride from the corpus cardinality via
    ivf_plan (one tiny count aggregate — the PQ-fit precedent)."""
    if every_k is None:
        n = corpus.agg(F.count(F.lit(1)).alias("n")).head()["n"]
        every_k, _ = ivf_plan(n)
    return corpus.filter(F.col("vec_id") % every_k == 0).select(
        F.col("vec_id").alias("centroid_id"),
        to_double(F.col("embedding")).alias("cv"),
    )


def assign_clusters(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector (cosine, rounded ordering key +
    centroid-id tie-break). Pure map-side: the centroid table rides as
    ONE broadcast array row and the argmin is an expression fold
    (operators/kmeans._nearest) — no n×k row expansion, no window
    exchange; the corpus is never shuffled."""
    from cdc_via_flink_spark.operators.kmeans import _nearest
    from cdc_via_flink_spark.sources.tables import ensure_min_partitions

    v = ensure_min_partitions(corpus).select(
        F.col("vec_id"), to_double(F.col("embedding")).alias("v")
    )
    return _nearest(v, cents)


def ivf_topk(
    corpus: DataFrame,
    query_ids_below: int = 5,
    every_k: int | None = 40,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Probe the nprobe nearest inverted lists per query, exact cosine
    re-rank inside them, top-k. Output: query_id, vec_id, cos, rn."""
    cents = centroids(corpus, every_k)
    assigned = assign_clusters(corpus, cents)
    return probe_index(assigned, cents, query_ids_below, nprobe, k)


def save_index(corpus: DataFrame, path: str, every_k: int | None = 40) -> None:
    """Persist the IVF index — build once, query many (the production
    ANN lifecycle; FAISS write_index analog): the centroid table plus
    the cluster assignments written PARTITIONED BY cluster_id, so a
    probe's equi-join against the broadcast probe set triggers dynamic
    partition pruning and reads ONLY the probed lists' files — at
    100 TB a query touches nprobe/k_lists of the index bytes."""
    cents = centroids(corpus, every_k)
    assigned = assign_clusters(corpus, cents)
    cents.write.mode("overwrite").parquet(path + "/centroids")
    assigned.write.mode("overwrite").partitionBy("cluster_id").parquet(
        path + "/lists"
    )


def load_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """(assignments, centroids) back from save_index's layout."""
    cents = spark.read.parquet(path + "/centroids")
    assigned = spark.read.parquet(path + "/lists")
    return assigned, cents


def append_index(spark, new_corpus: DataFrame, path: str) -> None:
    """Incremental IVF maintenance (the production ANN append path —
    FAISS add() analog): route NEW vectors to the index's EXISTING
    centroids (fixed — periodic retrain is a rebuild, not an append)
    and append their assignments to the persisted inverted lists.

    Because the centroid set is unchanged, a probe after maintenance
    is value-identical to probing an index built monolithically over
    base ∪ appended with the same centroids — pinned directly by
    tests/test_ann_maintenance.py::test_batch_append_index_equals_monolithic;
    the STREAMING maintainer (streaming/ann_maintenance.py, which the
    declared sim_ivf_append_topk query exercises against an exact
    oracle) holds the same invariant with crash-atomic delta commits
    on top.
    Scale: assignment of the delta is map-side (broadcast centroid
    array argmin), the append writes only the delta's bytes into the
    cluster-partitioned layout; the existing lists are never read or
    rewritten. Caller manages replay idempotency (the streaming
    maintainer streaming/ann_maintenance.py uses committed delta dirs
    instead of raw appends for exactly that reason)."""
    cents = spark.read.parquet(path + "/centroids")
    assigned = assign_clusters(new_corpus, cents)
    assigned.write.mode("append").partitionBy("cluster_id").parquet(
        path + "/lists"
    )


def probe_index(
    assigned: DataFrame,
    cents: DataFrame,
    query_ids_below: int = 5,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """The probe phase over an (in-memory or loaded) index."""
    q = assigned.filter(F.col("vec_id") < query_ids_below).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return probe_index_queries(assigned, cents, q, nprobe=nprobe, k=k)


def probe_index_queries(
    assigned: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Probe with an EXPLICIT query frame (query_id, qv array<double>)
    — the serving-path entry point: the streaming ANN server
    (plans/streaming_queries.py::stream_ivf_probe) feeds each
    micro-batch of arriving query vectors through this against a
    static loaded index. Self-matches (vec_id == query_id) are
    excluded, as in probe_index."""
    q = queries
    q_probe = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qv",
        "centroid_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("c_cos"),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("c_cos").desc(), F.col("centroid_id"))
    probes = (
        q_probe.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("cluster_id"))
    )

    cand = assigned.join(
        F.broadcast(probes), "cluster_id"
    ).filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos"),
    )
    # rank<=k lets Catalyst bound the sort via WindowGroupLimit
    # (see operators/similarity.py and scripts/bench_topk_stress.py).
    wk = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(wk).cast("long"))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cos", "rn")
    )
