"""k-means invariant tests (iterative ops are exempt from the SQL
oracle — these pin correctness instead): centroid count, assignment
self-consistency, determinism, and one-step-of-Lloyd's convergence
property (inertia-style: mean cosine to assigned centroid does not
degrade across iterations)."""

from __future__ import annotations

import math

from cdc_via_flink_spark.operators.kmeans import _nearest, kmeans_fit
from cdc_via_flink_spark.functions.vectors import to_double
from cdc_via_flink_spark.sources.tables import load_table
from tests.conftest import SF0001

from pyspark.sql import functions as F


def _corpus(spark):
    return load_table(spark, SF0001, "embeddings")


def test_kmeans_shapes_and_determinism(spark):
    c1 = kmeans_fit(_corpus(spark), every_k=40, max_iter=2)
    c2 = kmeans_fit(_corpus(spark), every_k=40, max_iter=2)
    rows1 = {r.centroid_id: r.cv for r in c1.collect()}
    rows2 = {r.centroid_id: r.cv for r in c2.collect()}
    assert rows1.keys() == rows2.keys()
    assert len(rows1) >= 2
    for k in rows1:
        assert len(rows1[k]) == 64
        assert rows1[k] == rows2[k]  # bit-identical across runs


def test_assignment_is_nearest_final_centroid(spark):
    corpus = _corpus(spark)
    cents = kmeans_fit(corpus, every_k=40, max_iter=2)
    v_df = corpus.select("vec_id", to_double(F.col("embedding")).alias("v"))
    assigned = {r.vec_id: r.cluster_id for r in _nearest(v_df, cents).collect()}
    c = {r.centroid_id: r.cv for r in cents.collect()}
    vecs = {r.vec_id: r.v for r in v_df.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    for vid, cid in list(assigned.items())[:50]:
        best = max(c, key=lambda k: (cos(vecs[vid], c[k]), -k))
        assert cid == best


def test_iterations_do_not_degrade_fit(spark):
    corpus = _corpus(spark)
    v_df = corpus.select("vec_id", to_double(F.col("embedding")).alias("v"))

    def mean_cos(cents):
        scored = _nearest(v_df, cents)
        joined = scored.join(cents, scored.cluster_id == cents.centroid_id)
        from cdc_via_flink_spark.functions.vectors import cosine

        return joined.agg(
            F.avg(cosine(F.col("v"), F.col("cv"))).alias("m")
        ).collect()[0]["m"]

    m1 = mean_cos(kmeans_fit(corpus, every_k=40, max_iter=1))
    m3 = mean_cos(kmeans_fit(corpus, every_k=40, max_iter=3))
    assert m3 >= m1 - 1e-9  # Lloyd's never degrades the objective


def test_two_level_assign_is_nearest_within_coarse_cell(spark):
    """two_level_assign must (a) route each vector to its nearest
    COARSE cell, then (b) pick the nearest FINE centroid within that
    cell only (the IVF-style approximation), with the same rounded-
    cosine / lowest-id tie-break as _nearest at both levels."""
    from cdc_via_flink_spark.operators.kmeans import (
        two_level_assign,
        two_level_fit,
    )

    corpus = _corpus(spark)
    coarse, fine = two_level_fit(
        corpus, coarse_every_k=100, fine_every_k=25, max_iter=2, train_mod=2
    )
    v_df = corpus.select("vec_id", to_double(F.col("embedding")).alias("v"))
    got = {r.vec_id: r.cluster_id for r in two_level_assign(v_df, coarse, fine).collect()}

    cmap = {r.centroid_id: r.cv for r in coarse.collect()}
    fmap = {}
    for r in fine.collect():
        fmap.setdefault(r.coarse_id, []).append((r.centroid_id, r.cv))
    vecs = {r.vec_id: r.v for r in v_df.collect()}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    checked = 0
    for vid, cid in list(got.items())[:60]:
        v = vecs[vid]
        best_coarse = max(cmap, key=lambda k: (cos(v, cmap[k]), -k))
        cell = fmap.get(best_coarse)
        if cell is None:
            assert cid == -(best_coarse + 2)  # deterministic fallback
        else:
            best_fine = max(cell, key=lambda e: (cos(v, e[1]), -e[0]))[0]
            assert cid == best_fine, (vid, cid, best_fine)
        checked += 1
    assert checked == 60


def test_sampled_fit_keeps_every_centroid(spark):
    """k is invariant across iterations even under aggressive training
    sampling: a centroid whose (sampled) member set comes up empty
    keeps its previous position instead of silently dropping out
    (ADVICE r5 — the update groupBy alone would shrink k)."""
    corpus = _corpus(spark)
    init_k = corpus.filter(F.col("vec_id") % 10 == 0).count()
    for mod in (7, 23):
        cents = kmeans_fit(corpus, every_k=10, max_iter=3, train_mod=mod)
        assert cents.count() == init_k, mod


def test_two_level_assign_sentinels_disjoint(spark):
    """Zero-norm vectors (NULL cosines → coarse argmin returns its -1
    init) must stay at -1, NOT be re-encoded through the empty-cell
    fallback as -(-1+2) = -1 by accident of arithmetic; cells with no
    fine centroid map to -(coarse_id+2) ≥ -2 only for coarse_id ≥ 0
    (ADVICE r5 sentinel-collision guard)."""
    from cdc_via_flink_spark.operators.kmeans import two_level_assign

    coarse = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id long, cv array<double>",
    )
    # fine centroids only for coarse cell 0 — cell 1 is fine-empty
    fine = spark.createDataFrame(
        [(0, 10, [1.0, 0.1, 0.0]), (0, 11, [1.0, -0.1, 0.0])],
        "coarse_id long, centroid_id long, cv array<double>",
    )
    v_df = spark.createDataFrame(
        [
            (100, [0.0, 0.0, 0.0]),   # zero-norm → sentinel -1
            (101, [0.1, 1.0, 0.0]),   # cell 1, fine-empty → -(1+2)
            (102, [1.0, 0.05, 0.0]),  # cell 0 → nearest fine id 10
        ],
        "vec_id long, v array<double>",
    )
    got = {r.vec_id: r.cluster_id for r in two_level_assign(v_df, coarse, fine).collect()}
    assert got == {100: -1, 101: -3, 102: 10}


def test_two_level_topk_matches_single_level_any_layout(spark):
    """two_level_topk is exactly the single-level window top-k, for any
    partition layout (the blocking salt must not leak into results)."""
    from pyspark.sql import Window as W, functions as F

    from cdc_via_flink_spark.operators.topk import two_level_topk

    rows = [(q, i, float(((i * 37 + q * 11) % 100) / 10.0)) for q in range(3) for i in range(500)]
    df = spark.createDataFrame(rows, "query_id long, vec_id long, cos double")
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    expected = sorted(
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 7)
        .collect()
    )
    for parts in (1, 5, 64):
        got = sorted(
            two_level_topk(df.repartition(parts), 7, n_blocks=8)
            .select("query_id", "vec_id", "cos", "rn")
            .collect()
        )
        assert got == expected, parts


def test_ivf_kmeans_query_self_validates(spark):
    """ivf_kmeans_topk_full must carry its own correctness signal:
    per-query recall@5 vs the exact brute-force top-5, with every row
    inside the asserted floors (the declared sim_ivf_kmeans_topk
    projects this to the oracle-checkable per-query summary)."""
    from cdc_via_flink_spark.plans.similarity_queries import ivf_kmeans_topk_full
    from tests.conftest import SF001

    rows = ivf_kmeans_topk_full(spark, SF001).collect()
    assert len(rows) == 25
    assert all(r.within_bound for r in rows), [
        (r.query_id, r.recall_at_k, r.mean_recall) for r in rows
    ]
    assert all(0.0 <= r.recall_at_k <= 1.0 for r in rows)


def test_ivf_plan_sizing_and_auto_path(spark):
    """Data-driven IVF sizing (r6): nlist tracks 4·√n (the FAISS band)
    instead of growing linearly with a fixed stride — the broadcast
    centroid table stays O(√n) — and the every_k=None auto path must
    produce exactly the explicitly-sized result on a real corpus."""
    import math

    from cdc_via_flink_spark.operators.ivf import ivf_plan, ivf_topk

    for n in (1_000, 100_000, 10_000_000, 1_000_000_000):
        every_k, nlist = ivf_plan(n)
        assert abs(nlist - 4 * math.sqrt(n)) / (4 * math.sqrt(n)) < 0.35, (
            n,
            nlist,
        )
        # the broadcast centroid row stays far under executor memory
        assert nlist * 64 * 8 < 100 * 2**20, n

    corpus = _corpus(spark)
    n = corpus.count()
    derived_k, _ = ivf_plan(n)
    auto = sorted(tuple(r) for r in ivf_topk(corpus, every_k=None).collect())
    explicit = sorted(
        tuple(r) for r in ivf_topk(corpus, every_k=derived_k).collect()
    )
    assert auto == explicit and len(auto) > 0


def test_two_level_plan_sizes_k1_near_sqrt_k():
    """two_level_plan places the coarse level at k1 ~ sqrt(k), the
    O(n*sqrt(k)) operating point of the two-level assignment."""
    import math

    from cdc_via_flink_spark.operators.kmeans import two_level_plan

    for n in (10_000, 1_000_000, 1_000_000_000):
        coarse_every_k, fine_every_k = two_level_plan(n, 100)
        k = n // fine_every_k
        k1 = max(1, round(n / coarse_every_k))
        assert abs(k1 - math.sqrt(k)) / math.sqrt(k) < 0.25, (n, k1)
