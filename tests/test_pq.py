"""Product quantization (operators/pq.py): codebook shape, code
validity, determinism, and the recall floor of the rerank pattern.
Invariant tests stand in for the SQL oracle the iterative training
makes impossible (same policy as tests/test_kmeans.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.pq import pq_fit, pq_rerank_topk, pq_topk
from cdc_via_flink_spark.operators.similarity import brute_force_topk
from cdc_via_flink_spark.sources.tables import load_table
from tests.conftest import SF0001

M, K, DSUB = 8, 16, 8


def test_codebook_shape_and_code_range(spark):
    e = load_table(spark, SF0001, "embeddings")
    cb = pq_fit(e, m=M, codebook_k=K, max_iter=2).head()["cb"]
    assert len(cb) == M
    assert all(1 <= len(cbm) <= K for cbm in cb)
    assert all(len(c) == DSUB for cbm in cb for c in cbm)
    # every codeword is finite
    assert all(all(abs(x) < 1e6 for x in c) for cbm in cb for c in cbm)


def test_adc_topk_shape_and_determinism(spark):
    e = load_table(spark, SF0001, "embeddings")
    a = pq_topk(e, query_ids_below=3, k=5).collect()
    b = pq_topk(e, query_ids_below=3, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    per_q = {}
    for r in a:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.vec_id != r.query_id
    assert set(per_q) == {0, 1, 2}
    for rows in per_q.values():
        assert sorted(r.rn for r in rows) == [1, 2, 3, 4, 5]
        ordered = sorted(rows, key=lambda r: r.rn)
        scores = [r.score for r in ordered]
        assert scores == sorted(scores, reverse=True)


def test_rerank_recall_floor_and_exactness(spark):
    """The reranked scores must be EXACT cosines (the shortlist fetch
    reranks original vectors), and recall@5 vs brute force must clear
    the declared floor."""
    e = load_table(spark, SF0001, "embeddings")
    pq = pq_rerank_topk(e, query_ids_below=5, shortlist=100, k=5)
    exact = brute_force_topk(
        e,
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=100,
    ).select("query_id", "vec_id", F.col("cos").alias("exact_cos"))
    j = pq.join(exact, ["query_id", "vec_id"], "left").collect()
    hits = [r for r in j if r.exact_cos is not None]
    # every reranked candidate that IS in the exact top-100 carries the
    # identical rounded cosine — rerank is exact, not approximate
    assert hits and all(abs(r.cos - r.exact_cos) < 1e-9 for r in hits)

    top5 = brute_force_topk(
        e,
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5,
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    rec = (
        pq.join(top5, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.avg(F.coalesce("hit", F.lit(0))).alias("recall"))
        .collect()
    )
    mean = sum(r.recall for r in rec) / len(rec)
    assert mean >= 0.4, [(r.query_id, r.recall) for r in rec]


def test_ivfpq_composed_determinism_and_recall(spark):
    """IVFPQ: deterministic across runs; reranked scores are exact
    cosines; composed recall clears the floor at sf0.001."""
    from cdc_via_flink_spark.operators.pq import ivfpq_topk

    e = load_table(spark, SF0001, "embeddings")
    a = ivfpq_topk(e, query_ids_below=5, nprobe=8, shortlist=100, k=5).collect()
    b = ivfpq_topk(e, query_ids_below=5, nprobe=8, shortlist=100, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    top5 = brute_force_topk(
        e,
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        ),
        k=5,
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    import pyspark.sql.functions as SF

    got = spark.createDataFrame(a)
    rec = (
        got.join(top5, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(SF.avg(SF.coalesce("hit", SF.lit(0))).alias("recall"))
        .collect()
    )
    mean = sum(r.recall for r in rec) / len(rec)
    assert mean >= 0.4, [(r.query_id, r.recall) for r in rec]
