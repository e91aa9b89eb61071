"""Staged retrieval pipeline on the engine's public query surface —
the read path of a RAG stack, each stage a declared (oracle-checked)
operator:

    keyword candidates   text_bm25_topk        (broadcast posting
                                                semi-join, top-k)
    hybrid fusion        text_rrf_hybrid_topk  (BM25 + Dirichlet QL,
                                                reciprocal-rank fuse)
    diversified rerank   sim_mmr_rerank        (embedding MMR over the
                                                ANN candidate pool)
    context assembly     join back to `documents` for the text the
                         prompt window actually receives

The fixture's `vec_id` aligns with `doc_id`, so the lexical and
vector stages talk about the same corpus. At 100 TB each stage keeps
its own scale story (posting-list semi-joins, WindowGroupLimit
top-k, pool-bounded MMR) — the composition adds joins on the tiny
result frames only.

Run: ``python examples/retrieval_pipeline.py [sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

import cdc_via_flink_spark as eng
from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.sources.tables import load_table


def build_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, step, doc_id, mmr_score, rrf_evidence, snippet):
    the diversified 5-doc context per embedding query, annotated with
    whether the lexical stage independently surfaced the doc."""
    specs = load_all()
    rrf = specs["text_rrf_hybrid_topk"].fn(spark, sf_dir)
    mmr = specs["sim_mmr_rerank"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("snippet")
    )
    lexical = rrf.select(F.col("doc_id").alias("vec_id")).distinct()
    return (
        mmr.join(
            lexical.withColumn("rrf_evidence", F.lit(True)), "vec_id", "left"
        )
        .join(docs, mmr.vec_id == docs.doc_id)
        .select(
            "query_id",
            "step",
            "doc_id",
            F.col("score").alias("mmr_score"),
            F.coalesce("rrf_evidence", F.lit(False)).alias("rrf_evidence"),
            "snippet",
        )
        .orderBy("query_id", "step")
    )


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = eng.get_spark("retrieval-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    bm25 = specs["text_bm25_topk"].fn(spark, sf_dir)
    print("== keyword stage (BM25 top-k) ==")
    bm25.show(10, truncate=False)

    print("== hybrid fusion (RRF over BM25 + query-likelihood) ==")
    specs["text_rrf_hybrid_topk"].fn(spark, sf_dir).show(10, truncate=False)

    print("== diversified context (MMR over the embedding pool) ==")
    ctx = build_context(spark, sf_dir)
    ctx.show(25, truncate=False)
    n = ctx.count()
    print(f"context rows: {n} (5 queries x 5 diversified picks)")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
