"""End-to-end training-data preparation pipeline on the engine's
public API: the corpus path a pre-training data team runs daily —

    raw documents
      → exact dedup (normalized-text hash)
      → near-dup removal (MinHash-LSH pair graph → keep cluster min)
      → quality filter (token/stopword heuristics)
      → deterministic train/valid/test split (md5 buckets)
      → eval decontamination (winnowing fingerprints: drop train docs
        sharing local fingerprints with the test split)
      → stratified language rebalance (hash sampling)
      → greedy token-budget sequence packing
      → per-split packed-corpus stats

Every step is a declarative DataFrame op (Catalyst-optimized, no RNG,
no collect) except the greedy packer, which crosses to Python once via
Arrow with a slim projection. Run: ``python examples/train_pipeline.py
[sf_dir]``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import cdc_via_flink_spark as eng
from cdc_via_flink_spark.functions.text import tokens
from cdc_via_flink_spark.operators.components import connected_components

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def build_corpus(spark, sf_dir: str):
    """Returns the packed corpus DataFrame: one row per (split, lang,
    shard, bin) packed sequence with doc and token counts."""
    docs = eng.load_table(spark, sf_dir, "documents")

    # 1. exact dedup: keep the smallest doc_id per normalized text
    keepers = eng.exact_dedup(docs, "text", "doc_id").select(
        F.col("keeper_id").alias("doc_id")
    )
    docs = docs.select("doc_id", "text", "lang").join(keepers, "doc_id", "left_semi")

    # 2. near-dup removal: LSH pair graph → connected components →
    #    keep each cluster's representative (min doc_id)
    pairs = eng.minhash_lsh_neardup(docs, "text", "doc_id")
    clusters = connected_components(pairs.select("id_a", "id_b"))
    drop = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")

    # 3. quality filter: enough words, not stopword-soup
    tk = tokens(F.col("text"))
    n_words = F.size(tk)
    n_stop = F.size(F.filter(tk, lambda w: (w == "the") | (w == "a")))
    docs = docs.withColumn("n_words", n_words).filter(
        (F.col("n_words") >= 12) & (n_stop / F.col("n_words") < 0.3)
    )

    # 4. deterministic split + decontamination: drop TRAIN docs that
    #    share >= 2 winnowing fingerprints with any TEST doc (partial
    #    overlap the whole-doc digests of step 1 cannot see)
    docs = eng.hash_split(docs, "doc_id", {"train": 204, "valid": 26, "test": 26})
    fp = eng.winnow_fingerprints(docs.select("doc_id", "text"))
    split_of = docs.select("doc_id", "split")
    fp = fp.join(split_of, "doc_id")
    te_fp = fp.filter(F.col("split") == "test").select("fh").distinct()
    contaminated = (
        fp.filter(F.col("split") == "train")
        .join(te_fp, "fh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("doc_id")
    )
    docs = docs.join(contaminated, "doc_id", "left_anti")

    # 5. language rebalance (downsample en)
    docs = eng.stratified_sample(docs, "doc_id", "lang", {"en": 128}, default_rate=256)

    # 6. greedy packing to a 2048-token budget, sharded for parallelism
    slim = docs.select(
        "split",
        "lang",
        (F.col("doc_id") % 4).alias("shard"),
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0))
        .cast("long")
        .alias("tokens"),
    )
    packed = eng.pack_greedy(
        slim, size_col="tokens", budget=2048, group_cols=("split", "lang", "shard")
    )

    # 7. packed-corpus stats
    return (
        packed.groupBy("split", "lang", "shard", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("tokens").alias("bin_tokens"))
    )


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = eng.get_spark("train-pipeline")
    corpus = build_corpus(spark, sf_dir)
    summary = (
        corpus.groupBy("split")
        .agg(
            F.countDistinct("lang", "shard", "bin").alias("n_sequences"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bin_tokens").alias("n_tokens"),
        )
        .orderBy("split")
    )
    summary.show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
