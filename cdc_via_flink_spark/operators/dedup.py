"""Deduplication operators (SURVEY.md X1) — exact, MinHash+LSH banding,
n-gram Jaccard, SimHash. Training-data-pipeline first-class citizens.

Scale design:
- exact: hash-groupBy on a digest of normalized text — one shuffle,
  map-side partial agg; at 100 TB this is the standard
  distinct-by-content pass.
- MinHash+LSH: per-doc K-hash signature built in ONE aggregation over
  exploded distinct shingles (K min-exprs, no K passes); banding turns
  the O(n²) pair space into equi-join buckets; only bucket-collision
  candidates get exact-Jaccard verification. This is the canonical
  near-dup pipeline (Broder; used by LLM dataset curation at scale).
- n-gram Jaccard: exact pairwise similarity with attribute blocking to
  bound the pair space; the LSH path replaces blocking at scale.
- SimHash: 64-bit fingerprint via per-bit weighted majority of token
  hashes; near-dups = small Hamming distance. Bit arithmetic only —
  no floats.

All hashes are the cross-engine-deterministic family in
functions/hashing.py, so every operator is DuckDB-oracle-verifiable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cdc_via_flink_spark.functions.hashing import minhash_expr, token_int
from cdc_via_flink_spark.functions.text import normalize_text, shingles


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Content groups: digest of normalized text -> (digest, keeper id,
    n_copies). Keeper = min id (deterministic survivor policy)."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("digest"),
            F.col(id_col).alias("_id"),
        )
        .groupBy("digest")
        .agg(
            F.min("_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def doc_shingles(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Distinct word-k-shingles per doc: (doc_id, sh)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("sh"),
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 16
) -> DataFrame:
    """K-wide MinHash signature per doc in a single aggregation.

    Input: (doc_id, sh) distinct shingles. Output: doc_id, mh0..mh{K-1}.
    """
    t = sh.withColumn("t", token_int(F.col("sh")))
    aggs = [
        F.min(minhash_expr(F.col("t"), j)).alias(f"mh{j}") for j in range(num_hashes)
    ]
    return t.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, bands: int, rows: int
) -> DataFrame:
    """Band the signature and emit candidate pairs (a < b) colliding in
    at least one band. Equi-join per band bucket — no cross product."""
    band_frames = []
    for b in range(bands):
        cols = [f"mh{b * rows + r}" for r in range(rows)]
        band_frames.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws("-", *[F.col(c).cast("string") for c in cols]).alias("bsig"),
            )
        )
    banded = band_frames[0]
    for bf in band_frames[1:]:
        banded = banded.unionByName(bf)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def jaccard_on_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    """Exact shingle-Jaccard for given candidate pairs.

    pairs: (id_a, id_b); sh: (doc_id, sh) distinct shingles.
    Output: id_a, id_b, inter, size_a, size_b, jaccard (double).
    """
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    sa = sh.select(F.col("doc_id").alias("id_a"), "sh")
    sb = sh.select(F.col("doc_id").alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "size_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "size_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
    )


def simhash64(sh: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from shingle hashes: bit i of the
    fingerprint is the majority vote of bit i across token hashes.

    Pure integer bit arithmetic: shiftright + AND per bit position,
    summed in one aggregation (64 sum-exprs, single pass).
    Output: doc_id, simhash (BIGINT built from 63 low bits to stay
    positive/portable).
    """
    t = sh.select("doc_id", token_int(F.col("sh")).alias("t"))
    aggs = [
        F.sum(
            F.when((F.shiftright(F.col("t"), i) % 2) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(60)
    ]
    votes = t.groupBy("doc_id").agg(*aggs)
    fp = None
    for i in range(60):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << i).cast("long")
        fp = bit if fp is None else fp + bit
    return votes.select("doc_id", fp.alias("simhash"))
