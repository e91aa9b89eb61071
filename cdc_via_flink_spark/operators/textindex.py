"""Persisted BM25 inverted index
(plans/text_queries.py::text_bm25_persisted_topk).

The text-search twin of the IVF index lifecycle (operators/ivf.py):
build once, persist, reload, probe — value-identical to the
in-memory text_bm25_topk (they share one oracle), but the probe
touches only the query terms' data. Layout:

    path/postings/   (term, doc_id, tf) PARTITIONED BY term-bucket
                     tb = pmod(hash(term), n_buckets)
    path/termstats/  (term, df) — full vocabulary document counts
    path/doclen/     (doc_id, dl)
    path/stats/      (n_docs, avgdl) — one row
    path/meta/       (n_buckets, version)

The 100 TB argument: a query's terms hash to a handful of buckets, so
the probe's `tb IN (...)` filter is STATIC PARTITION PRUNING — the
scan reads only those buckets' files (pinned in tests), never the
rest of the index; term stats join broadcast. Bucketing by hash
rather than by raw term keeps directory counts bounded (64) and
buckets balanced regardless of vocabulary size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.functions.text import tokens

N_BUCKETS = 64
_META_VERSION = 1


def save_text_index(docs: DataFrame, path: str) -> None:
    spark = docs.sparkSession
    tk = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    dl = tk.select("doc_id", F.size("t").cast("long").alias("dl"))
    postings = (
        tk.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("tb", F.pmod(F.hash("term"), F.lit(N_BUCKETS)))
    )
    postings.write.mode("overwrite").partitionBy("tb").parquet(
        path + "/postings"
    )
    # df over the full vocabulary, from the persisted postings (so the
    # stats can never drift from the lists they describe)
    spark.read.parquet(path + "/postings").groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    ).write.mode("overwrite").parquet(path + "/termstats")
    dl.write.mode("overwrite").parquet(path + "/doclen")
    dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    ).coalesce(1).write.mode("overwrite").parquet(path + "/stats")
    spark.createDataFrame(
        [(int(N_BUCKETS), int(_META_VERSION))], "n_buckets int, version int"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def probe_text_index(
    spark: SparkSession, path: str, terms: tuple
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, df, dl, stats) for the query terms, reading ONLY the
    term-buckets the query hashes to (static partition pruning).
    Top-k truncation is the caller's job (the probe returns every
    posting for the query terms)."""
    meta = spark.read.parquet(path + "/meta").head()
    nb = int(meta["n_buckets"])
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = [
        r["tb"]
        for r in terms_df.select(
            F.pmod(F.hash("term"), F.lit(nb)).alias("tb")
        )
        .distinct()
        .collect()
    ]
    tf = (
        spark.read.parquet(path + "/postings")
        .filter(F.col("tb").isin(buckets))
        .join(F.broadcast(terms_df), "term")
        .select("doc_id", "term", "tf")
    )
    df = (
        spark.read.parquet(path + "/termstats")
        .join(F.broadcast(terms_df), "term")
        .select("term", "df")
    )
    dl = spark.read.parquet(path + "/doclen")
    stats = spark.read.parquet(path + "/stats")
    return tf, df, dl, stats
