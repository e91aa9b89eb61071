"""Streaming BM25 inverted-index maintenance — the ELEVENTH adapter
over the shared maintained-index kernel, and the text-search twin of
the ANN maintainer (streaming/ann_maintenance.py): each micro-batch
of documents is tokenized into term-bucket-partitioned postings plus
document lengths and committed as an atomic DELTA, so the index a
prober sees is always base ∪ committed-deltas and a probe after
maintenance is value-identical to the monolithic build
(text_bm25_append_topk pins this with text_bm25_topk's exact oracle).

The maintained read path derives df and corpus stats FROM the merged
postings/doclen at probe time — df only for the query's terms (from
the term-bucket-PRUNED postings), n_docs/avgdl from the doc-sized
doclen union — so the statistics can never drift from the lists, and
no stats table needs incremental maintenance. The fold (union of
disjoint per-epoch posting sets) is append-only; exactly-once comes
from the kernel's committed pointer, compaction folds deltas back
into the term-bucket layout.

Scale: per-batch work is one tokenize + batch-sized groupBy and a
delta-sized write; base postings are never read or rewritten by the
maintainer. Probes pay one parquet-path union per retained delta
(compaction bounds it), with the term-bucket pruning applying to
every path in the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.functions.text import tokens
from cdc_via_flink_spark.operators.textindex import N_BUCKETS, _META_VERSION
from cdc_via_flink_spark.streaming import index_kernel as ik

TEXT_PTR = "_TEXTIDX_COMMITTED"


def _postings_and_doclen(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    tk = docs.select("doc_id", tokens(F.col("text")).alias("t"))
    dl = tk.select("doc_id", F.size("t").cast("long").alias("dl"))
    postings = (
        tk.select("doc_id", F.explode("t").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("tb", F.pmod(F.hash("term"), F.lit(N_BUCKETS)))
    )
    return postings, dl


def _write_parts(postings: DataFrame, dl: DataFrame, root: str) -> None:
    postings.write.mode("overwrite").partitionBy("tb").parquet(
        root + "/postings"
    )
    dl.write.mode("overwrite").parquet(root + "/doclen")


def save_streaming_text_index(docs: DataFrame, path: str) -> None:
    """Base index: base/{postings,doclen,meta}."""
    spark = docs.sparkSession
    postings, dl = _postings_and_doclen(docs)
    _write_parts(postings, dl, path + "/base")
    spark.createDataFrame(
        [(int(N_BUCKETS), int(_META_VERSION))], "n_buckets int, version int"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/base/meta")


def read_maintained_text_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(postings, doclen) over base ∪ committed deltas. All posting
    paths share the term-bucket partition layout, so a probe's
    pruning filter applies to every path in the union. Recovers a
    crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    paths = [index_path + "/base"] + ik.committed_deltas(index_path, TEXT_PTR)
    postings = spark.read.option("basePath", paths[0] + "/postings").parquet(
        paths[0] + "/postings"
    )
    dl = spark.read.parquet(paths[0] + "/doclen")
    for p in paths[1:]:
        postings = postings.unionByName(spark.read.parquet(p + "/postings"))
        dl = dl.unionByName(spark.read.parquet(p + "/doclen"))
    return postings, dl


def probe_maintained_text_index(
    spark: SparkSession, index_path: str, terms: tuple
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(tf, df, dl, stats) for the query terms over the maintained
    view — statistics DERIVED from the merged index so they can never
    drift from the lists."""
    meta = spark.read.parquet(index_path + "/base/meta").head()
    nb = int(meta["n_buckets"])
    terms_df = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = [
        r["tb"]
        for r in terms_df.select(F.pmod(F.hash("term"), F.lit(nb)).alias("tb"))
        .distinct()
        .collect()
    ]
    postings, dl = read_maintained_text_index(spark, index_path)
    tf = (
        postings.filter(F.col("tb").isin(buckets))
        .join(F.broadcast(terms_df), "term")
        .select("doc_id", "term", "tf")
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    return tf, df, dl, stats


def compact_text_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base layout. MAINTAINER MUST BE
    STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        postings, dl = read_maintained_text_index(spark, index_path)
        _write_parts(postings, dl, tmp)

    return ik.compact_index(
        index_path, TEXT_PTR, "base", write_folded, copy_meta=True
    )


def text_maintenance_query(
    docs: DataFrame,
    index_path: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Start the maintenance query over a streaming documents frame
    (doc_id long, text string). Caller awaits."""

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        postings, dl = _postings_and_doclen(batch)
        _write_parts(postings, dl, delta_tmp)

    return ik.run_maintenance(
        docs, index_path, TEXT_PTR, "BM25 text index", checkpoint_dir, process
    )
