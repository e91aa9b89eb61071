"""Streaming-maintained CORPUS CHECKSUM — the TWELFTH adapter over
the shared maintained-index kernel, and the smallest possible
demonstration of its SUM fold algebra: state is ONE row
(n_docs, checksum) where checksum is the order-insensitive additive
fingerprint of q_corpus_checksum (exact integer sum of the first 48
bits of md5(doc_id:text)).

The fold (integer addition) is associative but NOT idempotent — the
counting-Bloom class — so exactly-once rests entirely on the
kernel's committed-pointer protocol: a replayed epoch would
double-count, and the kernel's epoch high-water is what prevents it
(pinned in tests by replaying). Because the batch face is additive by
construction, the maintained total must equal a monolithic
recompute at every epoch — the live reproducibility monitor: any
batch run of q_corpus_checksum over the same corpus must land on the
maintained number, or an ingest dropped/duplicated/mutated documents.

Scale: per-batch work is one map-side hash + a 1-row aggregate;
state is O(1) at any corpus size; compaction folds delta rows into
one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

CKS_PTR = "_CKSUM_COMMITTED"
OUT_SCHEMA = "ep bigint, n_docs bigint, checksum bigint"


def checksum_cols(df: DataFrame) -> DataFrame:
    """One-row (n_docs, checksum) aggregate of a documents frame."""
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return df.select(hv.alias("hv")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("hv"), F.lit(0)).cast("long").alias("checksum"),
    )


def save_streaming_checksum(docs: DataFrame, path: str) -> None:
    """Base state: base/state (one row)."""
    checksum_cols(docs).coalesce(1).write.mode("overwrite").parquet(
        path + "/base/state"
    )


def read_checksum(spark: SparkSession, index_path: str) -> DataFrame:
    """Folded (n_docs, checksum) over base + committed deltas —
    integer addition IS the fold."""
    ik.recover_compaction(index_path, "base")
    r = spark.read.parquet(index_path + "/base/state")
    for d in ik.committed_deltas(index_path, CKS_PTR):
        r = r.unionByName(spark.read.parquet(d + "/state"))
    return r.agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("checksum").cast("long").alias("checksum"),
    )


def compact_checksum(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the one-row base. MAINTAINER MUST
    BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_checksum(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/state")

    return ik.compact_index(index_path, CKS_PTR, "base", write_folded)


def checksum_maintenance_query(
    docs: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Maintain the checksum over a streaming documents frame
    (doc_id long, text string); per-epoch POST-FOLD totals land in
    out_dir/e<epoch>. Caller awaits."""

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        bs = checksum_cols(batch)
        bs.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/state")
        state = read_checksum(bsess, index_path)
        merged = (
            state.unionByName(bsess.read.parquet(delta_tmp + "/state"))
            .agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("checksum").cast("long").alias("checksum"),
            )
            .select(
                F.lit(int(epoch_id)).cast("long").alias("ep"),
                "n_docs",
                "checksum",
            )
        )
        ik.publish_epoch_output(merged, out_dir, epoch_id)

    return ik.run_maintenance(
        docs,
        index_path,
        CKS_PTR,
        "corpus checksum",
        checkpoint_dir,
        process,
        gc_roots=(out_dir,),
    )


def read_outputs(
    spark: SparkSession, out_dir: str, index_path: str | None = None
) -> DataFrame:
    return ik.read_epoch_outputs(
        spark,
        out_dir,
        OUT_SCHEMA,
        index_path=index_path,
        ptr_name=CKS_PTR if index_path is not None else None,
    )
