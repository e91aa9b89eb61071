"""Bloom-gated exact-dedup ingest pipeline — the END-TO-END
composition the Bloom modules promise (operators/bloom.py: "definite-
miss rows never touch the corpus at all, and only the maybe-dup
remainder proceeds to the exact digest join"; round-9 VERDICT #5
asked for the composition as a declared, oracle-checked query).

One maintained index, two co-committed parts per epoch (same kernel
delta, ONE pointer — the gate and the corpus can never diverge under
a crash):

  base/bitmap      Bloom filter over the corpus digests (m/32 words)
  base/digests     the exact-dedup corpus digest set
  deltas/eN/bitmap    the epoch's arrivals, as bitmap bits
  deltas/eN/digests   the epoch's arrivals, as digests

Per micro-batch (probe-before-insert epoch semantics, matching
streaming/bloom_maintenance.py):

  1. probe every arrival against bitmap(base ∪ committed deltas) —
     definite-miss docs SHORT-CIRCUIT: verdict (bloom_hit=false,
     exact_dup=false) with NO corpus join;
  2. only the bloom-hit remainder equi-joins the digest corpus —
     exact_dup = digest present;
  3. the batch folds in as a crash-atomic delta (bitmap + digests).

Composition theorem (what the declared query's oracle checks): the
gated pipeline's exact_dup EQUALS dedup-alone (digest-in-corpus
computed directly, no Bloom) because Bloom has no false negatives —
bloom_hit=false implies digest ∉ corpus. The oracle computes the
dedup-alone answer; the Spark side computes it THROUGH the gate; an
exact hash match is the proof on real data. The per-epoch
ep_probed/ep_skipped columns expose the probe-join row counts — the
skipped majority is the 100 TB win: the corpus join's probe side
shrinks from |batch| to |bloom hits|.

Scale: the probe is k pure-expression hashes + one join against an
m/32-row bitmap; the corpus join's LEFT side is pre-filtered to hits
(structurally — the filter is UNDER the join in the plan, pinned by
tests/test_ingest_gate.py); state grows only by the digest set
(8 bytes/doc) and the fixed bitmap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.operators.bloom import bloom_build, bloom_probe
from cdc_via_flink_spark.streaming import index_kernel as ik
from cdc_via_flink_spark.streaming.bloom_maintenance import (
    _digest,
    read_bloom_meta,
    write_bloom_meta,
)

GATE_PTR = "_GATE_COMMITTED"

GATE_VERDICT_SCHEMA = (
    "doc_id bigint, ep bigint, bloom_hit boolean, exact_dup boolean, "
    "ep_probed bigint, ep_skipped bigint"
)


def gate_and_dedup(
    bd: DataFrame, bitmap: DataFrame, corpus: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """The per-batch composition, as a pure plan: ``bd`` is
    (doc_id, digest) arrivals, ``bitmap`` the merged Bloom words,
    ``corpus`` the merged digest set. Returns (doc_id, bloom_hit,
    exact_dup). Only bloom-hit rows reach the corpus join — the miss
    branch is a plain filter+literal with no join in its subtree."""
    hits = bloom_probe(bd, "doc_id", "digest", bitmap, m_bits, k)
    bdv = bd.join(hits, "doc_id")
    missed = bdv.filter(~F.col("bloom_hit")).select(
        "doc_id", "bloom_hit", F.lit(False).alias("exact_dup")
    )
    probed = bdv.filter(F.col("bloom_hit")).join(
        corpus.select("digest").distinct().withColumn("in_corpus", F.lit(True)),
        "digest",
        "left",
    ).select(
        "doc_id",
        "bloom_hit",
        F.coalesce("in_corpus", F.lit(False)).alias("exact_dup"),
    )
    return probed.unionByName(missed)


def save_gated_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 7,
) -> None:
    """Base index over the existing corpus: bitmap + digest set + the
    shared sizing/hash-family meta."""
    spark = df.sparkSession
    digests = df.select(_digest(text_col).alias("digest")).distinct()
    bloom_build(digests, "digest", m_bits, k).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/base/bitmap")
    digests.coalesce(1).write.mode("overwrite").parquet(path + "/base/digests")
    write_bloom_meta(spark, path + "/base/meta", m_bits, k)


def _merged(spark: SparkSession, index_path: str, part: str) -> DataFrame:
    ik.recover_compaction(index_path, "base")
    out = spark.read.parquet(index_path + f"/base/{part}")
    for d in ik.committed_deltas(index_path, GATE_PTR):
        out = out.unionByName(spark.read.parquet(d + f"/{part}"))
    return out


def read_gate_bitmap(spark: SparkSession, index_path: str) -> DataFrame:
    return (
        _merged(spark, index_path, "bitmap")
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )


def read_corpus_digests(spark: SparkSession, index_path: str) -> DataFrame:
    return _merged(spark, index_path, "digests").distinct()


def compact_gated_index(spark: SparkSession, index_path: str) -> dict:
    """Fold deltas into the base — bitmap by bit_or, digests by
    distinct union; both folds are idempotent. MAINTAINER MUST BE
    STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        # build BOTH read plans before staging anything under tmp:
        # each reader runs recover_compaction, which deletes a
        # pre-marker stray tmp — calling a reader after the first
        # write would wipe the part just staged
        bm = read_gate_bitmap(spark, index_path)
        dg = read_corpus_digests(spark, index_path)
        bm.coalesce(1).write.mode("overwrite").parquet(tmp + "/bitmap")
        dg.coalesce(1).write.mode("overwrite").parquet(tmp + "/digests")

    return ik.compact_index(
        index_path, GATE_PTR, "base", write_folded, copy_meta=True
    )


def gated_dedup_query(
    new_docs: DataFrame,
    index_path: str,
    verdicts_out: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Start the composed gate+dedup maintainer over a streaming
    document frame (doc_id long, text string). Per-doc verdicts
    (GATE_VERDICT_SCHEMA) land in verdicts_out/e<epoch>; the batch
    joins the index as delta e<epoch> (bitmap + digests, one pointer
    commit). Sizing comes from the index's validated meta."""
    spark = new_docs.sparkSession
    m_bits, k = read_bloom_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        bd = batch.select(
            F.col(id_col).alias("doc_id"), _digest(text_col).alias("digest")
        )
        verd = gate_and_dedup(
            bd,
            read_gate_bitmap(bsess, index_path),
            read_corpus_digests(bsess, index_path),
            m_bits,
            k,
        )
        counts = verd.agg(
            F.count(F.when(F.col("bloom_hit"), 1)).alias("ep_probed"),
            F.count(F.when(~F.col("bloom_hit"), 1)).alias("ep_skipped"),
        )
        out = (
            verd.crossJoin(F.broadcast(counts))
            .withColumn("ep", F.lit(epoch_id).cast("long"))
            .select(
                "doc_id", "ep", "bloom_hit", "exact_dup",
                "ep_probed", "ep_skipped",
            )
        )
        ik.publish_epoch_output(out, verdicts_out, epoch_id)

        dd = bd.select("digest").distinct()
        bloom_build(dd, "digest", m_bits, k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(delta_tmp + "/bitmap")
        dd.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/digests")

    return ik.run_maintenance(
        new_docs,
        index_path,
        GATE_PTR,
        "gated dedup index",
        checkpoint_dir,
        process,
        gc_roots=(verdicts_out,),
    )


def read_gate_verdicts(
    spark: SparkSession, verdicts_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted verdict epochs; with ``index_path``, only
    epochs covered by the COMMITTED pointer. Empty → typed empty."""
    return ik.read_epoch_outputs(
        spark,
        verdicts_out,
        GATE_VERDICT_SCHEMA,
        index_path=index_path,
        ptr_name=GATE_PTR if index_path is not None else None,
    )
