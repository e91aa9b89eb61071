"""Streaming-maintained Bloom ingest gate — the MAINTAINED form of
operators/bloom.py (SURVEY.md X1 + ST5; the fourth adapter over the
shared maintained-index kernel, after ANN / dedup / winnow): documents
arrive as a stream, and every micro-batch is

  1. screened against the maintained bitmap (base ∪ COMMITTED deltas)
     — emitting a (doc_id, bloom_hit) verdict per doc: hit = "maybe
     seen in any PRIOR epoch or the base corpus", miss = "definitely
     new" (the Bloom no-false-negative guarantee);
  2. folded into the index as a crash-atomic committed DELTA bitmap.

Why a Bloom index is the cheapest maintained index of the family: the
state is m/32 bitmap words TOTAL — independent of corpus size — and
the merge operation (bit_or by word) is associative and idempotent,
so delta fold-in and compaction are the SAME operation and replaying
an epoch's delta is harmless by algebra, not just by protocol.

Crash-atomicity (exactly-once epochs, compaction recovery, foreign-
checkpoint refusal) comes from streaming/index_kernel.py; this adapter
contributes only the content: what a delta holds (the batch's bitmap),
the sizing/hash-family meta validation, and the verdict emission.

Epoch semantics (what the oracle states): a doc's verdict is computed
against the state BEFORE its own epoch — two copies of a new text in
the SAME batch both read "miss"; a copy in a LATER batch reads "hit".

Scale: per-batch work = hashing the BATCH (k positions per doc, pure
expressions), one broadcast join against the ≤ m/32-row bitmap, and a
bitmap-sized delta write. Nothing grows with the corpus; the index
read is O(m/32 · n_epochs) until compaction folds it back to O(m/32).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.functions.hashing import MINHASH_FAMILY
from cdc_via_flink_spark.operators.bloom import bloom_build, bloom_probe
from cdc_via_flink_spark.streaming import index_kernel as ik

BLOOM_PTR = "_BLOOM_COMMITTED"

VERDICT_SCHEMA = "doc_id bigint, bloom_hit boolean"


def _digest(text_col: str) -> Column:
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text

    return token_int(normalize_text(F.col(text_col)))


def write_bloom_meta(
    spark: SparkSession, path: str, m_bits: int, k: int
) -> None:
    """Pin the filter's sizing + hash-family version. Positions under
    a DIFFERENT (m, k) or coefficient family land on different bits —
    probes would silently read garbage — so the maintainer validates
    this meta before the stream starts (the minhash-meta lesson,
    ADVICE r7)."""
    spark.createDataFrame(
        [(int(m_bits), int(k), int(MINHASH_FAMILY))],
        "m_bits bigint, k bigint, family bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_bloom_meta(spark: SparkSession, path: str) -> tuple[int, int]:
    """Stored (m_bits, k); raises on a pre-metadata index or a
    hash-family drift. Existence is probed through Spark, so the index
    may live on any Spark-readable filesystem (the check_minhash_meta
    precedent)."""
    from pyspark.errors import AnalysisException

    # Only the path-missing AnalysisException means "pre-metadata
    # index"; any other read failure (corrupt parquet, permissions,
    # transient FS) propagates with its original message instead of a
    # misleading rebuild instruction (ADVICE r9).
    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"bloom index at {path!r} predates sizing/hash-family "
            "metadata (or is not a bloom index); rebuild it with "
            "save_streaming_bloom_index"
        ) from e
    if row is None:
        raise ValueError(f"bloom meta at {path!r} is empty; rebuild the index")
    if int(row["family"]) != MINHASH_FAMILY:
        raise ValueError(
            f"bloom index at {path!r} was built with hash family "
            f"v{int(row['family'])}, this engine is v{MINHASH_FAMILY}; "
            "rebuild the index"
        )
    return int(row["m_bits"]), int(row["k"])


def save_streaming_bloom_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 7,
) -> None:
    """Base index: `base/bitmap` (word, bits — ≤ m/32 rows) +
    `base/meta` (sizing + family pin). Size (m_bits, k) from the
    expected corpus with operators.bloom.bloom_plan."""
    spark = df.sparkSession
    digests = df.select(_digest(text_col).alias("digest")).distinct()
    bm = bloom_build(digests, "digest", m_bits, k)
    bm.coalesce(1).write.mode("overwrite").parquet(path + "/base/bitmap")
    write_bloom_meta(spark, path + "/base/meta", m_bits, k)


def read_bloom_bitmap(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged bitmap over base ∪ committed deltas (bit_or by word —
    associative, so the merged filter equals the filter built over the
    union of all inserted digests). Recovers a crashed compaction
    first, so readers never observe the mid-swap window."""
    ik.recover_compaction(index_path, "base")
    bm = spark.read.parquet(index_path + "/base/bitmap")
    for d in ik.committed_deltas(index_path, BLOOM_PTR):
        bm = bm.unionByName(spark.read.parquet(d + "/bitmap"))
    return bm.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def compact_bloom_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed delta bitmaps into the base — for Bloom this is
    just the merged read written back (bit_or is the fold). MAINTAINER
    MUST BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_bloom_bitmap(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/bitmap")

    return ik.compact_index(
        index_path, BLOOM_PTR, "base", write_folded, copy_meta=True
    )


def bloom_maintenance_query(
    new_docs: DataFrame,
    index_path: str,
    verdicts_out: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> StreamingQuery:
    """Start the maintained Bloom gate over a streaming document frame
    (doc_id long, text string). Per-doc verdicts land in
    verdicts_out/e<epoch>; the batch's bitmap joins the index as delta
    e<epoch>. Sizing comes FROM the index's validated meta (stored
    policy wins — the winnow-meta lesson: a module-constant change
    must not strand existing indexes). Caller awaits the query."""
    spark = new_docs.sparkSession
    m_bits, k = read_bloom_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        bm = read_bloom_bitmap(bsess, index_path)
        bd = batch.select(
            F.col(id_col).alias("doc_id"), _digest(text_col).alias("digest")
        )
        verdicts = bloom_probe(bd, "doc_id", "digest", bm, m_bits, k)
        ik.publish_epoch_output(verdicts, verdicts_out, epoch_id)

        delta = bloom_build(bd.select("digest").distinct(), "digest", m_bits, k)
        delta.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/bitmap")

    return ik.run_maintenance(
        new_docs,
        index_path,
        BLOOM_PTR,
        "bloom index",
        checkpoint_dir,
        process,
        gc_roots=(verdicts_out,),
    )


def read_verdicts(
    spark: SparkSession, verdicts_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted verdict epochs; with ``index_path``, only
    epochs covered by the COMMITTED pointer (a crash-published epoch
    beyond the pointer is excluded). Empty → empty typed frame."""
    return ik.read_epoch_outputs(
        spark,
        verdicts_out,
        VERDICT_SCHEMA,
        index_path=index_path,
        ptr_name=BLOOM_PTR if index_path is not None else None,
    )
