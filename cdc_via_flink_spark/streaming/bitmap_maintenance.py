"""Streaming-maintained ACTIVITY BITMAP index — the SIXTH adapter over
the shared maintained-index kernel (after ANN / dedup / winnow / Bloom
/ counting-Bloom): the maintained form of q_bitmap_distinct_rollup's
(day, block) → word table. Events arrive as a stream and every
micro-batch

  1. reports, per day touched by the batch, how many users are active
     on that day for the FIRST time (batch word AND NOT state word,
     popcounted) — the incremental daily-active-users metric a
     dashboard consumes without ever re-scanning history;
  2. folds the batch's words into the index as a crash-atomic
     committed delta.

Like the Bloom bitmap — and unlike the counting-Bloom's sum fold —
the merge (bit_or by (day, block)) is associative AND idempotent, so
delta fold-in and compaction are the same operation and replaying an
epoch's delta is harmless by algebra, not just by protocol. Unlike
Bloom, membership here is EXACT (user ids index bits directly, no
hashing), so the maintained words answer any retention/churn
set-algebra question exactly (see q_bitmap_retention).

State size: |days| · ceil(|users|/32) words — bounded by the id
domain, not the event count. Per-batch work: one keyed aggregate over
the BATCH, one left join against the state words for the touched
(day, block) keys, a words-sized delta write.

Epoch semantics (what the oracle states): a user-day counts as new in
the FIRST epoch that delivers it (and never if the base corpus holds
it); two events of the same user-day inside one batch count once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

BITMAP_PTR = "_BITMAP_COMMITTED"
DAU_SCHEMA = "ep bigint, day date, new_actives bigint"
BLOCK_BITS = 32  # in-range shifts everywhere (DuckDB refuses 1<<63)
_META_VERSION = 1


def _words(df: DataFrame, day_col: str = "day", id_col: str = "user_id") -> DataFrame:
    """(day, user) events → (day, blk, word) bitmap words."""
    return (
        df.select(
            F.col(day_col).alias("day"),
            (F.col(id_col) / BLOCK_BITS).cast("long").alias("blk"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({id_col} % {BLOCK_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "blk")
        .agg(F.bit_or("bit").alias("word"))
    )


def write_bitmap_meta(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(
        [(int(BLOCK_BITS), int(_META_VERSION))],
        "block_bits bigint, version bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_bitmap_meta(spark: SparkSession, path: str) -> int:
    """Stored block width; raises on a pre-metadata index or a layout
    drift (a word written under a different block width would count
    the wrong users — the bloom-meta lesson applied here)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"bitmap index at {path!r} predates layout metadata (or is "
            "not a bitmap index); rebuild it with "
            "save_streaming_bitmap_index"
        ) from e
    if row is None:
        raise ValueError(f"bitmap meta at {path!r} is empty; rebuild the index")
    if int(row["block_bits"]) != BLOCK_BITS:
        raise ValueError(
            f"bitmap index at {path!r} uses block width "
            f"{int(row['block_bits'])}, this engine uses {BLOCK_BITS}; "
            "rebuild the index"
        )
    return int(row["block_bits"])


def save_streaming_bitmap_index(
    df: DataFrame, path: str, day_col: str = "day", id_col: str = "user_id"
) -> None:
    """Base index: `base/words` (day, blk, word) + `base/meta`."""
    spark = df.sparkSession
    _words(df, day_col, id_col).coalesce(1).write.mode("overwrite").parquet(
        path + "/base/words"
    )
    write_bitmap_meta(spark, path + "/base/meta")


def read_bitmap_words(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged words over base ∪ committed deltas (bit_or by (day, blk)
    — associative+idempotent, so the merged table equals the table
    built over the union of all folded events). Recovers a crashed
    compaction first, so readers never observe the mid-swap window."""
    ik.recover_compaction(index_path, "base")
    w = spark.read.parquet(index_path + "/base/words")
    for d in ik.committed_deltas(index_path, BITMAP_PTR):
        w = w.unionByName(spark.read.parquet(d + "/words"))
    return w.groupBy("day", "blk").agg(F.bit_or("word").alias("word"))


def compact_bitmap_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base — bit_or IS the fold, so
    this is the merged read written back. MAINTAINER MUST BE STOPPED.
    Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_bitmap_words(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/words")

    return ik.compact_index(
        index_path, BITMAP_PTR, "base", write_folded, copy_meta=True
    )


def bitmap_maintenance_query(
    events: DataFrame,
    index_path: str,
    dau_out: str,
    checkpoint_dir: str,
    day_col: str = "day",
    id_col: str = "user_id",
) -> StreamingQuery:
    """Start the maintained activity bitmap over a streaming event
    frame (user_id long, day date). Per-epoch new-active counts land
    in dau_out/e<epoch>; the batch's words join the index as delta
    e<epoch>. Caller awaits the query."""
    spark = events.sparkSession
    read_bitmap_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        state = read_bitmap_words(bsess, index_path).select(
            "day", "blk", F.col("word").alias("sw")
        )
        bw = _words(batch, day_col, id_col)
        new = bw.join(state, ["day", "blk"], "left").select(
            "day",
            F.expr("word & ~coalesce(sw, CAST(0 AS BIGINT))").alias("nw"),
        )
        dau = new.groupBy("day").agg(
            F.sum(F.bit_count("nw")).cast("long").alias("new_actives")
        )
        ik.publish_epoch_output(
            dau.select(
                F.lit(int(epoch_id)).cast("long").alias("ep"),
                "day",
                "new_actives",
            ),
            dau_out,
            epoch_id,
        )
        bw.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/words")

    return ik.run_maintenance(
        events,
        index_path,
        BITMAP_PTR,
        "activity bitmap index",
        checkpoint_dir,
        process,
        gc_roots=(dau_out,),
    )


def read_dau(
    spark: SparkSession, dau_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted DAU epochs; with ``index_path``, only epochs
    covered by the COMMITTED pointer. Empty → empty typed frame."""
    return ik.read_epoch_outputs(
        spark,
        dau_out,
        DAU_SCHEMA,
        index_path=index_path,
        ptr_name=BITMAP_PTR if index_path is not None else None,
    )
