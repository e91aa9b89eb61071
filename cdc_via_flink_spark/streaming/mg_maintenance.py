"""Streaming-maintained MISRA–GRIES heavy-hitter summary — the EIGHTH
adapter over the shared maintained-index kernel (ANN / dedup / winnow
/ Bloom / counting-Bloom / bitmap / HLL / this). Completes the sketch
family's streaming side: HLL answers "how many distinct", the MG
summary answers "which items dominate" in k counters TOTAL regardless
of corpus size — the per-metric state a 100 TB deployment keeps when
exact token counts stop fitting (batch twin: q_freq_sketch_rollup's
shard-merged Misra–Gries).

Fold semantics (Agarwal et al. 2012, mergeable summaries): combine
the incoming batch's exact counts with the current k-counter state,
then subtract the (k+1)-th largest combined count from every counter
and drop the non-positive — at most k survive, and the subtracted
mass accumulates into the ERROR budget `err` with the guarantee
    est(t) <= true(t) <= est(t) + err         for every token t
(absent tokens have est 0). The truncation is NON-linear, so unlike
the bitmap/Bloom/HLL folds it is neither associative nor idempotent:
the maintained state is the SEQUENTIAL epoch fold. The adapter
therefore stores each epoch's POST-FOLD state snapshot (k rows + one
err scalar — O(k), not O(batch)) as its delta; reads resolve to the
LAST pointer-committed snapshot, replayed epochs recompute the
identical snapshot from the identical committed predecessor
(deterministic), and compaction just promotes the newest snapshot to
base/ — the state-snapshot variant of the kernel recipe, with
exactly-once riding the pointer protocol as in the counting-Bloom
adapter.

Scale shape: the per-epoch work is ONE exact groupBy(token) over the
batch (input-sized, map-side combinable), an outer join against k=8
state rows, and a TakeOrderedAndProject top-(k+1) probe for the
subtraction threshold — no global sort of the vocabulary, no
state growth with corpus size.

Tokenization is the engine's standard whitespace-normalized form
(plans/text_queries.py SQL_NORM) so the DuckDB oracle can simulate
the fold bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

MG_PTR = "_MG_COMMITTED"
HH_SCHEMA = "ep bigint, token string, est bigint, err bigint"
MG_K = 8
_META_VERSION = 1


def _counts(df: DataFrame, token_col: str = "token") -> DataFrame:
    return (
        df.groupBy(F.col(token_col).alias("token"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _truncate(combined: DataFrame) -> tuple[DataFrame, DataFrame]:
    """MG truncation: subtract the (k+1)-th largest count, keep the
    strictly positive. Returns (summary(token, cnt), s(one row)).

    The threshold probe is orderBy+limit — TakeOrderedAndProject, so
    each map task forwards at most k+1 rows and the vocabulary never
    sorts globally."""
    top = combined.orderBy(F.col("cnt").desc(), "token").limit(MG_K + 1)
    s = top.agg(
        F.when(F.count(F.lit(1)) == MG_K + 1, F.min("cnt"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("s")
    )
    summary = (
        combined.crossJoin(F.broadcast(s))
        .filter(F.col("cnt") > F.col("s"))
        .select("token", (F.col("cnt") - F.col("s")).cast("long").alias("cnt"))
    )
    return summary, s


def write_mg_meta(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(
        [(int(MG_K), int(_META_VERSION))], "k bigint, version bigint"
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_mg_meta(spark: SparkSession, path: str) -> int:
    """Stored capacity; refuses a layout drift (counters truncated at
    a different k would merge into a different summary)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"mg index at {path!r} predates capacity metadata (or is "
            "not an mg index); rebuild it with save_streaming_mg_index"
        ) from e
    if row is None:
        raise ValueError(f"mg meta at {path!r} is empty; rebuild the index")
    if int(row["k"]) != MG_K:
        raise ValueError(
            f"mg index at {path!r} uses k={int(row['k'])}; this engine "
            f"uses k={MG_K}; rebuild the index"
        )
    return int(row["k"])


def _write_state(summary: DataFrame, err: DataFrame, dest: str) -> None:
    summary.coalesce(1).write.mode("overwrite").parquet(dest + "/summary")
    err.coalesce(1).write.mode("overwrite").parquet(dest + "/err")


def save_streaming_mg_index(
    df: DataFrame, path: str, token_col: str = "token"
) -> None:
    """Base index from a batch token frame: `base/summary` (token,
    cnt — at most k rows), `base/err` (one row), `base/meta`."""
    spark = df.sparkSession
    summary, s = _truncate(_counts(df, token_col))
    _write_state(summary, s.select(F.col("s").cast("long").alias("err")), path + "/base")
    write_mg_meta(spark, path + "/base/meta")


def read_mg_state(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(summary, err) of the current state: the NEWEST
    pointer-committed snapshot delta, or the base when none exist.
    Recovers a crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    deltas = ik.committed_deltas(index_path, MG_PTR)
    src = deltas[-1] if deltas else index_path + "/base"
    return (
        spark.read.parquet(src + "/summary"),
        spark.read.parquet(src + "/err"),
    )


def compact_mg_index(spark: SparkSession, index_path: str) -> dict:
    """Promote the newest snapshot to base/ (the sequential fold is
    already materialized in it). MAINTAINER MUST BE STOPPED."""

    def write_folded(tmp: str) -> None:
        summary, err = read_mg_state(spark, index_path)
        _write_state(summary, err, tmp)

    return ik.compact_index(
        index_path, MG_PTR, "base", write_folded, copy_meta=True
    )


def mg_maintenance_query(
    tokens: DataFrame,
    index_path: str,
    hh_out: str,
    checkpoint_dir: str,
    token_col: str = "token",
) -> StreamingQuery:
    """Start the maintained MG summary over a streaming token frame.
    Each epoch folds its exact batch counts into the k-counter state
    (combine, subtract the (k+1)-th largest, drop non-positive),
    publishes the POST-FOLD summary rows (ep, token, est, err) to
    hh_out/e<epoch>, and commits the new state snapshot as its delta.
    Caller awaits the query."""
    spark = tokens.sparkSession
    read_mg_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        state, err = read_mg_state(bsess, index_path)
        bc = _counts(batch, token_col)
        combined = (
            bc.join(state.select("token", F.col("cnt").alias("sc")), "token", "full")
            .select(
                "token",
                (
                    F.coalesce(F.col("cnt"), F.lit(0))
                    + F.coalesce(F.col("sc"), F.lit(0))
                )
                .cast("long")
                .alias("cnt"),
            )
        )
        summary, s = _truncate(combined)
        new_err = (
            err.crossJoin(s)
            .select((F.col("err") + F.col("s")).cast("long").alias("err"))
        )
        _write_state(summary, new_err, delta_tmp)
        hh = (
            bsess.read.parquet(delta_tmp + "/summary")
            .crossJoin(F.broadcast(bsess.read.parquet(delta_tmp + "/err")))
            .select(
                F.lit(int(epoch_id)).cast("long").alias("ep"),
                "token",
                F.col("cnt").alias("est"),
                "err",
            )
        )
        ik.publish_epoch_output(hh, hh_out, epoch_id)

    return ik.run_maintenance(
        tokens,
        index_path,
        MG_PTR,
        "misra-gries heavy-hitter summary",
        checkpoint_dir,
        process,
        gc_roots=(hh_out,),
    )


def read_heavy_hitters(
    spark: SparkSession, hh_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted per-epoch summaries; with ``index_path``, only
    epochs covered by the COMMITTED pointer. Empty → typed empty."""
    return ik.read_epoch_outputs(
        spark,
        hh_out,
        HH_SCHEMA,
        index_path=index_path,
        ptr_name=MG_PTR if index_path is not None else None,
    )
