"""Streaming-maintained KMV (k-minimum-values) BOTTOM-k SKETCH — the
NINTH adapter over the shared maintained-index kernel. Completes the
cardinality family with the third design point: the bitmap is exact
membership (state grows with |ids|), the HLL is a fixed 256-register
estimate with nothing else, the KMV keeps the k SMALLEST hash values
— a fixed-k state that yields BOTH a distinct-count estimate
(Bar-Yossef et al. 2002: (k−1)·M/h_(k)) AND a uniform sample of the
distinct ids (the bottom-k ids under a fixed hash are an unbiased
distinct-item sample — the "give me 64 random users who ever
appeared" query the other two sketches cannot answer).

The fold (union → keep k smallest by hash) is associative AND
idempotent — the bitmap/Bloom/HLL algebra — so delta fold-in and
compaction are the same operation, replaying an epoch is harmless,
and the merged state over any partitioning equals the sequential
build.

The hash is the engine's deterministic lattice (odd multiplier mod
2^20 — a BIJECTION on the lattice, so distinct lattice points never
collide and the order statistics are exact integers both engines
compute identically; the DuckDB oracle simulates the sketch
bit-for-bit). At a real deployment swap `_kh` for xxhash64; the
estimator and fold are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

KMV_PTR = "_KMV_COMMITTED"
EST_SCHEMA = "ep bigint, est_distinct double, kth_hash bigint, n_state bigint"
KMV_K = 64
_LAT = 1048576  # 2^20 lattice
_MULT, _OFF = 764431, 29  # odd multiplier => bijection on the lattice
_META_VERSION = 1


def _kh(id_col: Column) -> Column:
    return ((id_col % _LAT) * _MULT + _OFF) % _LAT


def kh_sql(id_expr: str) -> str:
    return f"((({id_expr}) % {_LAT}) * {_MULT} + {_OFF}) % {_LAT}"


def _bottom_k(df: DataFrame) -> DataFrame:
    """(h, id) rows → the k smallest by h. orderBy+limit is
    TakeOrderedAndProject: each map task forwards at most k rows."""
    return df.dropDuplicates(["h"]).orderBy("h").limit(KMV_K)


def _sketch(df: DataFrame, id_col: str = "user_id") -> DataFrame:
    c = F.col(id_col)
    return _bottom_k(
        df.select(_kh(c).cast("long").alias("h"), c.cast("long").alias("id"))
    )


def write_kmv_meta(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(
        [(int(KMV_K), int(_LAT), int(_META_VERSION))],
        "k bigint, lattice bigint, version bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_kmv_meta(spark: SparkSession, path: str) -> int:
    """Stored k; refuses a layout drift (bottom-k at a different k or
    hash lattice would merge into a biased sketch)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"kmv index at {path!r} predates layout metadata (or is not "
            "a kmv index); rebuild it with save_streaming_kmv_index"
        ) from e
    if row is None:
        raise ValueError(f"kmv meta at {path!r} is empty; rebuild the index")
    if int(row["k"]) != KMV_K or int(row["lattice"]) != _LAT:
        raise ValueError(
            f"kmv index at {path!r} uses k={int(row['k'])}, "
            f"lattice={int(row['lattice'])}; this engine uses k={KMV_K}, "
            f"lattice={_LAT}; rebuild the index"
        )
    return int(row["k"])


def save_streaming_kmv_index(
    df: DataFrame, path: str, id_col: str = "user_id"
) -> None:
    """Base index: `base/mins` (h, id — at most k rows) + `base/meta`."""
    spark = df.sparkSession
    _sketch(df, id_col).coalesce(1).write.mode("overwrite").parquet(
        path + "/base/mins"
    )
    write_kmv_meta(spark, path + "/base/meta")


def read_kmv_sketch(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged bottom-k over base ∪ committed deltas (union → bottom-k
    — associative+idempotent). Recovers a crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    r = spark.read.parquet(index_path + "/base/mins")
    for d in ik.committed_deltas(index_path, KMV_PTR):
        r = r.unionByName(spark.read.parquet(d + "/mins"))
    return _bottom_k(r)


def estimate_expr(kth: Column, n_state: Column) -> Column:
    """KMV estimate: exact n when the sketch is not full (every
    distinct hash fits), else (k−1)·M/h_(k). One double divide of two
    exact integers — identical in both engines."""
    return F.round(
        F.when(n_state < KMV_K, n_state.cast("double")).otherwise(
            F.lit(float(KMV_K - 1)) * _LAT / kth.cast("double")
        ),
        4,
    )


def estimate_sql(kth_expr: str, n_expr: str) -> str:
    return (
        f"round(CASE WHEN ({n_expr}) < {KMV_K} THEN CAST({n_expr} AS DOUBLE) "
        f"ELSE {float(KMV_K - 1)} * {_LAT} / CAST({kth_expr} AS DOUBLE) END, 4)"
    )


def kmv_estimate(spark: SparkSession, index_path: str) -> DataFrame:
    """One-row distinct estimate from the maintained sketch."""
    s = read_kmv_sketch(spark, index_path)
    agg = s.agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).cast("long").alias("n_state")
    )
    return agg.select(
        estimate_expr(F.col("kth"), F.col("n_state")).alias("est_distinct")
    )


def kmv_sample(spark: SparkSession, index_path: str) -> DataFrame:
    """The maintained uniform distinct-id sample (the bottom-k ids)."""
    return read_kmv_sketch(spark, index_path).select("id", "h").orderBy("h")


def compact_kmv_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base — bottom-k IS the fold.
    MAINTAINER MUST BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_kmv_sketch(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/mins")

    return ik.compact_index(
        index_path, KMV_PTR, "base", write_folded, copy_meta=True
    )


def kmv_maintenance_query(
    events: DataFrame,
    index_path: str,
    est_out: str,
    checkpoint_dir: str,
    id_col: str = "user_id",
) -> StreamingQuery:
    """Start the maintained KMV sketch over a streaming id frame.
    Per-epoch (post-fold cumulative estimate, k-th hash, state size)
    land in est_out/e<epoch>; the batch's bottom-k joins the index as
    delta e<epoch>. Caller awaits the query."""
    spark = events.sparkSession
    read_kmv_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        state = read_kmv_sketch(bsess, index_path)
        bs = _sketch(batch, id_col)
        merged = _bottom_k(state.unionByName(bs))
        agg = merged.agg(
            F.max("h").alias("kth"),
            F.count(F.lit(1)).cast("long").alias("n_state"),
        )
        est = agg.select(
            F.lit(int(epoch_id)).cast("long").alias("ep"),
            estimate_expr(F.col("kth"), F.col("n_state")).alias("est_distinct"),
            F.col("kth").cast("long").alias("kth_hash"),
            "n_state",
        )
        ik.publish_epoch_output(est, est_out, epoch_id)
        bs.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/mins")

    return ik.run_maintenance(
        events,
        index_path,
        KMV_PTR,
        "kmv bottom-k sketch",
        checkpoint_dir,
        process,
        gc_roots=(est_out,),
    )


def read_estimates(
    spark: SparkSession, est_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted estimate epochs; with ``index_path``, only
    epochs covered by the COMMITTED pointer. Empty → empty typed
    frame."""
    return ik.read_epoch_outputs(
        spark,
        est_out,
        EST_SCHEMA,
        index_path=index_path,
        ptr_name=KMV_PTR if index_path is not None else None,
    )
