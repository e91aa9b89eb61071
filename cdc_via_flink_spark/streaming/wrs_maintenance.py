"""Streaming-maintained WEIGHTED RESERVOIR SAMPLE (Efraimidis &
Spirtakis 2006 exponential-race bottom-k) — the TENTH adapter over
the shared maintained-index kernel. Completes the sampling family's
design points: q_stratified/q_balanced are rate-based Bernoulli
samplers (sample size drifts with the corpus), the KMV bottom-k is a
UNIFORM fixed-k distinct sample — this one is a FIXED-SIZE sample
where inclusion probability is proportional to a per-item WEIGHT
(document length here): the "keep k docs, longer docs more likely"
shape quality-weighted corpus subsampling needs.

Priority: pri(i) = -ln(u_i) / w_i with u_i = (h_i + 1) / 2^20 from
the engine's deterministic bijective lattice hash (u is an exact
dyadic rational — the 2^20 divisor is a power of two, so BOTH
engines' doubles are identical before the one ln+divide); the k
SMALLEST priorities are the sample. The fold (union → bottom-k by
priority) is associative AND idempotent — same algebra as KMV — so
delta fold-in and compaction are the same operation, replay is
harmless, and any partitioning folds to the sequential build. At a
real deployment swap the lattice for xxhash64; selection and fold
are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

WRS_PTR = "_WRS_COMMITTED"
OUT_SCHEMA = "ep bigint, n_state bigint, kth_pri double, total_w bigint"
WRS_K = 32
_LAT = 1048576  # 2^20 lattice
_MULT, _OFF = 912667, 71  # odd multiplier => bijection on the lattice
_META_VERSION = 1


def _kh(id_col: Column) -> Column:
    return ((id_col % _LAT) * _MULT + _OFF) % _LAT


def kh_sql(id_expr: str) -> str:
    return f"((({id_expr}) % {_LAT}) * {_MULT} + {_OFF}) % {_LAT}"


def pri_col(id_col: Column, w_col: Column) -> Column:
    u = (_kh(id_col).cast("double") + F.lit(1.0)) / F.lit(float(_LAT))
    return -F.log(u) / w_col.cast("double")


def pri_sql(id_expr: str, w_expr: str) -> str:
    return (
        f"-ln((CAST(({kh_sql(id_expr)}) AS DOUBLE) + 1.0) / {float(_LAT)})"
        f" / CAST({w_expr} AS DOUBLE)"
    )


def _bottom_k(df: DataFrame) -> DataFrame:
    """(pri, id, w) rows → the k smallest by (pri, id).
    orderBy+limit is TakeOrderedAndProject: each map task forwards at
    most k rows."""
    return df.dropDuplicates(["id"]).orderBy("pri", "id").limit(WRS_K)


def _sample(df: DataFrame, id_col: str, w_col: str) -> DataFrame:
    c, w = F.col(id_col), F.col(w_col)
    return _bottom_k(
        df.select(
            pri_col(c, w).alias("pri"),
            c.cast("long").alias("id"),
            w.cast("long").alias("w"),
        )
    )


def write_wrs_meta(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(
        [(int(WRS_K), int(_LAT), int(_MULT), int(_META_VERSION))],
        "k bigint, lattice bigint, mult bigint, version bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_wrs_meta(spark: SparkSession, path: str) -> int:
    """Stored k; refuses layout drift (bottom-k at a different k or
    hash family would merge into a biased sample)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"wrs index at {path!r} predates layout metadata (or is not "
            "a wrs index); rebuild it with save_streaming_wrs_index"
        ) from e
    if row is None:
        raise ValueError(f"wrs meta at {path!r} is empty; rebuild the index")
    if (
        int(row["k"]) != WRS_K
        or int(row["lattice"]) != _LAT
        or int(row["mult"]) != _MULT
    ):
        raise ValueError(
            f"wrs index at {path!r} uses k={int(row['k'])}, "
            f"lattice={int(row['lattice'])}, mult={int(row['mult'])}; this "
            f"engine uses k={WRS_K}, lattice={_LAT}, mult={_MULT}; rebuild "
            "the index"
        )
    return int(row["k"])


def save_streaming_wrs_index(
    df: DataFrame, path: str, id_col: str = "doc_id", w_col: str = "w"
) -> None:
    """Base index: `base/mins` (pri, id, w — at most k rows) +
    `base/meta`."""
    spark = df.sparkSession
    _sample(df, id_col, w_col).coalesce(1).write.mode("overwrite").parquet(
        path + "/base/mins"
    )
    write_wrs_meta(spark, path + "/base/meta")


def read_wrs_state(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged bottom-k over base ∪ committed deltas (union → bottom-k
    — associative+idempotent). Recovers a crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    r = spark.read.parquet(index_path + "/base/mins")
    for d in ik.committed_deltas(index_path, WRS_PTR):
        r = r.unionByName(spark.read.parquet(d + "/mins"))
    return _bottom_k(r)


def wrs_sample(spark: SparkSession, index_path: str) -> DataFrame:
    """The maintained weighted sample, priority-ordered."""
    return read_wrs_state(spark, index_path).select(
        "id", "w", F.round("pri", 9).alias("pri")
    ).orderBy("pri", "id")


def compact_wrs_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base — bottom-k IS the fold.
    MAINTAINER MUST BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_wrs_state(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/mins")

    return ik.compact_index(
        index_path, WRS_PTR, "base", write_folded, copy_meta=True
    )


def wrs_maintenance_query(
    docs: DataFrame,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    w_col: str = "w",
) -> StreamingQuery:
    """Start the maintained weighted sample over a streaming doc
    frame. Per-epoch (post-fold state size, k-th priority, total
    state weight) land in out_dir/e<epoch>; the batch's bottom-k
    joins the index as delta e<epoch>. Caller awaits the query."""
    spark = docs.sparkSession
    read_wrs_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        state = read_wrs_state(bsess, index_path)
        bs = _sample(batch, id_col, w_col)
        merged = _bottom_k(state.unionByName(bs))
        agg = merged.agg(
            F.count(F.lit(1)).cast("long").alias("n_state"),
            F.round(F.max("pri"), 9).alias("kth_pri"),
            F.sum("w").cast("long").alias("total_w"),
        )
        out = agg.select(
            F.lit(int(epoch_id)).cast("long").alias("ep"),
            "n_state",
            "kth_pri",
            "total_w",
        )
        ik.publish_epoch_output(out, out_dir, epoch_id)
        bs.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/mins")

    return ik.run_maintenance(
        docs,
        index_path,
        WRS_PTR,
        "weighted reservoir sample",
        checkpoint_dir,
        process,
        gc_roots=(out_dir,),
    )


def read_outputs(
    spark: SparkSession, out_dir: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted epochs; with ``index_path``, only epochs
    covered by the COMMITTED pointer. Empty → empty typed frame."""
    return ik.read_epoch_outputs(
        spark,
        out_dir,
        OUT_SCHEMA,
        index_path=index_path,
        ptr_name=WRS_PTR if index_path is not None else None,
    )
