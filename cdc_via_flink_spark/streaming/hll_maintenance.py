"""Streaming-maintained HLL REGISTER index — the SEVENTH adapter over
the shared maintained-index kernel (after ANN / dedup / winnow / Bloom
/ counting-Bloom / bitmap): the approximate sibling of the activity
bitmap. Where the bitmap's state is |ids|/32 words (exact membership),
the HLL's state is a FIXED 256 registers regardless of how many users
ever appear — the sketch a 100 TB deployment keeps per metric when
exact bitmaps stop fitting.

The register fold (max by register id) is associative AND idempotent —
the bitmap/Bloom property — so delta fold-in and compaction are the
same operation, replaying an epoch's delta is harmless by algebra, and
the merged registers over any partitioning equal the sequential build.

Every hash here is the engine's DETERMINISTIC LATTICE (odd-multiplier
mixers mod 2^20 in exact BIGINT arithmetic), not a real 64-bit hash —
that is what lets the DuckDB oracle simulate the registers bit-for-bit
(the stream_bloom_gate recipe). At a real deployment swap `_h1/_h2`
for xxhash64 slices; every downstream formula is unchanged.

Estimator (Flajolet et al. 2007): with M_j the register maxima,
  E_raw = alpha_m · m² / Σ_j 2^(−M_j)
computed EXACTLY: Σ 2^(−M_j) = (Σ 2^(48−M_j)) / 2^48 where the
numerator is a sum of exact BIGINT powers of two (M_j ≤ 21 « 48, 256
terms ≤ 2^56 — no float accumulation), so both engines divide the
same two exact numbers. Small-range correction: if E_raw ≤ 2.5·m and
V = #zero-registers > 0, E = m·ln(m/V) (ln over identical doubles).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

HLL_PTR = "_HLL_COMMITTED"
EST_SCHEMA = "ep bigint, est_users double, n_regs_changed bigint, n_zero_regs bigint"
M_REGS = 256  # p = 8
_LAT = 1048576  # 2^20 lattice
_MULT1, _OFF1 = 489905, 11  # register-select mixer (odd => bijection)
_MULT2, _OFF2 = 39916801 % _LAT, 17  # rho mixer
_RHO_CAP = 21  # h2 < 2^20: 20 trailing-zero cases + the h2 == 0 cap
_POW = 48  # numerator scale: sum of 2^(48 - M_j) stays in BIGINT
_META_VERSION = 1


def _h1(id_col: Column) -> Column:
    return ((id_col % _LAT) * _MULT1 + _OFF1) % _LAT


def _h2(id_col: Column) -> Column:
    return ((id_col % _LAT) * _MULT2 + _OFF2) % _LAT


def _rho(h2: Column) -> Column:
    """1 + trailing zeros of the 20-bit lattice value (21 if zero):
    h2 % 2^(k+1) == 2^k  <=>  exactly k trailing zeros — a pure
    integer CASE chain both engines evaluate identically."""
    expr = F.lit(_RHO_CAP)
    for k in reversed(range(20)):
        expr = F.when(h2 % (1 << (k + 1)) == (1 << k), F.lit(k + 1)).otherwise(expr)
    return expr


def rho_sql(h2_expr: str) -> str:
    whens = " ".join(
        f"WHEN ({h2_expr}) % {1 << (k + 1)} = {1 << k} THEN {k + 1}"
        for k in range(20)
    )
    return f"CASE {whens} ELSE {_RHO_CAP} END"


def h1_sql(id_expr: str) -> str:
    return f"((({id_expr}) % {_LAT}) * {_MULT1} + {_OFF1}) % {_LAT}"


def h2_sql(id_expr: str) -> str:
    return f"((({id_expr}) % {_LAT}) * {_MULT2} + {_OFF2}) % {_LAT}"


def _registers(df: DataFrame, id_col: str = "user_id") -> DataFrame:
    """ids → (reg, rho) register maxima for this frame."""
    c = F.col(id_col)
    return (
        df.select(
            (_h1(c) % M_REGS).alias("reg"), _rho(_h2(c)).alias("rho")
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
    )


def estimate_expr(num: Column, n_zero: Column) -> Column:
    """HLL estimate from the exact integer numerator Σ 2^(48−M_j)
    (empty registers contribute 2^48) and the zero-register count.
    Identical literal arithmetic in both engines; see estimate_sql."""
    alpha = 0.7213 / (1.0 + 1.079 / M_REGS)
    e_raw = (
        F.lit(alpha)
        * F.lit(float(M_REGS * M_REGS))
        * F.lit(float(1 << _POW))
        / num.cast("double")
    )
    lc = F.lit(float(M_REGS)) * F.log(F.lit(float(M_REGS)) / n_zero.cast("double"))
    return F.round(
        F.when((e_raw <= 2.5 * M_REGS) & (n_zero > 0), lc).otherwise(e_raw), 4
    )


def estimate_sql(num_expr: str, zero_expr: str) -> str:
    alpha = "0.7213 / (1.0 + 1.079 / 256.0)"
    e_raw = f"({alpha}) * 65536.0 * {float(1 << _POW)} / CAST({num_expr} AS DOUBLE)"
    lc = f"256.0 * ln(256.0 / CAST({zero_expr} AS DOUBLE))"
    return (
        f"round(CASE WHEN ({e_raw}) <= 640.0 AND ({zero_expr}) > 0 "
        f"THEN ({lc}) ELSE ({e_raw}) END, 4)"
    )


def write_hll_meta(spark: SparkSession, path: str) -> None:
    spark.createDataFrame(
        [(int(M_REGS), int(_RHO_CAP), int(_META_VERSION))],
        "m_regs bigint, rho_cap bigint, version bigint",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def read_hll_meta(spark: SparkSession, path: str) -> int:
    """Stored register count; refuses a layout drift (registers from a
    different m or rho cap would merge into nonsense)."""
    from pyspark.errors import AnalysisException

    try:
        row = spark.read.parquet(path).head()
    except AnalysisException as e:
        raise ValueError(
            f"hll index at {path!r} predates layout metadata (or is not "
            "an hll index); rebuild it with save_streaming_hll_index"
        ) from e
    if row is None:
        raise ValueError(f"hll meta at {path!r} is empty; rebuild the index")
    if int(row["m_regs"]) != M_REGS or int(row["rho_cap"]) != _RHO_CAP:
        raise ValueError(
            f"hll index at {path!r} uses m={int(row['m_regs'])}, "
            f"rho_cap={int(row['rho_cap'])}; this engine uses "
            f"m={M_REGS}, rho_cap={_RHO_CAP}; rebuild the index"
        )
    return int(row["m_regs"])


def save_streaming_hll_index(
    df: DataFrame, path: str, id_col: str = "user_id"
) -> None:
    """Base index: `base/regs` (reg, rho) + `base/meta`."""
    spark = df.sparkSession
    _registers(df, id_col).coalesce(1).write.mode("overwrite").parquet(
        path + "/base/regs"
    )
    write_hll_meta(spark, path + "/base/meta")


def read_hll_registers(spark: SparkSession, index_path: str) -> DataFrame:
    """Merged registers over base ∪ committed deltas (max by reg —
    associative+idempotent). Recovers a crashed compaction first."""
    ik.recover_compaction(index_path, "base")
    r = spark.read.parquet(index_path + "/base/regs")
    for d in ik.committed_deltas(index_path, HLL_PTR):
        r = r.unionByName(spark.read.parquet(d + "/regs"))
    return r.groupBy("reg").agg(F.max("rho").alias("rho"))


def hll_estimate(spark: SparkSession, index_path: str) -> DataFrame:
    """One-row cardinality estimate from the maintained registers."""
    regs = read_hll_registers(spark, index_path)
    agg = regs.agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_POW} - rho)")).alias("numf"),
        F.count(F.lit(1)).alias("n_filled"),
    )
    num = F.col("numf") + (F.lit(M_REGS) - F.col("n_filled")) * F.lit(1 << _POW)
    n_zero = F.lit(M_REGS) - F.col("n_filled")
    return agg.select(estimate_expr(num, n_zero).alias("est_users"))


def compact_hll_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base — max IS the fold.
    MAINTAINER MUST BE STOPPED. Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        read_hll_registers(spark, index_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp + "/regs")

    return ik.compact_index(
        index_path, HLL_PTR, "base", write_folded, copy_meta=True
    )


def hll_maintenance_query(
    events: DataFrame,
    index_path: str,
    est_out: str,
    checkpoint_dir: str,
    id_col: str = "user_id",
) -> StreamingQuery:
    """Start the maintained HLL over a streaming id frame. Per-epoch
    (post-fold cumulative estimate, #registers raised, #zero
    registers) land in est_out/e<epoch>; the batch's registers join
    the index as delta e<epoch>. Caller awaits the query."""
    spark = events.sparkSession
    read_hll_meta(spark, index_path + "/base/meta")

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        bsess = batch.sparkSession
        state = read_hll_registers(bsess, index_path).select(
            "reg", F.col("rho").alias("srho")
        )
        br = _registers(batch, id_col)
        merged = (
            br.join(state, "reg", "full")
            .select(
                "reg",
                F.greatest(
                    F.coalesce(F.col("rho"), F.lit(0)),
                    F.coalesce(F.col("srho"), F.lit(0)),
                ).alias("mrho"),
                (
                    F.coalesce(F.col("rho"), F.lit(0))
                    > F.coalesce(F.col("srho"), F.lit(0))
                ).cast("int").alias("raised"),
            )
        )
        agg = merged.agg(
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {_POW} - mrho)")
            ).alias("numf"),
            F.count(F.lit(1)).alias("n_filled"),
            F.sum("raised").cast("long").alias("n_regs_changed"),
        )
        num = F.col("numf") + (F.lit(M_REGS) - F.col("n_filled")) * F.lit(
            1 << _POW
        )
        n_zero = (F.lit(M_REGS) - F.col("n_filled")).cast("long")
        est = agg.select(
            F.lit(int(epoch_id)).cast("long").alias("ep"),
            estimate_expr(num, n_zero).alias("est_users"),
            "n_regs_changed",
            n_zero.alias("n_zero_regs"),
        )
        ik.publish_epoch_output(est, est_out, epoch_id)
        br.coalesce(1).write.mode("overwrite").parquet(delta_tmp + "/regs")

    return ik.run_maintenance(
        events,
        index_path,
        HLL_PTR,
        "hll register index",
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
        ptr_name=HLL_PTR if index_path is not None else None,
    )
