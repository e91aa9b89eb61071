"""Two-level bucketed-histogram quantile regression (the model step
of plans/stats_queries.py::q_quantile_regression — the 100x path; see
that query's docstring for the full scale argument and the oracle).

Lives in operators/ because, like the kmeans-centroid / holt folds,
it performs sanctioned MODEL-SIZED driver-side actions: the 1-row x/y
envelope aggregate, the 21-row Spark-evaluated slope grid, and the
21-row rank-k target-bucket frame are collected to become literals of
the big scans (a literal explode measured 4x faster than the
BroadcastNestedLoopJoin the declarative form plans). Declared-query
bodies themselves are action-free (pinned by tests/test_plans.py::
test_no_driver_collects_in_declared_query_bodies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

_QR_STEPS = 20  # slope grid resolution (candidates 0..steps)
_QR_BUCKETS = 1024  # histogram resolution of the two-level quantile


def pinball_grid_argmin(spark: SparkSession, li: DataFrame) -> DataFrame:
    """(tau, slope, intercept, avg_pinball) for tau = 0.9 over the
    (x, y) DECIMAL(18,2) frame ``li`` — exact grid-search quantile
    regression with the bucketed-histogram order statistic."""
    out_schema = (
        "tau double, slope double, intercept double, avg_pinball double"
    )
    # model-sized driver scalars: ONE column-pruned aggregate row (the
    # kmeans-centroid / holt precedent — a 1-row collect, never a loop)
    brow = li.agg(
        F.round(
            F.sum("y").cast("double") / F.sum("x").cast("double") * 2, 2
        )
        .cast("decimal(10,2)")
        .alias("smax"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("x").cast("double").alias("min_x"),
        F.max("x").cast("double").alias("max_x"),
        F.min("y").cast("double").alias("min_y"),
        F.max("y").cast("double").alias("max_y"),
    ).head()
    n = int(brow["n"])
    if n == 0 or brow["smax"] is None:
        return spark.createDataFrame([], out_schema)
    k = (9 * n + 9) // 10
    # slope grid evaluated BY SPARK on a 21-row local frame (identical
    # round-half-up double semantics to the oracle's expression), then
    # collected so the big passes explode a LITERAL array instead of
    # paying a BroadcastNestedLoopJoin (measured 4x slower than
    # explode on the same data)
    grid = spark.createDataFrame(
        [(g,) for g in range(_QR_STEPS + 1)], "g int"
    ).select(
        F.round(
            F.lit(float(brow["smax"])) * F.col("g") / float(_QR_STEPS), 2
        )
        .cast("decimal(10,2)")
        .alias("s")
    )
    svals = [r["s"] for r in grid.collect()]
    # per-slope bucket bounds from the global x/y envelope (s >= 0,
    # x > 0 => r in [min_y - s*max_x, max_y - s*min_x]); +-1 pads fp
    # slack. Plain IEEE doubles — the bucket id is a PARTITIONER
    # (monotone in r), never a value, so exactness is not needed; it
    # only must be the same literal in both passes, which it is by
    # construction.
    bounds = []
    for s in svals:
        lo = brow["min_y"] - float(s) * brow["max_x"] - 1.0
        hi = brow["max_y"] - float(s) * brow["min_x"] + 1.0
        bounds.append((s, lo, (hi - lo) / float(_QR_BUCKETS)))
    sl_arr = F.array(
        *[
            F.struct(
                F.lit(s).cast("decimal(10,2)").alias("s"),
                F.lit(lo).alias("lo"),
                F.lit(w).alias("w"),
            )
            for (s, lo, w) in bounds
        ]
    )
    # bucket id: monotone nondecreasing in r (fixed double function of
    # r), clamped to [0, nb-1] — equal residuals always share a bucket
    bkt = F.least(
        F.greatest(
            F.floor(
                (F.col("r").cast("double") - F.col("lo")) / F.col("w")
            ).cast("int"),
            F.lit(0),
        ),
        F.lit(_QR_BUCKETS - 1),
    ).alias("bkt")
    resid = li.select(F.explode(sl_arr).alias("g"), "x", "y").select(
        F.col("g.s").alias("s"),
        F.col("g.lo").alias("lo"),
        F.col("g.w").alias("w"),
        (F.col("y") - F.col("g.s") * F.col("x")).alias("r"),
    )
    # level 1: per-(slope, bucket) count + exact-DECIMAL sum — a
    # map-side-combinable hash aggregate whose shuffle is
    # 21 x _QR_BUCKETS rows regardless of n
    hist = (
        resid.select("s", "r", bkt)
        .groupBy("s", "bkt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("r").alias("sm"),
        )
    )
    cum = hist.select(
        "s",
        "bkt",
        "c",
        "sm",
        F.sum("c").over(W.partitionBy("s").orderBy("bkt")).alias("cum_c"),
        F.coalesce(
            F.sum("sm").over(
                W.partitionBy("s")
                .orderBy("bkt")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,4)"),
        ).alias("sum_below"),
        F.sum("sm").over(W.partitionBy("s")).alias("total"),
    )
    # first bucket whose cumulative count reaches rank k holds q;
    # collected (21 rows, model-sized) and rebuilt as a local relation
    # so the in-bucket pass's broadcast side does not re-execute the
    # histogram scan (Spark has no cross-reference subplan reuse
    # outside AQE exchange reuse — the re-scan tax measured 18.6 s)
    target_df = (
        cum.filter(F.col("cum_c") >= k)
        .withColumn(
            "rnb",
            F.row_number().over(W.partitionBy("s").orderBy("bkt")),
        )
        .filter(F.col("rnb") == 1)
        .select(
            "s",
            F.col("bkt").alias("tbkt"),
            (F.col("cum_c") - F.col("c")).alias("cnt_below"),
            "sum_below",
            "total",
        )
    )
    target = spark.createDataFrame(target_df.collect(), target_df.schema)
    # level 2: rank ONLY inside the target bucket (~n/nb rows per
    # slope). ONE window pass yields both the exact order statistic
    # (the j-th smallest in-bucket = the global k-th) and the in-
    # bucket prefix sum — the rank split makes sum(rn <= j) the exact
    # complement of sum_below (ties at q are interchangeable), so no
    # second scan and no r < q comparison is needed.
    j = F.lit(k) - F.col("cnt_below")
    in_bucket = (
        resid.select("s", "r", bkt)
        .join(F.broadcast(target), ["s"])
        .filter(F.col("bkt") == F.col("tbkt"))
    )
    ranked = in_bucket.withColumn(
        "rn", F.row_number().over(W.partitionBy("s").orderBy("r"))
    )
    full = ranked.groupBy("s", "cnt_below", "sum_below", "total").agg(
        F.max(F.when(F.col("rn") <= j, F.col("r"))).alias("q"),
        F.sum(F.when(F.col("rn") <= j, F.col("r"))).alias("s_lo_in"),
    )
    tau = F.expr("CAST(0.90 AS DECIMAL(3,2))")
    one_m_tau = F.expr("CAST(0.10 AS DECIMAL(3,2))")
    # S_lo = sum of the k smallest = sum_below + in-bucket prefix;
    # S_hi = total - S_lo; pinball decomposes over the rank split
    s_lo = F.col("sum_below") + F.col("s_lo_in")
    s_hi = F.col("total") - s_lo
    loss = full.select(
        "s",
        "q",
        F.lit(n).cast("long").alias("n"),
        (
            tau * (s_hi - F.lit(n - k) * F.col("q"))
            + one_m_tau * (F.lit(k) * F.col("q") - s_lo)
        ).alias("pl"),
    )
    return (
        loss.orderBy("pl", "s")
        .limit(1)
        .select(
            F.lit(0.9).alias("tau"),
            F.col("s").cast("double").alias("slope"),
            F.col("q").cast("double").alias("intercept"),
            F.round(F.col("pl").cast("double") / F.col("n"), 6).alias(
                "avg_pinball"
            ),
        )
    )
