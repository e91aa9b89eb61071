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

r12 (guide §2.3 "narrower types"): the per-row residual arithmetic of
both big passes runs in LONG integer cents-space — x, y are exact
2-decimal values and the grid slopes are exact 2-decimal values, so
r*10^4 = y_cents*100 - s_cents*x_cents is an exact 64-bit integer
(|r4| is bounded by the x/y envelope, independent of n). The decimal
multiply per (row, slope) was the passes' dominant cost: the level-1
histogram pass measured 3.51 s (decimal) vs 1.68 s (long) at sf0.1.
Decimal re-enters only on the 21 x _QR_BUCKETS-row histogram frame
(cast(sm4)/10000 — exact: the rational has <= 4 decimals and the
division result scale is 6), so every value the loss arithmetic sees
is bit-identical to the previous all-decimal form.

Overflow envelope of the long bucket sums: a per-(slope, bucket)
count n_b overflows sum(r4) only past n_b * max|r4| > 2^63, i.e.
~4e9 rows PER BUCKET at this fixture's |r4| <= ~2e9 — with
_QR_BUCKETS=1024 that is ~4e12 input rows (hundreds of TB of
lineitem); a deployment beyond it raises _QR_BUCKETS (which should
grow with n anyway to keep the in-bucket rank pass small).
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
    # the envelope derivation assumes s >= 0 and x > 0 (ADVICE r11:
    # negative sum(y)/sum(x) would yield hi < lo and an anti-monotone
    # bucket id — fail fast instead of a silently wrong quantile)
    if float(brow["smax"]) < 0:
        raise ValueError(
            f"pinball_grid_argmin requires sum(y)/sum(x) >= 0 "
            f"(got smax={brow['smax']}): the bucket-bound derivation "
            "assumes non-negative grid slopes over positive x"
        )
    bounds = []
    for s in svals:
        lo = brow["min_y"] - float(s) * brow["max_x"] - 1.0
        hi = brow["max_y"] - float(s) * brow["min_x"] + 1.0
        w = (hi - lo) / float(_QR_BUCKETS)
        if w <= 0:
            raise ValueError(
                f"pinball_grid_argmin bucket width {w} <= 0 at slope {s}: "
                "x/y envelope inconsistent with the s >= 0, x > 0 assumption"
            )
        bounds.append((s, lo, w))
    # fail-fast overflow guard (ADVICE r12): the long bucket sums wrap
    # silently in non-ANSI mode past n_b * max|r4| >= 2^63. Bound
    # max|r4| from the already-collected envelope (|r4| =
    # |y - s*x| * 10^4 <= (max|y| + smax*max|x|) * 10^4) and assert
    # with n_b <= n — conservative: a deployment past it must raise
    # _QR_BUCKETS (which should grow with n anyway), not ship a
    # silently wrong quantile.
    max_abs_y = max(abs(brow["min_y"]), abs(brow["max_y"]))
    max_abs_x = max(abs(brow["min_x"]), abs(brow["max_x"]))
    max_r4 = (max_abs_y + float(brow["smax"]) * max_abs_x) * 10_000 + 1
    if n * max_r4 >= float(2**63):
        raise ValueError(
            f"pinball_grid_argmin long-sum overflow envelope exceeded: "
            f"n={n} rows x max|r4|~{max_r4:.3g} >= 2^63; raise _QR_BUCKETS "
            "(per-bucket counts shrink) or partition the input"
        )
    # exact integer cents: s has 2 decimals by construction, x/y are
    # DECIMAL(18,2), so r4 = r * 10^4 = yc*100 - sc*xc is an exact
    # long — 21 long mult-adds per row instead of 21 decimal ones
    sl_arr = F.array(
        *[
            F.struct(
                F.lit(int(s.scaleb(2))).alias("sc"),
                F.lit(lo).alias("lo"),
                F.lit(w).alias("w"),
            )
            for (s, lo, w) in bounds
        ]
    )
    # bucket id: monotone nondecreasing in r (fixed double function of
    # r), clamped to [0, nb-1] — equal residuals always share a bucket.
    # r4/10000.0 is the correctly-rounded double of the exact rational
    # r (|r4| < 2^53), same value the old decimal-cast produced.
    def bkt(r4):
        return F.least(
            F.greatest(
                F.floor((r4 / 10000.0 - F.col("lo")) / F.col("w")).cast(
                    "int"
                ),
                F.lit(0),
            ),
            F.lit(_QR_BUCKETS - 1),
        )

    lic = li.select(
        (F.col("x") * 100).cast("long").alias("xc"),
        (F.col("y") * 100).cast("long").alias("yc"),
    )
    resid = lic.select(F.explode(sl_arr).alias("g"), "xc", "yc").select(
        F.col("g.sc").alias("sc"),
        F.col("g.lo").alias("lo"),
        F.col("g.w").alias("w"),
        (F.col("yc") * 100 - F.col("g.sc") * F.col("xc")).alias("r4"),
    )
    # level 1: per-(slope, bucket) count + exact long sum — a map-side-
    # combinable hash aggregate whose shuffle is 21 x _QR_BUCKETS rows
    # regardless of n. Decimal values are reconstructed EXACTLY on the
    # tiny frame: cast(sm4)/10000 carries scale 6 >= the rational's 4
    # decimals, then narrows to the previous decimal(38,4) type.
    hist = (
        resid.select("sc", "r4", bkt(F.col("r4")).alias("bkt"))
        .groupBy("sc", "bkt")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum("r4").alias("sm4"),
        )
        .select(
            "sc",
            "bkt",
            "c",
            (F.col("sm4").cast("decimal(34,0)") / 10000)
            .cast("decimal(38,4)")
            .alias("sm"),
        )
    )
    cum = hist.select(
        "sc",
        "bkt",
        "c",
        "sm",
        F.sum("c").over(W.partitionBy("sc").orderBy("bkt")).alias("cum_c"),
        F.coalesce(
            F.sum("sm").over(
                W.partitionBy("sc")
                .orderBy("bkt")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0).cast("decimal(38,4)"),
        ).alias("sum_below"),
        F.sum("sm").over(W.partitionBy("sc")).alias("total"),
    )
    # first bucket whose cumulative count reaches rank k holds q;
    # collected (21 rows, model-sized) and re-emitted as LITERALS of
    # the in-bucket pass's slope array, so that pass needs neither a
    # re-execution of the histogram scan (Spark has no cross-reference
    # subplan reuse outside AQE exchange reuse — the re-scan tax
    # measured 18.6 s) nor a broadcast join against the target frame
    target_df = (
        cum.filter(F.col("cum_c") >= k)
        .withColumn(
            "rnb",
            F.row_number().over(W.partitionBy("sc").orderBy("bkt")),
        )
        .filter(F.col("rnb") == 1)
        .select(
            "sc",
            F.col("bkt").alias("tbkt"),
            (F.col("cum_c") - F.col("c")).alias("cnt_below"),
            "sum_below",
            "total",
        )
    )
    trows = {r["sc"]: r for r in target_df.collect()}
    sl_arr2 = F.array(
        *[
            F.struct(
                F.lit(int(s.scaleb(2))).alias("sc"),
                F.lit(lo).alias("lo"),
                F.lit(w).alias("w"),
                F.lit(int(trows[int(s.scaleb(2))]["tbkt"])).alias("tbkt"),
                F.lit(int(trows[int(s.scaleb(2))]["cnt_below"])).alias(
                    "cnt_below"
                ),
                F.lit(trows[int(s.scaleb(2))]["sum_below"])
                .cast("decimal(38,4)")
                .alias("sum_below"),
                F.lit(trows[int(s.scaleb(2))]["total"])
                .cast("decimal(38,4)")
                .alias("total"),
            )
            for (s, lo, w) in bounds
        ]
    )
    # level 2: rank ONLY inside the target bucket (~n/nb rows per
    # slope). ONE window pass yields both the exact order statistic
    # (the j-th smallest in-bucket = the global k-th) and the in-
    # bucket prefix sum — the rank split makes sum(rn <= j) the exact
    # complement of sum_below (ties at q are interchangeable), so no
    # second scan and no r < q comparison is needed.
    j = F.lit(k) - F.col("cnt_below")
    in_bucket = (
        lic.select(F.explode(sl_arr2).alias("g"), "xc", "yc")
        .select(
            F.col("g.sc").alias("sc"),
            F.col("g.lo").alias("lo"),
            F.col("g.w").alias("w"),
            F.col("g.tbkt").alias("tbkt"),
            F.col("g.cnt_below").alias("cnt_below"),
            F.col("g.sum_below").alias("sum_below"),
            F.col("g.total").alias("total"),
            (F.col("yc") * 100 - F.col("g.sc") * F.col("xc")).alias("r4"),
        )
        .filter(bkt(F.col("r4")) == F.col("tbkt"))
    )
    ranked = in_bucket.withColumn(
        "rn", F.row_number().over(W.partitionBy("sc").orderBy("r4"))
    )
    full = ranked.groupBy("sc", "cnt_below", "sum_below", "total").agg(
        F.max(F.when(F.col("rn") <= j, F.col("r4"))).alias("q4"),
        F.sum(F.when(F.col("rn") <= j, F.col("r4"))).alias("s_lo_in4"),
    )
    # back to the exact decimals of the all-decimal form: q is a real
    # residual (4 decimals), s_lo_in a sum of them — both rationals
    # with <= 4 decimals, so the /10000 at scale 6 is exact
    full = full.select(
        "sc",
        "cnt_below",
        "sum_below",
        "total",
        (F.col("q4").cast("decimal(30,0)") / 10000)
        .cast("decimal(30,4)")
        .alias("q"),
        (F.col("s_lo_in4").cast("decimal(34,0)") / 10000)
        .cast("decimal(38,4)")
        .alias("s_lo_in"),
    )
    tau = F.expr("CAST(0.90 AS DECIMAL(3,2))")
    one_m_tau = F.expr("CAST(0.10 AS DECIMAL(3,2))")
    # S_lo = sum of the k smallest = sum_below + in-bucket prefix;
    # S_hi = total - S_lo; pinball decomposes over the rank split
    s_lo = F.col("sum_below") + F.col("s_lo_in")
    s_hi = F.col("total") - s_lo
    loss = full.select(
        "sc",
        "q",
        F.lit(n).cast("long").alias("n"),
        (
            tau * (s_hi - F.lit(n - k) * F.col("q"))
            + one_m_tau * (F.lit(k) * F.col("q") - s_lo)
        ).alias("pl"),
    )
    return (
        loss.orderBy("pl", "sc")
        .limit(1)
        .select(
            F.lit(0.9).alias("tau"),
            (F.col("sc") / 100.0).alias("slope"),
            F.col("q").cast("double").alias("intercept"),
            F.round(F.col("pl").cast("double") / F.col("n"), 6).alias(
                "avg_pinball"
            ),
        )
    )
