"""Distribution-statistics queries: the drift / robustness / inference
toolkit a data-quality pipeline runs over every metric it ships.

Reference parity note: the reference (a 2-pipeline Flink CDC demo,
`DebeziumTransactionReconstructor.java`) has no statistics surface at
all — these queries extend the engine the way SURVEY.md §2.8 frames
the LLM-pipeline extensions: first-class, oracle-checked, and designed
for the 1000-executor case (every cumulative statistic here is the
two-level distributed form, never a single global sort).

Float-parity policy is plans/registry.py's: integer/decimal
arithmetic end-to-end, one double fold at the very end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.plans.parity import dec
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov
# ---------------------------------------------------------------------------

# Bucket width for the two-level distributed CDF: order totals span
# [~900, 500k], so 8192-wide value buckets give ~61 buckets at every
# SF (the price DOMAIN, not the row count, sets the bucket count).
_KS_BUCKET = 8192


@query(
    "q_ks_two_sample",
    oracle="""
WITH s AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
c AS (
  SELECT v, CAST(sum(ia) AS BIGINT) AS ca,
         CAST(sum(1 - ia) AS BIGINT) AS cb
  FROM s GROUP BY v
),
t AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM c
),
cum AS (
  SELECT CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b
  FROM c
)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(max(abs(cum_a * t.nb - cum_b * t.na)) AS BIGINT) AS d_num,
       round(CAST(max(abs(cum_a * t.nb - cum_b * t.na)) AS DOUBLE)
             / (CAST(t.na AS DOUBLE) * t.nb), 6) AS d_stat
FROM cum CROSS JOIN t
GROUP BY t.na, t.nb
""",
    tags=("stats", "ks-test", "drift"),
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-SAMPLE KOLMOGOROV–SMIRNOV D between the order-total
    distributions of two customer segments — the standard
    nonparametric "did the distribution shift?" test (drift gates in
    training-data pipelines run exactly this between snapshots).

    Exactness: D = max|F_A - F_B| is computed on the INTEGER lattice —
    max|cumA·nB − cumB·nA| over distinct values — so the max compares
    exact BIGINTs; the one double divide happens after. No float CDF.

    Scale shape (the part the oracle's single `OVER (ORDER BY v)`
    cannot do at 100 TB): the cumulative count is the classic
    TWO-LEVEL DISTRIBUTED PREFIX SUM —
      1. groupBy distinct value (one input-sized shuffle, counts per
         value per sample);
      2. values are range-bucketed by the price DOMAIN (~61 buckets at
         any SF); each bucket computes its local running sum in a
         bucket-partitioned window (parallel);
      3. only the ~61 bucket totals pass through a global window for
         the cross-bucket offsets, broadcast back.
    The single-partition window therefore touches O(#buckets) rows
    regardless of input size — the same recipe as q_skyline_pareto."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        dec(F.col("o_totalprice")).alias("v"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("ia"),
    )
    cnt = s.groupBy("v").agg(
        F.sum("ia").cast("long").alias("ca"),
        F.sum(1 - F.col("ia")).cast("long").alias("cb"),
    )
    tot = cnt.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    # two-level prefix sum: bucket-local running counts ...
    b = cnt.withColumn("bkt", F.floor(F.col("v") / _KS_BUCKET).cast("long"))
    loc = b.select(
        "bkt",
        "v",
        F.sum("ca").over(W.partitionBy("bkt").orderBy("v")).alias("la"),
        F.sum("cb").over(W.partitionBy("bkt").orderBy("v")).alias("lb"),
    )
    # ... plus cross-bucket offsets computed over one row per bucket.
    btot = b.groupBy("bkt").agg(
        F.sum("ca").alias("ba"), F.sum("cb").alias("bb")
    )
    off = btot.select(
        "bkt",
        (F.coalesce(
            F.sum("ba").over(W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )).alias("oa"),
        (F.coalesce(
            F.sum("bb").over(W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )).alias("ob"),
    )
    cum = loc.join(F.broadcast(off), "bkt").select(
        (F.col("oa") + F.col("la")).cast("long").alias("cum_a"),
        (F.col("ob") + F.col("lb")).cast("long").alias("cum_b"),
    )
    d = cum.crossJoin(F.broadcast(tot)).agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("nb") - F.col("cum_b") * F.col("na"))
        )
        .cast("long")
        .alias("d_num"),
    )
    return d.select(
        "n_a",
        "n_b",
        "d_num",
        F.round(
            F.col("d_num").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b")),
            6,
        ).alias("d_stat"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index (PSI)
# ---------------------------------------------------------------------------

_PSI_SPLIT = "1995-07-01"
_PSI_WIDTH = 50000  # fixed-width price buckets 0..9 (domain-driven)


@query(
    "q_psi_drift",
    oracle=f"""
WITH s AS (
  SELECT least(CAST(floor(o_totalprice / {_PSI_WIDTH}) AS BIGINT), 9) AS bucket,
         CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}' THEN 1 ELSE 0 END AS r
  FROM orders
),
c AS (
  SELECT bucket, CAST(sum(r) AS BIGINT) AS n_ref,
         CAST(sum(1 - r) AS BIGINT) AS n_cur
  FROM s GROUP BY bucket
),
t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
             CAST(sum(n_cur) AS BIGINT) AS tc FROM c),
term AS (
  SELECT bucket, n_ref, n_cur,
         CAST(n_ref AS DOUBLE) / tr AS p_ref,
         CAST(n_cur AS DOUBLE) / tc AS p_cur,
         (CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr)
           * ln((CAST(n_cur AS DOUBLE) / tc) / (CAST(n_ref AS DOUBLE) / tr))
           AS psi_term
  FROM c CROSS JOIN t
),
tot AS (
  SELECT CAST(sum(CAST(round(psi_term, 10) AS DECIMAL(28,10))) AS DOUBLE)
           AS psi_total
  FROM term
)
SELECT bucket, n_ref, n_cur,
       round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
       round(psi_term, 6) AS psi_term,
       round(psi_total, 6) AS psi_total
FROM term CROSS JOIN tot
ORDER BY bucket
""",
    tags=("stats", "psi", "drift"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POPULATION STABILITY INDEX between the 1992–mid-1995 order-total
    distribution (reference window) and mid-1995–1998 (current) — the
    standard model-monitoring drift score (PSI < 0.1 stable, > 0.25
    investigate), bucketed by the price DOMAIN (ten fixed-width bins)
    so the bin edges are scale-independent constants, not data-driven
    quantiles that would themselves drift.

    One input-sized aggregation (bucket × window counts); everything
    after runs on ten rows. Parity: counts are exact integers; each
    PSI term is (p_cur−p_ref)·ln(p_cur/p_ref) in double (ln over
    identical doubles — the q_benford_screen precedent), and the TOTAL
    folds DECIMAL(28,10)-rounded terms so the cross-engine sum is
    association-order independent."""
    o = _t(spark, sf_dir, "orders")
    s = o.select(
        F.least(F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("long"), F.lit(9))
        .alias("bucket"),
        F.when(F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("r"),
    )
    c = s.groupBy("bucket").agg(
        F.sum("r").cast("long").alias("n_ref"),
        F.sum(1 - F.col("r")).cast("long").alias("n_cur"),
    )
    t = c.agg(
        F.sum("n_ref").cast("long").alias("tr"),
        F.sum("n_cur").cast("long").alias("tc"),
    )
    p_ref = F.col("n_ref").cast("double") / F.col("tr")
    p_cur = F.col("n_cur").cast("double") / F.col("tc")
    term = c.crossJoin(F.broadcast(t)).select(
        "bucket",
        "n_ref",
        "n_cur",
        p_ref.alias("p_ref"),
        p_cur.alias("p_cur"),
        ((p_cur - p_ref) * F.log(p_cur / p_ref)).alias("psi_term"),
    )
    tot = term.agg(
        F.sum(F.round(F.col("psi_term"), 10).cast("decimal(28,10)"))
        .cast("double")
        .alias("psi_total")
    )
    return (
        term.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round("p_ref", 6).alias("p_ref"),
            F.round("p_cur", 6).alias("p_cur"),
            F.round("psi_term", 6).alias("psi_term"),
            F.round("psi_total", 6).alias("psi_total"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Median / MAD robust outlier screen
# ---------------------------------------------------------------------------


@query(
    "q_mad_outliers",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
r AS (
  SELECT seg, spend,
         row_number() OVER (PARTITION BY seg ORDER BY spend, o_custkey) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM s
),
med AS (
  SELECT seg, max(n) AS n,
         max(CASE WHEN rn = (n + 1) // 2 THEN spend END) AS median_spend
  FROM r GROUP BY seg
),
dev AS (
  SELECT s.seg, s.spend, med.n, med.median_spend,
         abs(s.spend - med.median_spend) AS d
  FROM s JOIN med ON s.seg = med.seg
),
dr AS (
  SELECT seg, n, median_spend, d,
         row_number() OVER (PARTITION BY seg ORDER BY d, spend) AS rn
  FROM dev
),
mad AS (
  SELECT seg, max(n) AS n, max(median_spend) AS median_spend,
         max(CASE WHEN rn = (n + 1) // 2 THEN d END) AS mad
  FROM dr GROUP BY seg
)
SELECT dev.seg AS c_mktsegment,
       CAST(max(mad.n) AS BIGINT) AS n_customers,
       CAST(max(mad.median_spend) AS DOUBLE) AS median_spend,
       CAST(max(mad.mad) AS DOUBLE) AS mad,
       CAST(sum(CASE WHEN dev.d > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev JOIN mad ON dev.seg = mad.seg
GROUP BY dev.seg
ORDER BY c_mktsegment
""",
    tags=("stats", "robust", "outliers"),
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN / MAD ROBUST OUTLIER SCREEN per market segment — the
    robust alternative to q_rolling_zscore_anomaly's mean/stddev: the
    median and the median absolute deviation are breakdown-50%
    statistics, so one whale customer cannot move the threshold.

    Determinism: both medians are DISCRETE lower medians selected by
    row_number (rn == (n+1)/2) — an exact DECIMAL value from the data,
    never an interpolated float — and the outlier predicate
    |x − med| > 3·MAD compares DECIMALs exactly. Per-segment windows
    shuffle once on the segment key; at 100 TB the in-group sort swaps
    for the quantile-binned selection documented in q_gini_spend."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            F.sum(dec(F.col("o_totalprice"))).cast("decimal(28,2)").alias("spend")
        )
    )
    r = s.select(
        "seg",
        "spend",
        F.row_number()
        .over(W.partitionBy("seg").orderBy("spend", "o_custkey"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("seg")).alias("n"),
    )
    med = r.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"), F.col("spend"))
        ).alias("median_spend"),
    )
    dev = s.join(F.broadcast(med), "seg").select(
        "seg",
        "spend",
        "n",
        "median_spend",
        F.abs(F.col("spend") - F.col("median_spend")).alias("d"),
    )
    dr = dev.select(
        "seg",
        "n",
        "median_spend",
        "d",
        F.row_number().over(W.partitionBy("seg").orderBy("d", "spend")).alias("rn"),
    )
    mad = dr.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.max("median_spend").alias("median_spend"),
        F.max(
            F.when(F.col("rn") == ((F.col("n") + 1) / 2).cast("long"), F.col("d"))
        ).alias("mad"),
    )
    return (
        dev.select("seg", "d")
        .join(F.broadcast(mad), "seg")
        .groupBy("seg")
        .agg(
            F.max("n").cast("long").alias("n_customers"),
            F.max("median_spend").cast("double").alias("median_spend"),
            F.max("mad").cast("double").alias("mad"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumnRenamed("seg", "c_mktsegment")
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

_B = 64  # bootstrap replicates
_M = 1048576  # 2^20 hash lattice
_MULT = 489905  # 2654435761 mod 2^20 (odd -> bijection mod 2^20)
_BSTEP = 97003
# Poisson(1) inverse-CDF thresholds on u = h / 2^20 (u exact: h < 2^20
# over a power-of-two denominator). Capped at 4 (P(X>4) ~ 0.4%).
_P0, _P1, _P2, _P3 = 0.3678794412, 0.7357588824, 0.9196986029, 0.9810118431


def _w_sql() -> str:
    return (
        f"CASE WHEN u < {_P0} THEN 0 WHEN u < {_P1} THEN 1 "
        f"WHEN u < {_P2} THEN 2 WHEN u < {_P3} THEN 3 ELSE 4 END"
    )


@query(
    "q_poisson_bootstrap_ci",
    oracle=f"""
WITH reps AS (
  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS rev, b
  FROM orders CROSS JOIN (SELECT unnest(range({_B})) AS b)
),
u AS (
  SELECT b, rev,
         CAST(((o_orderkey % {_M}) * {_MULT} + b * {_BSTEP}) % {_M} AS DOUBLE)
           / {_M} AS u
  FROM reps
),
w AS (SELECT b, rev, {_w_sql()} AS w FROM u),
means AS (
  SELECT b,
         CAST(sum(CAST(w AS DECIMAL(18,2)) * rev) AS DOUBLE)
           / CAST(sum(w) AS DOUBLE) AS mean_b
  FROM w GROUP BY b
),
ranked AS (
  SELECT mean_b, row_number() OVER (ORDER BY mean_b, b) AS rn FROM means
),
full_mean AS (
  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
           AS mean_full
  FROM orders
)
SELECT CAST({_B} AS BIGINT) AS b_reps,
       round(max(mean_full), 2) AS mean_full,
       round(max(CASE WHEN rn = 2 THEN mean_b END), 2) AS ci_lo,
       round(max(CASE WHEN rn = {_B - 1} THEN mean_b END), 2) AS ci_hi
FROM ranked CROSS JOIN full_mean
""",
    tags=("stats", "bootstrap", "inference"),
)
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP 95% CI on mean order revenue — the
    DISTRIBUTED bootstrap (Chamandy et al., Google 2012): classic
    resampling needs n draws from a dataset no single machine holds;
    Poisson(1) per-row weights approximate multinomial resampling with
    NO coordination — each row computes its own weight for all B
    replicates map-side, and the per-replicate means come out of ONE
    partial-aggregating groupBy(b) (shuffle rows: B × #partitions,
    not B × n).

    Determinism: the "draw" is a hash lattice — u = ((key mod 2^20) ·
    489905 + b·97003 mod 2^20) / 2^20, a bijective odd-multiplier
    mixer both engines evaluate in exact BIGINT arithmetic; u is an
    exact double (power-of-two denominator), so the inverse-CDF CASE
    thresholds cut identically. CI endpoints are order statistics of
    the 64 replicate means (rank 2 / rank 63 ≈ 2.5%/97.5%), selected
    by row_number — no interpolation. At 100 TB swap the mixer for
    xxhash64(key, b) (same shape; the lattice here is for
    cross-engine oracle parity)."""
    o = _t(spark, sf_dir, "orders")
    reps = o.select(
        "o_orderkey",
        dec(F.col("o_totalprice")).alias("rev"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("b"),
    )
    u = (
        ((F.col("o_orderkey") % _M) * _MULT + F.col("b") * _BSTEP) % _M
    ).cast("double") / _M
    w = reps.select(
        "b",
        "rev",
        F.when(u < _P0, 0)
        .when(u < _P1, 1)
        .when(u < _P2, 2)
        .when(u < _P3, 3)
        .otherwise(4)
        .alias("w"),
    )
    means = w.groupBy("b").agg(
        (
            F.sum(F.col("w").cast("decimal(18,2)") * F.col("rev")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_b")
    )
    ranked = means.select(
        "mean_b", F.row_number().over(W.orderBy("mean_b", "b")).alias("rn")
    )
    full_mean = o.agg(
        (F.sum(dec(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1))).alias(
            "mean_full"
        )
    )
    return ranked.crossJoin(F.broadcast(full_mean)).agg(
        F.lit(_B).cast("long").alias("b_reps"),
        F.round(F.max("mean_full"), 2).alias("mean_full"),
        F.round(F.max(F.when(F.col("rn") == 2, F.col("mean_b"))), 2).alias("ci_lo"),
        F.round(F.max(F.when(F.col("rn") == _B - 1, F.col("mean_b"))), 2).alias(
            "ci_hi"
        ),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function of the monthly revenue series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 6

_SQL_GMREV = """
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
FROM orders GROUP BY 1
"""


_ACF_PAIRS_SQL = f"""m AS ({_SQL_GMREV}),
idx AS (SELECT rev, row_number() OVER (ORDER BY month) AS i FROM m),
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rev) AS DOUBLE) AS sx,
         CAST(sum(CAST(rev AS DECIMAL(19,2)) * rev) AS DOUBLE) AS sxx
  FROM idx
),
lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
pairs AS (
  SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(a.rev) AS DOUBLE) AS sa,
         CAST(sum(b.rev) AS DOUBLE) AS sb,
         CAST(sum(CAST(a.rev AS DECIMAL(19,2)) * b.rev) AS DOUBLE) AS sab
  FROM lags l
  JOIN idx a ON TRUE
  JOIN idx b ON b.i = a.i + l.lag
  GROUP BY l.lag
)"""

_ACF_RAW_SQL = """(p.sab - (base.sx / base.n) * p.sa - (base.sx / base.n) * p.sb
              + p.n_pairs * (base.sx / base.n) * (base.sx / base.n))
             / (base.sxx - base.n * (base.sx / base.n) * (base.sx / base.n))"""


@query(
    "q_acf_revenue",
    oracle=f"""
WITH {_ACF_PAIRS_SQL}
SELECT p.lag, p.n_pairs,
       round({_ACF_RAW_SQL},
             6) AS acf
FROM pairs p CROSS JOIN base
ORDER BY p.lag
""",
    tags=("stats", "timeseries", "acf"),
)
def q_acf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE AUTOCORRELATION FUNCTION of global monthly revenue at
    lags 1..6 — the seasonality detector that decides q_seasonal_
    indices' period and q_forecast_revenue_change's model order:
    r_k = Σ(x_t − x̄)(x_{t+k} − x̄) / Σ(x_t − x̄)².

    Parity: the centered products are EXPANDED into raw moment sums
    (Σx_t·x_{t+k}, Σx_t, Σx²) computed in exact DECIMAL — one operand
    widened to (19,2) so the (37,4) product runs int128 in BOTH
    engines (DuckDB overflows an int64 (18,2)×(18,2)) — so no float
    accumulates; the
    closed form evaluates in double once per lag. The input-sized work
    is the month aggregation; the lag self-join runs on the ~84-row
    month series (time-dimension-sized, ~constant as data grows), the
    same blocking argument as q_mann_kendall_trend."""
    return _acf_raw(spark, sf_dir).select(
        "lag", "n_pairs", F.round(F.col("acf_raw"), 6).alias("acf")
    ).orderBy("lag")


def _acf_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lag sample autocorrelation, UNROUNDED (shared by
    q_acf_revenue at 6 dp and q_pacf_revenue's Durbin-Levinson input
    at 12 dp); the closed-form double is identical to the pre-split
    expression so q_acf_revenue's hash is unchanged."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month")).agg(
        F.sum(dec(F.col("o_totalprice"))).cast("decimal(18,2)").alias("rev")
    )
    idx = m.select("rev", F.row_number().over(W.orderBy("month")).alias("i"))
    base = idx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("double").alias("sx"),
        F.sum(F.col("rev").cast("decimal(19,2)") * F.col("rev"))
        .cast("double")
        .alias("sxx"),
    )
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = idx.select(F.col("i").alias("ia"), F.col("rev").alias("ra"))
    b = idx.select(F.col("i").alias("ib"), F.col("rev").alias("rb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("ib") == F.col("ia") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("ra").cast("double").alias("sa"),
            F.sum("rb").cast("double").alias("sb"),
            F.sum(F.col("ra").cast("decimal(19,2)") * F.col("rb"))
            .cast("double")
            .alias("sab"),
        )
    )
    xbar = F.col("sx") / F.col("n")
    return pairs.crossJoin(F.broadcast(base)).select(
        "lag",
        "n_pairs",
        (
            (
                F.col("sab")
                - xbar * F.col("sa")
                - xbar * F.col("sb")
                + F.col("n_pairs") * xbar * xbar
            )
            / (F.col("sxx") - F.col("n") * xbar * xbar)
        ).alias("acf_raw"),
    )


# ---------------------------------------------------------------------------
# Mutual information feature ranking
# ---------------------------------------------------------------------------

_MI_FEATURES = {
    "linestatus": "l_linestatus",
    "ship_month": "CAST(month(l_shipdate) AS STRING)",
    "qty_bucket": "CAST(CAST(floor(l_quantity / 10) AS BIGINT) AS STRING)",
    "disc_bucket": "CAST(CAST(floor(l_discount * 100) AS BIGINT) AS STRING)",
}


def _mi_oracle() -> str:
    unions = " UNION ALL ".join(
        f"SELECT '{name}' AS feature, {expr} AS x, l_returnflag AS y FROM lineitem"
        for name, expr in _MI_FEATURES.items()
    )
    return f"""
WITH fx AS ({unions}),
jnt AS (SELECT feature, x, y, CAST(count(*) AS BIGINT) AS nxy
        FROM fx GROUP BY feature, x, y),
mx AS (SELECT feature, x, CAST(sum(nxy) AS BIGINT) AS nx
       FROM jnt GROUP BY feature, x),
my AS (SELECT feature, y, CAST(sum(nxy) AS BIGINT) AS ny
       FROM jnt GROUP BY feature, y),
nt AS (SELECT feature, CAST(sum(nxy) AS BIGINT) AS n FROM jnt GROUP BY feature),
terms AS (
  SELECT jnt.feature,
         (CAST(jnt.nxy AS DOUBLE) / nt.n)
           * ln((CAST(jnt.nxy AS DOUBLE) * nt.n)
                / (CAST(mx.nx AS DOUBLE) * my.ny)) AS t
  FROM jnt
  JOIN mx ON mx.feature = jnt.feature AND mx.x = jnt.x
  JOIN my ON my.feature = jnt.feature AND my.y = jnt.y
  JOIN nt ON nt.feature = jnt.feature
)
SELECT feature,
       CAST(sum(CAST(round(t, 12) AS DECIMAL(28,12))) AS DOUBLE)
         AS mi_raw,
       round(CAST(sum(CAST(round(t, 12) AS DECIMAL(28,12))) AS DOUBLE), 6)
         AS mi_nats
FROM terms GROUP BY feature
ORDER BY mi_nats DESC, feature
"""


@query(
    "q_mutual_information",
    oracle=_mi_oracle(),
    tags=("stats", "feature-selection", "mi"),
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL-INFORMATION FEATURE RANKING — I(X;Y) in nats between
    each candidate feature and the l_returnflag label: the
    feature-selection screen a training pipeline runs before paying
    for a model. Four features from ONE melted scan (feature-tagged
    union, same physical read via column pruning per branch); the MI
    terms use exact integer contingency counts, per-term double
    arithmetic (the PSI ln precedent) and a DECIMAL(28,12) fold so the
    cross-engine sum is association-order independent. Everything
    after the contingency groupBy runs on |X|·|Y|-sized rows."""
    li = _t(spark, sf_dir, "lineitem")
    parts = []
    for name, expr in _MI_FEATURES.items():
        parts.append(
            li.select(
                F.lit(name).alias("feature"),
                F.expr(expr).alias("x"),
                F.col("l_returnflag").alias("y"),
            )
        )
    fx = parts[0]
    for p in parts[1:]:
        fx = fx.unionByName(p)
    jnt = fx.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("nxy")
    )
    mx = jnt.groupBy("feature", "x").agg(F.sum("nxy").cast("long").alias("nx"))
    my = jnt.groupBy("feature", "y").agg(F.sum("nxy").cast("long").alias("ny"))
    nt = jnt.groupBy("feature").agg(F.sum("nxy").cast("long").alias("n"))
    t = (
        jnt.join(F.broadcast(mx), ["feature", "x"])
        .join(F.broadcast(my), ["feature", "y"])
        .join(F.broadcast(nt), "feature")
        .select(
            "feature",
            (
                (F.col("nxy").cast("double") / F.col("n"))
                * F.log(
                    (F.col("nxy").cast("double") * F.col("n"))
                    / (F.col("nx").cast("double") * F.col("ny"))
                )
            ).alias("t"),
        )
    )
    mi = F.sum(F.round(F.col("t"), 12).cast("decimal(28,12)")).cast("double")
    return (
        t.groupBy("feature")
        .agg(mi.alias("mi_raw"))
        .select(
            "feature",
            "mi_raw",
            F.round("mi_raw", 6).alias("mi_nats"),
        )
        .orderBy(F.col("mi_nats").desc(), "feature")
    )


# ---------------------------------------------------------------------------
# Leave-one-out target encoding
# ---------------------------------------------------------------------------


@query(
    "q_target_encoding_loo",
    oracle="""
WITH t AS (
  SELECT c.c_nationkey AS nk, o.o_orderkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS DECIMAL(28,2)) AS sy
  FROM t GROUP BY nk
),
enc AS (
  SELECT t.nk, g.n,
         CAST(g.sy AS DOUBLE) / g.n AS mean_y,
         (CAST(g.sy AS DOUBLE) - CAST(t.y AS DOUBLE)) / (g.n - 1) AS loo
  FROM t JOIN g ON t.nk = g.nk WHERE g.n > 1
)
SELECT nk AS c_nationkey, CAST(max(n) AS BIGINT) AS n_orders,
       round(max(mean_y), 6) AS mean_target,
       round(min(loo), 6) AS loo_min,
       round(max(loo), 6) AS loo_max
FROM enc GROUP BY nk
ORDER BY nk
""",
    tags=("stats", "feature-engineering", "target-encoding"),
)
def q_target_encoding_loo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAVE-ONE-OUT TARGET ENCODING of customer nation against order
    total — the standard high-cardinality categorical encoder with
    the self-leakage removed: enc(row) = (Σ_group y − y_row)/(n−1),
    computable for EVERY row from one broadcast of per-group (n, Σy)
    — no per-row window, no self-join. Output validates the encoder
    per nation (n, mean, LOO min/max); sums are exact DECIMAL so the
    subtraction loses nothing, each output is one double divide."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nk"),
        dec(F.col("o_totalprice")).alias("y"),
    )
    g = t.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("decimal(28,2)").alias("sy"),
    )
    enc = t.join(F.broadcast(g), "nk").filter(F.col("n") > 1).select(
        "nk",
        "n",
        (F.col("sy").cast("double") / F.col("n")).alias("mean_y"),
        (
            (F.col("sy").cast("double") - F.col("y").cast("double"))
            / (F.col("n") - 1)
        ).alias("loo"),
    )
    return (
        enc.groupBy("nk")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.round(F.max("mean_y"), 6).alias("mean_target"),
            F.round(F.min("loo"), 6).alias("loo_min"),
            F.round(F.max("loo"), 6).alias("loo_max"),
        )
        .withColumnRenamed("nk", "c_nationkey")
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------------------------------
# Deterministic class rebalancing
# ---------------------------------------------------------------------------


@query(
    "q_balanced_downsample",
    oracle="""
WITH m AS (SELECT CAST(min(cnt) AS BIGINT) AS target
           FROM (SELECT count(*) AS cnt FROM documents GROUP BY lang)),
r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY (doc_id * 2654435761) % 1048576, doc_id)
           AS rn
  FROM documents
)
SELECT r.lang, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(sum(r.doc_id) AS BIGINT) AS kept_ids_sum,
       CAST(sum(r.n_chars) AS BIGINT) AS kept_chars
FROM r CROSS JOIN m WHERE r.rn <= m.target
GROUP BY r.lang
ORDER BY r.lang
""",
    tags=("stats", "sampling", "rebalancing"),
)
def q_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BALANCED CLASS DOWNSAMPLING — every language downsampled to the
    minority-class size, rows chosen by DETERMINISTIC hash order
    (shuffle-by-hash-rank: the reproducible version of random
    sampling; same mixer family as q_poisson_bootstrap_ci). One
    class-keyed rank window; the kept-id checksum pins the exact kept
    SET, not just its size, so a selection drift hash-mismatches.
    At 100 TB the rank window swaps for a per-class hash-threshold
    filter (keep iff h < target/cnt · 2^20, then exact trim) —
    one pass, no sort; the window form is the oracle-exact twin."""
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).agg(
        F.min("cnt").cast("long").alias("target")
    )
    r = d.select(
        "lang",
        "doc_id",
        "n_chars",
        F.row_number()
        .over(
            W.partitionBy("lang").orderBy(
                (F.col("doc_id") * 2654435761) % 1048576, "doc_id"
            )
        )
        .alias("rn"),
    )
    return (
        r.crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("target"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_ids_sum"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Two-proportion A/B z-test
# ---------------------------------------------------------------------------

# deterministic 50/50 assignment: same lattice family as the bootstrap
_AB_MULT = 292709  # odd => bijection mod 2^20


@query(
    "q_ab_test_proportions",
    oracle=f"""
WITH a AS (
  SELECT user_id,
         ((user_id % {_M}) * {_AB_MULT} + 5) % {_M} AS h,
         CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   >= 14 THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY user_id
),
g AS (
  SELECT CASE WHEN h % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(converted) AS BIGINT) AS conv
  FROM a GROUP BY 1
),
w AS (
  SELECT max(CASE WHEN variant = 'A' THEN n END) AS na,
         max(CASE WHEN variant = 'A' THEN conv END) AS ca,
         max(CASE WHEN variant = 'B' THEN n END) AS nb,
         max(CASE WHEN variant = 'B' THEN conv END) AS cb
  FROM g
)
SELECT na, ca, nb, cb,
       round(CAST(ca AS DOUBLE) / na, 6) AS p_a,
       round(CAST(cb AS DOUBLE) / nb, 6) AS p_b,
       round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / sqrt((CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                    * (1.0 / na + 1.0 / nb)), 6) AS z
FROM w
""",
    tags=("stats", "ab-test", "inference"),
)
def q_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION A/B TEST on per-user purchase conversion under a
    deterministic 50/50 hash split (the assignment function an
    experimentation platform actually ships — reproducible, no RNG
    state): pooled-variance z statistic. Conversion = ≥14 purchases
    (the fixture's every-user-buys rate makes a has-any-purchase
    metric degenerate: pooled p = 1 ⇒ zero variance); one user-grain
    aggregate, a 2-row variant rollup, exact integers until the one
    shared double chain."""
    e = _t(spark, sf_dir, "events")
    a = e.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            >= 14,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (((F.col("user_id") % _M) * _AB_MULT + 5) % _M).alias("h"),
        "converted",
    )
    g = a.select(
        F.when(F.col("h") % 2 == 0, "A").otherwise("B").alias("variant"),
        "converted",
    ).groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    w = g.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("conv"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("conv"))).alias("cb"),
    )
    na, ca, nb, cb = (F.col(x) for x in ("na", "ca", "nb", "cb"))
    pp = (ca + cb).cast("double") / (na + nb)
    return w.select(
        na,
        ca,
        nb,
        cb,
        F.round(ca.cast("double") / na, 6).alias("p_a"),
        F.round(cb.cast("double") / nb, 6).alias("p_b"),
        F.round(
            (ca.cast("double") / na - cb.cast("double") / nb)
            / F.sqrt(pp * (1.0 - pp) * (1.0 / na + 1.0 / nb)),
            6,
        ).alias("z"),
    )


# ---------------------------------------------------------------------------
# Randomization (approximate permutation) test
# ---------------------------------------------------------------------------

_PERM_B = 32
_PERM_MULT = 918703  # odd


@query(
    "q_permutation_test",
    oracle=f"""
WITH s AS (
  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS ia
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
obs AS (
  SELECT CAST(sum(CASE WHEN ia = 1 THEN v END) AS DOUBLE)
           / sum(CASE WHEN ia = 1 THEN 1 ELSE 0 END)
         - CAST(sum(CASE WHEN ia = 0 THEN v END) AS DOUBLE)
           / sum(CASE WHEN ia = 0 THEN 1 ELSE 0 END) AS d_obs
  FROM s
),
reps AS (
  SELECT b, v,
         CASE WHEN ((o_custkey % {_M}) * {_PERM_MULT} + b * 131) % {_M} % 2 = 0
              THEN 1 ELSE 0 END AS pl
  FROM s CROSS JOIN (SELECT unnest(range({_PERM_B})) AS b)
),
perm AS (
  SELECT b,
         CAST(sum(CASE WHEN pl = 1 THEN v END) AS DOUBLE)
           / sum(CASE WHEN pl = 1 THEN 1 ELSE 0 END)
         - CAST(sum(CASE WHEN pl = 0 THEN v END) AS DOUBLE)
           / sum(CASE WHEN pl = 0 THEN 1 ELSE 0 END) AS d_b
  FROM reps GROUP BY b
)
SELECT round(obs.d_obs, 6) AS d_obs,
       CAST({_PERM_B} AS BIGINT) AS n_perms,
       CAST(sum(CASE WHEN abs(perm.d_b) >= abs(obs.d_obs) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_ge,
       round(CAST(sum(CASE WHEN abs(perm.d_b) >= abs(obs.d_obs)
                           THEN 1 ELSE 0 END) AS DOUBLE) / {_PERM_B}, 6)
         AS p_value
FROM perm CROSS JOIN obs
GROUP BY obs.d_obs
""",
    tags=("stats", "permutation-test", "inference"),
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANDOMIZATION TEST for the segment mean-spend difference — the
    distribution-free p-value companion to q_ks_two_sample: 32
    deterministic label reassignments (hash-lattice coin flips per
    customer — the APPROXIMATE permutation test, binomial rather than
    exact-count labels, which is the standard distributed form), each
    replicate's mean difference from exact DECIMAL sums via one
    partial-aggregating groupBy(b), p = #(|d_b| ≥ |d_obs|)/B. The
    two-sided comparison happens on rounded doubles from exact sums —
    identical in both engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_custkey",
        dec(F.col("o_totalprice")).alias("v"),
        F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("ia"),
    )
    d_of = lambda flag: (  # noqa: E731
        F.sum(F.when(F.col(flag) == 1, F.col("v"))).cast("double")
        / F.sum(F.when(F.col(flag) == 1, 1).otherwise(0))
        - F.sum(F.when(F.col(flag) == 0, F.col("v"))).cast("double")
        / F.sum(F.when(F.col(flag) == 0, 1).otherwise(0))
    )
    obs = s.agg(d_of("ia").alias("d_obs"))
    reps = s.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_PERM_B - 1))).alias("b"),
        "o_custkey",
    ).select(
        "b",
        "v",
        F.when(
            (((F.col("o_custkey") % _M) * _PERM_MULT + F.col("b") * 131) % _M)
            % 2
            == 0,
            1,
        )
        .otherwise(0)
        .alias("pl"),
    )
    perm = reps.groupBy("b").agg(d_of("pl").alias("d_b"))
    return (
        perm.crossJoin(F.broadcast(obs))
        .agg(
            F.round(F.max("d_obs"), 6).alias("d_obs"),
            F.lit(_PERM_B).cast("long").alias("n_perms"),
            F.sum(
                F.when(F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_ge"),
        )
        .select(
            "d_obs",
            "n_perms",
            "n_ge",
            F.round(F.col("n_ge").cast("double") / _PERM_B, 6).alias("p_value"),
        )
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval
# ---------------------------------------------------------------------------


@query(
    "q_conformal_interval",
    oracle="""
WITH t AS (
  SELECT c.c_nationkey AS nk, o.o_orderkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS y,
         CASE WHEN ((o.o_orderkey % 1048576) * 633305 + 3) % 1048576 % 2 = 0
              THEN 'cal' ELSE 'test' END AS split
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
mdl AS (
  SELECT nk, CAST(sum(y) AS DOUBLE) / count(*) AS yhat
  FROM t WHERE split = 'cal' GROUP BY nk
),
res AS (
  SELECT abs(CAST(t.y AS DOUBLE) - mdl.yhat) AS r, t.o_orderkey
  FROM t JOIN mdl ON t.nk = mdl.nk WHERE t.split = 'cal'
),
rr AS (
  SELECT r, row_number() OVER (ORDER BY r, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM res
),
q AS (
  SELECT max(CASE WHEN rn = CAST(ceil(0.9 * (n + 1)) AS BIGINT) THEN r END)
           AS qhat,
         max(n) AS n_cal
  FROM rr
),
cov AS (
  SELECT CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(CAST(t.y AS DOUBLE) - mdl.yhat) <= q.qhat
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM t JOIN mdl ON t.nk = mdl.nk CROSS JOIN q
  WHERE t.split = 'test'
)
SELECT CAST(q.n_cal AS BIGINT) AS n_cal, round(q.qhat, 6) AS qhat,
       cov.n_test, cov.covered,
       round(CAST(cov.covered AS DOUBLE) / cov.n_test, 6) AS coverage
FROM q CROSS JOIN cov
""",
    tags=("stats", "conformal", "inference"),
)
def q_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVAL (Vovk; Lei et al. 2018) —
    the distribution-free uncertainty wrapper every production model
    ships with: a deterministic hash split into calibration/test, a
    per-nation group-mean model fit ON CALIBRATION, the ⌈0.9(n+1)⌉-th
    smallest absolute residual as the conformal radius q̂ (selected by
    row_number — an order statistic, not an interpolated quantile),
    and the measured test coverage (≥ ~90% by the conformal
    guarantee). Shapes: two broadcast model joins, one rank window on
    calibration residuals (q_gini_spend's quantile-binning swap
    applies at 100 TB)."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nk"),
        "o_orderkey",
        dec(F.col("o_totalprice")).alias("y"),
        F.when(
            (((F.col("o_orderkey") % 1048576) * 633305 + 3) % 1048576) % 2 == 0,
            "cal",
        )
        .otherwise("test")
        .alias("split"),
    )
    cal = t.filter(F.col("split") == "cal")
    mdl = cal.groupBy("nk").agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("yhat")
    )
    res = cal.join(F.broadcast(mdl), "nk").select(
        F.abs(F.col("y").cast("double") - F.col("yhat")).alias("r"),
        "o_orderkey",
    )
    rr = res.select(
        "r",
        F.row_number().over(W.orderBy("r", "o_orderkey")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("n"),
    )
    q = rr.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.9 * (F.col("n") + 1)).cast("long"),
                F.col("r"),
            )
        ).alias("qhat"),
        F.max("n").cast("long").alias("n_cal"),
    )
    cov = (
        t.filter(F.col("split") == "test")
        .join(F.broadcast(mdl), "nk")
        .crossJoin(F.broadcast(q))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("y").cast("double") - F.col("yhat"))
                    <= F.col("qhat"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
        )
    )
    return q.crossJoin(F.broadcast(cov)).select(
        "n_cal",
        F.round("qhat", 6).alias("qhat"),
        "n_test",
        "covered",
        F.round(F.col("covered").cast("double") / F.col("n_test"), 6).alias(
            "coverage"
        ),
    )


# ---------------------------------------------------------------------------
# Higher-moment profile (skewness / kurtosis)
# ---------------------------------------------------------------------------


@query(
    "q_skew_kurtosis",
    oracle="""
WITH t AS (
  SELECT c.c_mktsegment AS seg, CAST(o.o_totalprice AS DECIMAL(8,2)) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) AS s1,
         CAST(sum(CAST(x AS DECIMAL(19,2)) * x) AS DOUBLE) AS s2,
         CAST(sum(CAST(x AS DECIMAL(19,2)) * x * x) AS DOUBLE) AS s3,
         CAST(sum(CAST(CAST(x AS DECIMAL(19,2)) * x * x AS DECIMAL(24,6)) * x)
              AS DOUBLE) AS s4
  FROM t GROUP BY seg
)
SELECT seg AS c_mktsegment, n,
       round(s1 / n, 6) AS mean,
       round(sqrt((s2 - n * (s1/n) * (s1/n)) / (n - 1)), 6) AS std,
       round(((s3 - 3 * (s1/n) * s2 + 2 * n * (s1/n) * (s1/n) * (s1/n)) / n)
             / pow((s2 - n * (s1/n) * (s1/n)) / n, 1.5), 6) AS skewness,
       round(((s4 - 4 * (s1/n) * s3 + 6 * (s1/n) * (s1/n) * s2
               - 3 * n * (s1/n) * (s1/n) * (s1/n) * (s1/n)) / n)
             / pow((s2 - n * (s1/n) * (s1/n)) / n, 2) - 3.0, 6)
         AS excess_kurtosis
FROM m
ORDER BY c_mktsegment
""",
    tags=("stats", "moments", "profile"),
)
def q_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGHER-MOMENT COLUMN PROFILE — skewness and excess kurtosis per
    segment from RAW moment sums (Σx..Σx⁴), the one-pass mergeable
    form (Spark's own skewness()/kurtosis() stream doubles in
    partition order — nondeterministic last bits; these DECIMAL sums
    are exact and associative, the q_price_quantity_corr argument one
    moment higher). Precision ladder: x(9,2) ⇒ x²(19,4)→(29,6)→x⁴ at
    (38,8)·(9,0) — every product stays inside 38 digits in BOTH
    engines (the 4th power of a ≤1e7 price summed over ~1e6 rows uses
    ~1e30 of the 1e30 headroom at scale 8; at larger corpora drop the
    final scale, documented here, rather than let either engine
    saturate). Central moments assemble in double once per group."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    x = F.col("x")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").cast("decimal(8,2)").alias("x"),
    )
    xw = x.cast("decimal(19,2)")
    x2 = xw * x
    x3 = xw * x * x
    x4 = x3.cast("decimal(24,6)") * x
    m = t.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum(x3).cast("double").alias("s3"),
        F.sum(x4).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(k) for k in ("n", "s1", "s2", "s3", "s4"))
    mu = s1 / n
    var_n = (s2 - n * mu * mu) / n
    m3 = (s3 - 3 * mu * s2 + 2 * n * mu * mu * mu) / n
    m4 = (s4 - 4 * mu * s3 + 6 * mu * mu * s2 - 3 * n * mu * mu * mu * mu) / n
    return m.select(
        F.col("seg").alias("c_mktsegment"),
        "n",
        F.round(mu, 6).alias("mean"),
        F.round(F.sqrt((s2 - n * mu * mu) / (n - 1)), 6).alias("std"),
        F.round(m3 / F.pow(var_n, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(var_n, 2) - 3.0, 6).alias("excess_kurtosis"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Weighted median (quantity-weighted price)
# ---------------------------------------------------------------------------


@query(
    "q_weighted_median",
    oracle="""
WITH t AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice / l_quantity AS DECIMAL(18,6)) AS unit_price,
         CAST(l_quantity AS DECIMAL(18,2)) AS w
  FROM lineitem
),
g AS (
  SELECT flag, unit_price, CAST(sum(w) AS DECIMAL(28,2)) AS w
  FROM t GROUP BY flag, unit_price
),
r AS (
  SELECT flag, unit_price, w,
         sum(w) OVER (PARTITION BY flag ORDER BY unit_price) AS cw,
         sum(w) OVER (PARTITION BY flag) AS tw
  FROM g
),
m AS (
  SELECT flag, min(unit_price) AS wmedian
  FROM r WHERE cw * 2 >= tw GROUP BY flag
),
s AS (SELECT flag, CAST(max(tw) AS DOUBLE) AS total_weight FROM r GROUP BY flag)
SELECT m.flag AS l_returnflag, CAST(m.wmedian AS DOUBLE) AS wmedian,
       round(s.total_weight, 2) AS total_weight
FROM m JOIN s ON m.flag = s.flag
ORDER BY l_returnflag
""",
    tags=("stats", "weighted-median", "A5"),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MEDIAN unit price per return flag (weight = quantity)
    — the volume-weighted "typical price" a plain median misstates
    when cheap items ship in bulk: the smallest value whose cumulative
    weight reaches half the total. Weights and the cumulative
    comparison (2·cw ≥ tw) are exact DECIMALs — no division at all —
    over a value-grain groupBy then flag-keyed windows; the
    unit-price division itself is quantized to DECIMAL(18,6) so both
    engines group identical keys. At 100 TB the per-flag cumulative
    swaps for the q_ks_two_sample bucket-offset form."""
    li = _t(spark, sf_dir, "lineitem")
    t = li.select(
        F.col("l_returnflag").alias("flag"),
        (F.col("l_extendedprice") / F.col("l_quantity"))
        .cast("decimal(18,6)")
        .alias("unit_price"),
        F.col("l_quantity").cast("decimal(18,2)").alias("w"),
    )
    g = t.groupBy("flag", "unit_price").agg(
        F.sum("w").cast("decimal(28,2)").alias("w")
    )
    r = g.select(
        "flag",
        "unit_price",
        F.sum("w").over(W.partitionBy("flag").orderBy("unit_price")).alias("cw"),
        F.sum("w").over(W.partitionBy("flag")).alias("tw"),
    )
    m = (
        r.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("flag")
        .agg(F.min("unit_price").alias("wmedian"))
    )
    s = r.groupBy("flag").agg(F.max("tw").cast("double").alias("total_weight"))
    return (
        m.join(s, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("wmedian").cast("double").alias("wmedian"),
            F.round("total_weight", 2).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Cumulative uniques curve
# ---------------------------------------------------------------------------


@query(
    "q_cumulative_uniques",
    oracle="""
WITH f AS (
  SELECT user_id, min(CAST(date_trunc('day', ts) AS DATE)) AS first_day
  FROM events GROUP BY user_id
),
d AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
      FROM f GROUP BY first_day),
g AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events)
SELECT g.day, COALESCE(d.new_users, 0) AS new_users,
       CAST(sum(COALESCE(d.new_users, 0)) OVER (ORDER BY g.day) AS BIGINT)
         AS cumulative_users
FROM g LEFT JOIN d ON g.day = d.day
ORDER BY g.day
""",
    tags=("stats", "growth", "A5"),
)
def q_cumulative_uniques(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUMULATIVE UNIQUE USERS per day — the growth curve every
    dashboard opens with, computed the distributed way: running
    count-distinct is NOT decomposable, but first-seen attribution is
    — one user-grain min(day) aggregate, then a cumsum over the
    bounded DAY GRID (the only unpartitioned window, |days| rows).
    The streaming twin is stream_bitmap_dau (same first-epoch-wins
    algebra, maintained incrementally)."""
    e = _t(spark, sf_dir, "events")
    day = F.to_date(F.date_trunc("day", F.col("ts")))
    f = e.groupBy("user_id").agg(F.min(day).alias("first_day"))
    d = f.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("new_users")
    )
    g = e.select(day.alias("day")).distinct()
    return (
        g.join(d, "day", "left")
        .select("day", F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"))
        .select(
            "day",
            "new_users",
            F.sum("new_users").over(W.orderBy("day")).cast("long").alias(
                "cumulative_users"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "q_degree_assortativity",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
edges AS (
  SELECT DISTINCT a.pk AS src, b.pk AS dst
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY src),
ed AS (
  SELECT ds.d AS x, dd.d AS y
  FROM edges e JOIN deg ds ON e.src = ds.src JOIN deg dd ON e.dst = dd.src
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM ed
)
SELECT n AS n_directed_edges,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS assortativity
FROM m
""",
    tags=("graph", "assortativity", "stats"),
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman 2002) of the part co-purchase
    graph — Pearson correlation of endpoint degrees across edges:
    positive = hubs link hubs (a connectivity-risk signal for the
    recommendation graph the q_pagerank3/q_hits family ranks).
    Moment sums are exact BIGINTs (degrees are integers — no decimal
    needed), the closed form one double chain; the edge list is the
    order-blocked self-join (basket-size-bounded, the q_pagerank3
    argument), degree lookups are two broadcast joins."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a = li.select("ok", F.col("pk").alias("src"))
    b = li.select("ok", F.col("pk").alias("dst"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ds = deg.select(F.col("src").alias("s_"), F.col("d").alias("x"))
    dd = deg.select(F.col("src").alias("d_"), F.col("d").alias("y"))
    ed = (
        edges.join(F.broadcast(ds), edges.src == ds.s_)
        .join(F.broadcast(dd), edges.dst == dd.d_)
        .select("x", "y")
    )
    m = ed.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    n, sx, sy = F.col("n").cast("double"), F.col("sx").cast("double"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        F.col("n").alias("n_directed_edges"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * F.col("sx")) * F.sqrt(n * syy - sy.cast("double") * sy)),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Weight of evidence / information value
# ---------------------------------------------------------------------------


@query(
    "q_weight_of_evidence",
    oracle="""
WITH t AS (
  SELECT c.c_mktsegment AS bin,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT bin, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(1 - y) AS BIGINT) AS neg
  FROM t GROUP BY bin
),
tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tp,
               CAST(sum(neg) AS BIGINT) AS tn FROM g),
w AS (
  SELECT g.bin, g.pos, g.neg,
         ln((CAST(g.pos AS DOUBLE) / tot.tp)
            / (CAST(g.neg AS DOUBLE) / tot.tn)) AS woe,
         (CAST(g.pos AS DOUBLE) / tot.tp - CAST(g.neg AS DOUBLE) / tot.tn)
           * ln((CAST(g.pos AS DOUBLE) / tot.tp)
                / (CAST(g.neg AS DOUBLE) / tot.tn)) AS ivt
  FROM g CROSS JOIN tot
),
iv AS (
  SELECT CAST(sum(CAST(round(ivt, 12) AS DECIMAL(28,12))) AS DOUBLE) AS iv
  FROM w
)
SELECT w.bin AS c_mktsegment, w.pos, w.neg,
       round(w.woe, 6) AS woe, round(w.ivt, 6) AS iv_term,
       round(iv.iv, 6) AS iv_total
FROM w CROSS JOIN iv
ORDER BY c_mktsegment
""",
    tags=("stats", "woe", "feature-engineering"),
)
def q_weight_of_evidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHT OF EVIDENCE + INFORMATION VALUE of market segment
    against an urgent-order label — the credit-scoring encoder/
    strength pair next to q_mutual_information (WOE is the encoder a
    scorecard deploys; IV thresholds decide whether the feature ships:
    <0.02 useless, >0.5 suspicious). Exact integer bin counts, WOE/IV
    terms in double (the PSI ln precedent), the IV total folded as
    DECIMAL(28,12)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("bin"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = t.groupBy("bin").agg(
        F.sum("y").cast("long").alias("pos"),
        F.sum(1 - F.col("y")).cast("long").alias("neg"),
    )
    tot = g.agg(
        F.sum("pos").cast("long").alias("tp"),
        F.sum("neg").cast("long").alias("tn"),
    )
    pr = F.col("pos").cast("double") / F.col("tp")
    nr = F.col("neg").cast("double") / F.col("tn")
    w = g.crossJoin(F.broadcast(tot)).select(
        "bin",
        "pos",
        "neg",
        F.log(pr / nr).alias("woe"),
        ((pr - nr) * F.log(pr / nr)).alias("ivt"),
    )
    iv = w.agg(
        F.sum(F.round(F.col("ivt"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("iv")
    )
    return (
        w.crossJoin(F.broadcast(iv))
        .select(
            F.col("bin").alias("c_mktsegment"),
            "pos",
            "neg",
            F.round("woe", 6).alias("woe"),
            F.round("ivt", 6).alias("iv_term"),
            F.round("iv", 6).alias("iv_total"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Matched-model price index (Laspeyres / Paasche / Fisher)
# ---------------------------------------------------------------------------

_PI_BASE = "1995-01"
_PI_MONTHS = ("1995-02", "1995-03", "1995-04")


@query(
    "q_price_index",
    oracle=f"""
WITH pm AS (
  SELECT l_partkey AS pk,
         strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS spend,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS qty
  FROM lineitem
  WHERE strftime(date_trunc('month', l_shipdate), '%Y-%m')
          IN ('{_PI_BASE}', {", ".join(f"'{m}'" for m in _PI_MONTHS)})
  GROUP BY 1, 2
),
base AS (
  SELECT pk, CAST(spend AS DOUBLE) / CAST(qty AS DOUBLE) AS p0, qty AS q0
  FROM pm WHERE month = '{_PI_BASE}'
),
cur AS (
  SELECT pk, month, CAST(spend AS DOUBLE) / CAST(qty AS DOUBLE) AS pt,
         qty AS qt
  FROM pm WHERE month <> '{_PI_BASE}'
),
j AS (
  SELECT cur.month, base.pk, base.p0, cur.pt,
         CAST(base.q0 AS DOUBLE) AS q0, CAST(cur.qt AS DOUBLE) AS qt
  FROM cur JOIN base ON cur.pk = base.pk
),
agg AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_matched,
         CAST(sum(CAST(round(pt * q0, 6) AS DECIMAL(28,6))) AS DOUBLE) AS ptq0,
         CAST(sum(CAST(round(p0 * q0, 6) AS DECIMAL(28,6))) AS DOUBLE) AS p0q0,
         CAST(sum(CAST(round(pt * qt, 6) AS DECIMAL(28,6))) AS DOUBLE) AS ptqt,
         CAST(sum(CAST(round(p0 * qt, 6) AS DECIMAL(28,6))) AS DOUBLE) AS p0qt
  FROM j GROUP BY month
)
SELECT month, n_matched,
       round(ptq0 / p0q0, 6) AS laspeyres,
       round(ptqt / p0qt, 6) AS paasche,
       round(sqrt((ptq0 / p0q0) * (ptqt / p0qt)), 6) AS fisher
FROM agg ORDER BY month
""",
    tags=("stats", "price-index", "economics"),
)
def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCHED-MODEL PRICE INDEX — Laspeyres (base-basket), Paasche
    (current-basket) and Fisher (their geometric mean, the "ideal"
    index) for three months against a base month, over parts traded
    in BOTH periods (the matched-model rule every national CPI uses
    for comparability). Unit prices are exact-decimal spend/qty with
    one double divide; the Σp·q cross terms are rounded to 6 dp and
    folded as DECIMAL(28,6) so the index is association-order
    independent. One (part, month) aggregate; the month joins are
    part-keyed."""
    li = _t(spark, sf_dir, "lineitem")
    month = F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM")
    keep = [_PI_BASE, *_PI_MONTHS]
    pm = (
        li.filter(month.isin(keep))
        .groupBy(F.col("l_partkey").alias("pk"), month.alias("month"))
        .agg(
            F.sum(dec(F.col("l_extendedprice")))
            .cast("decimal(28,2)")
            .alias("spend"),
            F.sum(dec(F.col("l_quantity"))).cast("decimal(28,2)").alias("qty"),
        )
    )
    price = F.col("spend").cast("double") / F.col("qty").cast("double")
    base = pm.filter(F.col("month") == _PI_BASE).select(
        "pk", price.alias("p0"), F.col("qty").cast("double").alias("q0")
    )
    cur = pm.filter(F.col("month") != _PI_BASE).select(
        "pk", "month", price.alias("pt"), F.col("qty").cast("double").alias("qt")
    )
    j = cur.join(base, "pk")

    def fold(expr):
        return F.sum(F.round(expr, 6).cast("decimal(28,6)")).cast("double")

    agg = j.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        fold(F.col("pt") * F.col("q0")).alias("ptq0"),
        fold(F.col("p0") * F.col("q0")).alias("p0q0"),
        fold(F.col("pt") * F.col("qt")).alias("ptqt"),
        fold(F.col("p0") * F.col("qt")).alias("p0qt"),
    )
    lasp = F.col("ptq0") / F.col("p0q0")
    paas = F.col("ptqt") / F.col("p0qt")
    return agg.select(
        "month",
        "n_matched",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).orderBy("month")


# ---------------------------------------------------------------------------
# DAU/MAU stickiness
# ---------------------------------------------------------------------------


@query(
    "q_dau_mau_stickiness",
    oracle="""
WITH d AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month,
         CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
dau AS (
  SELECT month, day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM d GROUP BY month, day
),
mau AS (
  SELECT month, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
  FROM d GROUP BY month
),
a AS (
  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(dau) AS BIGINT) AS dau_sum
  FROM dau GROUP BY month
)
SELECT a.month, a.n_days, mau.mau,
       round(CAST(a.dau_sum AS DOUBLE) / a.n_days, 6) AS avg_dau,
       round(CAST(a.dau_sum AS DOUBLE) / a.n_days / mau.mau, 6) AS stickiness
FROM a JOIN mau ON a.month = mau.month
ORDER BY a.month
""",
    tags=("stats", "product-metrics", "stickiness"),
)
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU STICKINESS per month — the engagement ratio product
    teams track (how much of the monthly audience shows up on an
    average day). Two keyed distinct aggregates (day and month
    grain), exact integers, two divides; the approximate 100 TB twin
    keeps a maintained HLL per grain (stream_hll_distinct) instead of
    exact count-distincts."""
    e = _t(spark, sf_dir, "events")
    d = e.select(
        F.date_format(F.date_trunc("month", F.col("ts")), "yyyy-MM").alias(
            "month"
        ),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "user_id",
    )
    dau = d.groupBy("month", "day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    mau = d.groupBy("month").agg(
        F.countDistinct("user_id").cast("long").alias("mau")
    )
    a = dau.groupBy("month").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("dau").cast("long").alias("dau_sum"),
    )
    avg_dau = F.col("dau_sum").cast("double") / F.col("n_days")
    return (
        a.join(F.broadcast(mau), "month")
        .select(
            "month",
            "n_days",
            "mau",
            F.round(avg_dau, 6).alias("avg_dau"),
            F.round(avg_dau / F.col("mau"), 6).alias("stickiness"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------


@query(
    "q_welch_ttest",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) AS sx,
         CAST(sum(CAST(v AS DECIMAL(19,2)) * v) AS DOUBLE) AS sxx
  FROM s GROUP BY seg
),
w AS (
  SELECT max(CASE WHEN seg = 'BUILDING' THEN n END) AS n1,
         max(CASE WHEN seg = 'BUILDING' THEN sx END) AS sx1,
         max(CASE WHEN seg = 'BUILDING' THEN sxx END) AS sxx1,
         max(CASE WHEN seg = 'MACHINERY' THEN n END) AS n2,
         max(CASE WHEN seg = 'MACHINERY' THEN sx END) AS sx2,
         max(CASE WHEN seg = 'MACHINERY' THEN sxx END) AS sxx2
  FROM m
),
f AS (
  SELECT n1, n2,
         sx1 / n1 AS m1, sx2 / n2 AS m2,
         (sxx1 - n1 * (sx1/n1) * (sx1/n1)) / (n1 - 1) / n1 AS a,
         (sxx2 - n2 * (sx2/n2) * (sx2/n2)) / (n2 - 1) / n2 AS b
  FROM w
)
SELECT n1, n2,
       round(m1, 6) AS mean_1, round(m2, 6) AS mean_2,
       round((m1 - m2) / sqrt(a + b), 6) AS t_stat,
       round((a + b) * (a + b)
             / (a * a / (n1 - 1) + b * b / (n2 - 1)), 6) AS welch_df
FROM f
""",
    tags=("stats", "t-test", "inference"),
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST on segment mean order totals —
    the parametric member of the two-sample trio (KS = distribution,
    permutation = distribution-free p, Welch = means under unequal
    variances, the default t-test since Ruxton 2006). Exact DECIMAL
    moments ((19,2)-widened products), the t statistic and the
    Welch–Satterthwaite df one shared double chain."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), dec(F.col("o_totalprice")).alias("v")
    )
    m = s.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum(F.col("v").cast("decimal(19,2)") * F.col("v"))
        .cast("double")
        .alias("sxx"),
    )

    def pick(seg, col):
        return F.max(F.when(F.col("seg") == seg, F.col(col)))

    w = m.agg(
        pick("BUILDING", "n").alias("n1"),
        pick("BUILDING", "sx").alias("sx1"),
        pick("BUILDING", "sxx").alias("sxx1"),
        pick("MACHINERY", "n").alias("n2"),
        pick("MACHINERY", "sx").alias("sx2"),
        pick("MACHINERY", "sxx").alias("sxx2"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    m1, m2 = F.col("sx1") / n1, F.col("sx2") / n2
    a = (F.col("sxx1") - n1 * m1 * m1) / (n1 - 1) / n1
    b = (F.col("sxx2") - n2 * m2 * m2) / (n2 - 1) / n2
    return w.select(
        "n1",
        "n2",
        F.round(m1, 6).alias("mean_1"),
        F.round(m2, 6).alias("mean_2"),
        F.round((m1 - m2) / F.sqrt(a + b), 6).alias("t_stat"),
        F.round(
            (a + b) * (a + b) / (a * a / (n1 - 1) + b * b / (n2 - 1)), 6
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve deciles
# ---------------------------------------------------------------------------


@query(
    "q_lorenz_deciles",
    oracle="""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS spend
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT spend,
         ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
  FROM s
),
d AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(spend) AS DECIMAL(28,2)) AS spend
  FROM r GROUP BY decile
),
t AS (SELECT CAST(sum(spend) AS DOUBLE) AS tot FROM d)
SELECT CAST(d.decile AS BIGINT) AS decile, d.n_customers,
       round(CAST(d.spend AS DOUBLE), 2) AS decile_spend,
       round(CAST(sum(d.spend) OVER (ORDER BY d.decile) AS DOUBLE) / t.tot, 6)
         AS cum_share
FROM d CROSS JOIN t
ORDER BY decile
""",
    tags=("stats", "lorenz", "concentration"),
)
def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE at customer-spend deciles — the curve behind
    q_gini_spend's scalar (cum_share at decile 9 vs 10 is the "top
    10% hold X%" headline). Deciles via ntile with a deterministic
    (spend, custkey) order; decile sums exact DECIMAL; the cumulative
    runs over TEN rows. The customer rank window swaps for
    quantile-cut binning at 100 TB exactly as documented in
    q_gini_spend."""
    o = _t(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(dec(F.col("o_totalprice"))).cast("decimal(28,2)").alias("spend")
    )
    r = s.select(
        "spend",
        F.ntile(10).over(W.orderBy("spend", "o_custkey")).alias("decile"),
    )
    d = r.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("spend").cast("decimal(28,2)").alias("spend"),
    )
    t = d.agg(F.sum("spend").cast("double").alias("tot"))
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_customers",
            F.round(F.col("spend").cast("double"), 2).alias("decile_spend"),
            F.round(
                F.sum("spend").over(W.orderBy("decile")).cast("double")
                / F.col("tot"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F statistic
# ---------------------------------------------------------------------------


@query(
    "q_anova_f",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) AS sx,
         CAST(sum(CAST(v AS DECIMAL(19,2)) * v) AS DOUBLE) AS sxx
  FROM s GROUP BY seg
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n) AS BIGINT) AS nt,
         CAST(sum(CAST(round(sx, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sxt,
         CAST(sum(CAST(round(sxx, 2) AS DECIMAL(38,2))) AS DOUBLE) AS sxxt,
         CAST(sum(CAST(round(sx * sx / n, 4) AS DECIMAL(38,4))) AS DOUBLE)
           AS ssb_raw
  FROM g
)
SELECT k AS n_groups, nt AS n_total,
       round((ssb_raw - sxt * sxt / nt) / (k - 1), 4) AS ms_between,
       round((sxxt - ssb_raw) / (nt - k), 4) AS ms_within,
       round(((ssb_raw - sxt * sxt / nt) / (k - 1))
             / ((sxxt - ssb_raw) / (nt - k)), 6) AS f_stat
FROM t
""",
    tags=("stats", "anova", "inference"),
)
def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA F across the five market segments' order totals —
    does ANY segment differ (the k-group generalization of
    q_welch_ttest): F = MS_between / MS_within from per-group exact
    DECIMAL moments. Every cross-group fold (Σsx, Σsxx, Σ sx²/n over
    the k=5 group rows) re-rounds to DECIMAL before summing, so no
    float sum anywhere depends on aggregation order."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), dec(F.col("o_totalprice")).alias("v")
    )
    g = s.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("double").alias("sx"),
        F.sum(F.col("v").cast("decimal(19,2)") * F.col("v"))
        .cast("double")
        .alias("sxx"),
    )
    t = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.round(F.col("sx"), 2).cast("decimal(28,2)"))
        .cast("double")
        .alias("sxt"),
        F.sum(F.round(F.col("sxx"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("sxxt"),
        F.sum(
            F.round(F.col("sx") * F.col("sx") / F.col("n"), 4).cast(
                "decimal(38,4)"
            )
        )
        .cast("double")
        .alias("ssb_raw"),
    )
    k, nt = F.col("k"), F.col("nt")
    ssb = F.col("ssb_raw") - F.col("sxt") * F.col("sxt") / nt
    ssw = F.col("sxxt") - F.col("ssb_raw")
    return t.select(
        k.alias("n_groups"),
        nt.alias("n_total"),
        F.round(ssb / (k - 1), 4).alias("ms_between"),
        F.round(ssw / (nt - k), 4).alias("ms_within"),
        F.round((ssb / (k - 1)) / (ssw / (nt - k)), 6).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Difference-in-differences
# ---------------------------------------------------------------------------

_DID_SPLIT = "1995-07-01"
_DID_NATION = 0


@query(
    "q_diff_in_diff",
    oracle=f"""
WITH t AS (
  SELECT CASE WHEN c.c_nationkey = {_DID_NATION} THEN 'T' ELSE 'C' END AS grp,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_DID_SPLIT}'
              THEN 'pre' ELSE 'post' END AS period,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT grp, period, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) / count(*) AS mean_v
  FROM t GROUP BY grp, period
),
w AS (
  SELECT max(CASE WHEN grp = 'T' AND period = 'pre' THEN mean_v END) AS t_pre,
         max(CASE WHEN grp = 'T' AND period = 'post' THEN mean_v END) AS t_post,
         max(CASE WHEN grp = 'C' AND period = 'pre' THEN mean_v END) AS c_pre,
         max(CASE WHEN grp = 'C' AND period = 'post' THEN mean_v END) AS c_post,
         CAST(sum(n) AS BIGINT) AS n_total
  FROM m
)
SELECT n_total,
       round(t_pre, 6) AS t_pre, round(t_post, 6) AS t_post,
       round(c_pre, 6) AS c_pre, round(c_post, 6) AS c_post,
       round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate
FROM w
""",
    tags=("stats", "causal", "diff-in-diff"),
)
def q_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the workhorse causal estimate for
    a treatment applied to one group at a known date (nation 0,
    mid-1995): (ΔT) − (ΔC) of mean order totals nets out both the
    group level and the common time trend. One 4-cell aggregate from
    exact DECIMAL sums, one shared double chain — the inference
    sibling of q_psi_drift's same-date split."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.when(F.col("c_nationkey") == _DID_NATION, "T").otherwise("C").alias(
            "grp"
        ),
        F.when(
            F.col("o_orderdate") < F.lit(_DID_SPLIT).cast("timestamp"), "pre"
        )
        .otherwise("post")
        .alias("period"),
        dec(F.col("o_totalprice")).alias("v"),
    )
    m = t.groupBy("grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_v"),
    )

    def cell(g, p):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_v"))
        )

    w = m.agg(
        cell("T", "pre").alias("t_pre"),
        cell("T", "post").alias("t_post"),
        cell("C", "pre").alias("c_pre"),
        cell("C", "post").alias("c_post"),
        F.sum("n").cast("long").alias("n_total"),
    )
    return w.select(
        "n_total",
        F.round("t_pre", 6).alias("t_pre"),
        F.round("t_post", 6).alias("t_post"),
        F.round("c_pre", 6).alias("c_pre"),
        F.round("c_post", 6).alias("c_post"),
        F.round(
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre")),
            6,
        ).alias("did_estimate"),
    )


# ---------------------------------------------------------------------------
# Overdispersion diagnostic
# ---------------------------------------------------------------------------


@query(
    "q_overdispersion",
    oracle="""
WITH k AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         CAST(count(*) AS BIGINT) AS k
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, o.o_custkey
),
m AS (
  SELECT seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(k) AS BIGINT) AS sk,
         CAST(sum(k * k) AS BIGINT) AS skk
  FROM k GROUP BY seg
)
SELECT seg AS c_mktsegment, n,
       round(CAST(sk AS DOUBLE) / n, 6) AS mean_orders,
       round((skk - CAST(n AS DOUBLE) * (CAST(sk AS DOUBLE)/n)
              * (CAST(sk AS DOUBLE)/n)) / (n - 1), 6) AS var_orders,
       round(((skk - CAST(n AS DOUBLE) * (CAST(sk AS DOUBLE)/n)
               * (CAST(sk AS DOUBLE)/n)) / (n - 1))
             / (CAST(sk AS DOUBLE) / n), 6) AS dispersion,
       CASE WHEN ((skk - CAST(n AS DOUBLE) * (CAST(sk AS DOUBLE)/n)
                   * (CAST(sk AS DOUBLE)/n)) / (n - 1))
                 / (CAST(sk AS DOUBLE) / n) > 1.5
            THEN 'overdispersed' ELSE 'poisson-like' END AS verdict
FROM m ORDER BY c_mktsegment
""",
    tags=("stats", "overdispersion", "count-models"),
)
def q_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OVERDISPERSION DIAGNOSTIC on per-customer order counts — the
    variance/mean ratio that decides Poisson vs negative-binomial for
    any count model (demand, events, failures); the customer-grain
    companion to text_burstiness' per-term VMR. Counts are exact
    BIGINTs (k² stays integer), the ratio one shared double chain."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    k = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    m = k.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("k").cast("long").alias("sk"),
        F.sum(F.col("k") * F.col("k")).cast("long").alias("skk"),
    )
    mean = F.col("sk").cast("double") / F.col("n")
    var = (F.col("skk") - F.col("n").cast("double") * mean * mean) / (
        F.col("n") - 1
    )
    disp = var / mean
    return m.select(
        F.col("seg").alias("c_mktsegment"),
        "n",
        F.round(mean, 6).alias("mean_orders"),
        F.round(var, 6).alias("var_orders"),
        F.round(disp, 6).alias("dispersion"),
        F.when(disp > 1.5, "overdispersed")
        .otherwise("poisson-like")
        .alias("verdict"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Heterogeneous treatment effects (DiD per segment)
# ---------------------------------------------------------------------------


@query(
    "q_uplift_by_segment",
    oracle=f"""
WITH t AS (
  SELECT c.c_mktsegment AS seg,
         CASE WHEN c.c_nationkey = {_DID_NATION} THEN 'T' ELSE 'C' END AS grp,
         CASE WHEN o.o_orderdate < TIMESTAMP '{_DID_SPLIT}'
              THEN 'pre' ELSE 'post' END AS period,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
m AS (
  SELECT seg, grp, period, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS DOUBLE) / count(*) AS mean_v
  FROM t GROUP BY seg, grp, period
),
w AS (
  SELECT seg,
         max(CASE WHEN grp='T' AND period='pre' THEN mean_v END) AS t_pre,
         max(CASE WHEN grp='T' AND period='post' THEN mean_v END) AS t_post,
         max(CASE WHEN grp='C' AND period='pre' THEN mean_v END) AS c_pre,
         max(CASE WHEN grp='C' AND period='post' THEN mean_v END) AS c_post,
         CAST(sum(CASE WHEN grp='T' THEN n ELSE 0 END) AS BIGINT) AS n_treated
  FROM m GROUP BY seg
)
SELECT seg AS c_mktsegment, n_treated,
       round((t_post - t_pre) - (c_post - c_pre), 6) AS did_estimate
FROM w
WHERE t_pre IS NOT NULL AND t_post IS NOT NULL
ORDER BY c_mktsegment
""",
    tags=("stats", "causal", "uplift"),
)
def q_uplift_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HETEROGENEOUS TREATMENT EFFECTS — q_diff_in_diff estimated per
    market segment: WHO responded, the question after the average
    effect (targeting ships on this split). Same 4-cell decimal-exact
    estimator, keyed one level deeper; segments without both
    treatment cells drop (stated in the oracle)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    t = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.when(F.col("c_nationkey") == _DID_NATION, "T").otherwise("C").alias(
            "grp"
        ),
        F.when(
            F.col("o_orderdate") < F.lit(_DID_SPLIT).cast("timestamp"), "pre"
        )
        .otherwise("post")
        .alias("period"),
        dec(F.col("o_totalprice")).alias("v"),
    )
    m = t.groupBy("seg", "grp", "period").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_v"),
    )

    def cell(g, p):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_v"))
        )

    w = m.groupBy("seg").agg(
        cell("T", "pre").alias("t_pre"),
        cell("T", "post").alias("t_post"),
        cell("C", "pre").alias("c_pre"),
        cell("C", "post").alias("c_post"),
        F.sum(F.when(F.col("grp") == "T", F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_treated"),
    )
    return (
        w.filter(F.col("t_pre").isNotNull() & F.col("t_post").isNotNull())
        .select(
            F.col("seg").alias("c_mktsegment"),
            "n_treated",
            F.round(
                (F.col("t_post") - F.col("t_pre"))
                - (F.col("c_post") - F.col("c_pre")),
                6,
            ).alias("did_estimate"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Kruskal–Wallis rank test (k-sample, tie-corrected)
# ---------------------------------------------------------------------------

_KW_BUCKET = 8192  # price-domain rank buckets (same recipe as the KS CDF)


@query(
    "q_kruskal_wallis",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg, CAST(o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cnt AS (
  SELECT v, CAST(count(*) AS BIGINT) AS t FROM s GROUP BY v
),
cum AS (
  SELECT v, t, CAST(sum(t) OVER (ORDER BY v) AS BIGINT) AS cm FROM cnt
),
rn AS (
  SELECT v, t, 2 * (cm - t) + t + 1 AS rn2 FROM cum
),
g AS (
  SELECT s.seg, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(CAST(1 AS BIGINT) * rn.rn2 AS DECIMAL(28,0)))
              AS DECIMAL(38,0)) AS num
  FROM s JOIN rn ON s.v = rn.v GROUP BY s.seg
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(CAST(round(
             (CAST(num AS DOUBLE) / 2) * (CAST(num AS DOUBLE) / 2) / n, 6)
           AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS ssum
  FROM g
),
ties AS (
  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tsum FROM cnt
),
h AS (
  SELECT tot.nn, ties.tsum,
         12.0 * CAST(tot.ssum AS DOUBLE)
           / (CAST(tot.nn AS DOUBLE) * (tot.nn + 1)) - 3.0 * (tot.nn + 1)
           AS h_raw,
         1.0 - CAST(ties.tsum AS DOUBLE)
           / (CAST(tot.nn AS DOUBLE) * CAST(tot.nn AS DOUBLE)
              * CAST(tot.nn AS DOUBLE) - CAST(tot.nn AS DOUBLE)) AS c_tie
  FROM tot CROSS JOIN ties
)
SELECT g.seg, g.n,
       round(CAST(g.num AS DOUBLE) / 2 / g.n, 6) AS mean_rank,
       round(h.h_raw, 6) AS h_stat,
       round(h.h_raw / h.c_tie, 6) AS h_adj
FROM g CROSS JOIN h
ORDER BY g.seg
""",
    tags=("stats", "kruskal-wallis", "inference", "rank"),
)
def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL–WALLIS H across all five market segments' order totals
    — the k-sample generalization of the rank-based two-sample tests
    (q_ks_two_sample = two-sample distribution, q_welch_ttest =
    two-sample means; this is the one-way-ANOVA-without-normality
    member, with q_anova_f as its parametric twin).

    Exactness: tie-averaged ranks never materialize as fractions —
    the DOUBLED rank numerator rn2(v) = 2·cum_before + t + 1 is an
    exact BIGINT per distinct value, per-group rank sums are exact
    DECIMAL folds of c·rn2, and the per-group H terms are rounded to
    DECIMAL(38,6) before the ≤5-row cross-group sum (the 5-row double
    fold is association-order sensitive — the r10e lesson). Tie
    correction Σ(t³−t)/(N³−N) with t³ as BIGINT (fixture tie runs are
    tiny; the 100 TB form would widen to DECIMAL).

    Scale shape: ranking is the KS two-level distributed prefix sum —
    groupBy distinct value, bucket-local running counts, ~61 bucket
    totals through the one global window — so no input-sized
    single-partition sort anywhere."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), dec(F.col("o_totalprice")).alias("v")
    )
    cnt = s.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("t"))
    b = cnt.withColumn("bkt", F.floor(F.col("v") / _KW_BUCKET).cast("long"))
    loc = b.select(
        "bkt",
        "v",
        "t",
        F.sum("t").over(W.partitionBy("bkt").orderBy("v")).alias("lc"),
    )
    btot = b.groupBy("bkt").agg(F.sum("t").alias("bt"))
    off = btot.select(
        "bkt",
        F.coalesce(
            F.sum("bt").over(W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off"),
    )
    rn = loc.join(F.broadcast(off), "bkt").select(
        "v",
        "t",
        (2 * (F.col("off") + F.col("lc") - F.col("t")) + F.col("t") + 1)
        .cast("long")
        .alias("rn2"),
    )
    g = (
        s.join(rn, "v")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("rn2").cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("num"),
        )
    )
    half = F.col("num").cast("double") / 2
    tot = g.agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum(F.round(half * half / F.col("n"), 6).cast("decimal(38,6)"))
        .cast("decimal(38,6)")
        .alias("ssum"),
    )
    ties = cnt.agg(
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tsum")
    )
    nn_d = F.col("nn").cast("double")
    h = tot.crossJoin(F.broadcast(ties)).select(
        "nn",
        (
            F.lit(12.0) * F.col("ssum").cast("double") / (nn_d * (F.col("nn") + 1))
            - F.lit(3.0) * (F.col("nn") + 1)
        ).alias("h_raw"),
        (F.lit(1.0) - F.col("tsum").cast("double") / (nn_d * nn_d * nn_d - nn_d)).alias(
            "c_tie"
        ),
    )
    return (
        g.crossJoin(F.broadcast(h))
        .select(
            "seg",
            "n",
            F.round(F.col("num").cast("double") / 2 / F.col("n"), 6).alias(
                "mean_rank"
            ),
            F.round(F.col("h_raw"), 6).alias("h_stat"),
            F.round(F.col("h_raw") / F.col("c_tie"), 6).alias("h_adj"),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-averaged ranks, exact moments)
# ---------------------------------------------------------------------------

_SP_BUCKET = 2048  # extendedprice-domain rank buckets (two-level prefix)


@query(
    "q_spearman_corr",
    oracle="""
WITH s AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DECIMAL(18,2)) AS qv,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS pv
  FROM lineitem
),
qc AS (SELECT qv, CAST(count(*) AS BIGINT) AS t FROM s GROUP BY qv),
qr AS (
  SELECT qv, t,
         2 * (CAST(sum(t) OVER (ORDER BY qv) AS BIGINT) - t) + t + 1 AS rnx
  FROM qc
),
pc AS (SELECT pv, CAST(count(*) AS BIGINT) AS t FROM s GROUP BY pv),
pr AS (
  SELECT pv, t,
         2 * (CAST(sum(t) OVER (ORDER BY pv) AS BIGINT) - t) + t + 1 AS rny
  FROM pc
),
mo AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(qr.rnx * pr.rny AS DECIMAL(28,0))) AS DECIMAL(38,0))
           AS sxy
  FROM s JOIN qr ON s.qv = qr.qv JOIN pr ON s.pv = pr.pv
),
mx AS (
  SELECT CAST(sum(CAST(t * rnx * rnx AS DECIMAL(28,0))) AS DECIMAL(38,0))
           AS sxx
  FROM qr
),
my AS (
  SELECT CAST(sum(CAST(t * rny * rny AS DECIMAL(28,0))) AS DECIMAL(38,0))
           AS syy
  FROM pr
),
f AS (
  SELECT n,
         CAST(sxy AS DOUBLE)
           - CAST(n AS DOUBLE) * (n + 1) * (n + 1) AS a,
         CAST(sxx AS DOUBLE)
           - CAST(n AS DOUBLE) * (n + 1) * (n + 1) AS bx,
         CAST(syy AS DOUBLE)
           - CAST(n AS DOUBLE) * (n + 1) * (n + 1) AS by
  FROM mo CROSS JOIN mx CROSS JOIN my
)
SELECT n, round(a / sqrt(bx * by), 6) + 0.0 AS spearman_rho
FROM f
""",
    tags=("stats", "spearman", "rank", "correlation"),
)
def q_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION between lineitem quantity and
    extended price — the monotone-association companion to
    q_price_quantity_corr's Pearson (rank transform makes it robust
    to the price column's heavy right tail). ρ = Pearson on
    tie-averaged ranks, computed without ever materializing a
    fractional rank: the DOUBLED rank rn(v) = 2·cum_before + t + 1 is
    an exact BIGINT per distinct value, so Σ rnx·rny, Σ t·rn² are
    exact DECIMAL folds; with S'xy = Σ rnx·rny = 4Σ RxRy the doubled
    lattice gives ρ = (S'xy − N(N+1)²) / √((S'xx − N(N+1)²)(S'yy −
    N(N+1)²)) — every N(N+1)²/4 mean term scales by the same 4 — as
    one final double chain
    (Σ rank = N(N+1)/2 holds under tie-averaging, so the mean term is
    the closed form, not a measured sum).

    Scale shape: each variable's rank map is a groupBy-distinct-value
    frame joined back to the fact rows by value — two input-sized
    shuffles, no row-level global sort. The quantity domain is 50
    values (broadcast); the price cum-sum uses the same two-level
    prefix recipe as q_ks_two_sample in the Spark plan (the oracle's
    single global window is the ANSI twin)."""
    s = _t(spark, sf_dir, "lineitem").select(
        dec(F.col("l_quantity")).alias("qv"),
        dec(F.col("l_extendedprice")).alias("pv"),
    )

    def rank_map(col: str, alias: str, bucket: int) -> DataFrame:
        cnt = s.groupBy(col).agg(F.count(F.lit(1)).cast("long").alias("t"))
        b = cnt.withColumn("bkt", F.floor(F.col(col) / bucket).cast("long"))
        loc = b.select(
            "bkt",
            col,
            "t",
            F.sum("t").over(W.partitionBy("bkt").orderBy(col)).alias("lc"),
        )
        off = (
            b.groupBy("bkt")
            .agg(F.sum("t").alias("bt"))
            .select(
                "bkt",
                F.coalesce(
                    F.sum("bt").over(
                        W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ).alias("off"),
            )
        )
        return loc.join(F.broadcast(off), "bkt").select(
            col,
            "t",
            (2 * (F.col("off") + F.col("lc") - F.col("t")) + F.col("t") + 1)
            .cast("long")
            .alias(alias),
        )

    qr = rank_map("qv", "rnx", 64)
    pr = rank_map("pv", "rny", _SP_BUCKET)
    mo = (
        s.join(F.broadcast(qr.drop("t")), "qv")
        .join(pr.drop("t"), "pv")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("rnx") * F.col("rny")).cast("decimal(28,0)"))
            .cast("decimal(38,0)")
            .alias("sxy"),
        )
    )
    mx = qr.agg(
        F.sum((F.col("t") * F.col("rnx") * F.col("rnx")).cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .alias("sxx")
    )
    my = pr.agg(
        F.sum((F.col("t") * F.col("rny") * F.col("rny")).cast("decimal(28,0)"))
        .cast("decimal(38,0)")
        .alias("syy")
    )
    n_d = F.col("n").cast("double")
    mean_term = n_d * (F.col("n") + 1) * (F.col("n") + 1)
    f = (
        mo.crossJoin(F.broadcast(mx))
        .crossJoin(F.broadcast(my))
        .select(
            "n",
            (F.col("sxy").cast("double") - mean_term).alias("a"),
            (F.col("sxx").cast("double") - mean_term).alias("bx"),
            (F.col("syy").cast("double") - mean_term).alias("by"),
        )
    )
    return f.select(
        "n",
        (F.round(F.col("a") / F.sqrt(F.col("bx") * F.col("by")), 6) + 0.0).alias(
            "spearman_rho"
        ),
    )


# ---------------------------------------------------------------------------
# Hodges–Lehmann two-sample location shift (median of pairwise diffs)
# ---------------------------------------------------------------------------


@query(
    "q_hodges_lehmann",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg,
         strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
m AS (
  SELECT seg, month,
         CAST(round(CAST(sum(v) AS DOUBLE) / count(*), 6)
              AS DECIMAL(18,6)) AS mv
  FROM s GROUP BY seg, month
),
p AS (
  SELECT a.month AS ma, b.month AS mb,
         CAST(a.mv - b.mv AS DECIMAL(19,6)) AS d
  FROM (SELECT month, mv FROM m WHERE seg = 'BUILDING') a
  CROSS JOIN (SELECT month, mv FROM m WHERE seg = 'MACHINERY') b
),
r AS (
  SELECT d, row_number() OVER (ORDER BY d, ma, mb) AS rn,
         count(*) OVER () AS np
  FROM p
),
med AS (
  SELECT CAST(max(np) AS BIGINT) AS n_pairs,
         max(CASE WHEN rn = (np + 1) // 2 THEN d END) AS lo,
         max(CASE WHEN rn = np // 2 + 1 THEN d END) AS hi
  FROM r
),
cnts AS (
  SELECT CAST(count(DISTINCT CASE WHEN seg = 'BUILDING' THEN month END)
              AS BIGINT) AS n_a,
         CAST(count(DISTINCT CASE WHEN seg = 'MACHINERY' THEN month END)
              AS BIGINT) AS n_b
  FROM m
)
SELECT cnts.n_a, cnts.n_b, med.n_pairs,
       round((CAST(med.lo AS DOUBLE) + CAST(med.hi AS DOUBLE)) / 2, 6)
         AS hl_shift
FROM med CROSS JOIN cnts
""",
    tags=("stats", "hodges-lehmann", "robust", "inference"),
)
def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HODGES–LEHMANN location-shift estimate between two segments'
    monthly mean order totals — the robust effect-size companion to
    q_welch_ttest's mean difference (median of all pairwise
    differences; 29% breakdown point vs 0% for the mean, the
    estimator behind the Wilcoxon–Mann–Whitney interval).

    Scale shape: the raw-row pair space is quadratic (n_a·n_b), so the
    estimator is computed at the MONTHLY grain — the series length is
    set by the date DOMAIN (~80 months at every SF), so the cross join
    is domain-bounded (~6.4k pairs) and both sides broadcast; the
    input-sized work is the two exact groupBy aggregations. This
    grain-first-then-quadratic-statistic shape is the same argument as
    q_interval_overlap_binned's month binning.

    Exactness: monthly means are exact DECIMAL sums with one rounded
    double divide, re-cast to DECIMAL(18,6) so pairwise differences
    and their ordering are exact; the median picks order statistics
    ⌊(n+1)/2⌋ and ⌊n/2⌋+1 with deterministic (d, month, month)
    tie-breaks, and the even-count average is the one final double
    op."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month"),
        dec(F.col("o_totalprice")).alias("v"),
    )
    m = s.groupBy("seg", "month").agg(
        F.round(F.sum("v").cast("double") / F.count(F.lit(1)), 6)
        .cast("decimal(18,6)")
        .alias("mv")
    )
    a = m.filter(F.col("seg") == "BUILDING").select(
        F.col("month").alias("ma"), F.col("mv").alias("va")
    )
    b = m.filter(F.col("seg") == "MACHINERY").select(
        F.col("month").alias("mb"), F.col("mv").alias("vb")
    )
    p = a.crossJoin(F.broadcast(b)).select(
        "ma", "mb", (F.col("va") - F.col("vb")).cast("decimal(19,6)").alias("d")
    )
    r = p.select(
        "d",
        F.row_number().over(W.orderBy("d", "ma", "mb")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("np"),
    )
    med = r.agg(
        F.max("np").cast("long").alias("n_pairs"),
        F.max(
            F.when(F.col("rn") == F.floor((F.col("np") + 1) / 2), F.col("d"))
        ).alias("lo"),
        F.max(
            F.when(F.col("rn") == F.floor(F.col("np") / 2) + 1, F.col("d"))
        ).alias("hi"),
    )
    cnts = m.agg(
        F.countDistinct(F.when(F.col("seg") == "BUILDING", F.col("month")))
        .cast("long")
        .alias("n_a"),
        F.countDistinct(F.when(F.col("seg") == "MACHINERY", F.col("month")))
        .cast("long")
        .alias("n_b"),
    )
    return med.crossJoin(F.broadcast(cnts)).select(
        "n_a",
        "n_b",
        "n_pairs",
        F.round(
            (F.col("lo").cast("double") + F.col("hi").cast("double")) / 2, 6
        ).alias("hl_shift"),
    )


# ---------------------------------------------------------------------------
# Benjamini–Hochberg FDR over per-nation permutation p-values
# ---------------------------------------------------------------------------

_BH_B = 64  # permutation replicates (p granularity 1/65)
_BH_GROUPS = 25  # nationkey domain 0..24
_BH_ALPHA_NUM, _BH_ALPHA_DEN = 1, 10  # alpha = 0.10, exact rational


@query(
    "q_fdr_bh",
    oracle=f"""
WITH s AS (
  SELECT c.c_nationkey AS nk, o.o_custkey,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS v
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(v) AS DECIMAL(38,2)) AS s_all
  FROM s
),
obs AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n_i,
         CAST(sum(v) AS DECIMAL(38,2)) AS s_i
  FROM s GROUP BY nk
),
dob AS (
  SELECT o.nk,
         CAST(o.s_i AS DOUBLE) / o.n_i
         - CAST(t.s_all - o.s_i AS DOUBLE) / (t.n_all - o.n_i) AS d_obs
  FROM obs o CROSS JOIN tot t
),
reps AS (
  SELECT b, v,
         CAST(((o_custkey % {_M}) * {_PERM_MULT} + b * 131) % {_M}
              % {_BH_GROUPS} AS BIGINT) AS pg
  FROM s CROSS JOIN (SELECT unnest(range({_BH_B})) AS b)
),
rg AS (
  SELECT b, pg, CAST(count(*) AS BIGINT) AS n_b,
         CAST(sum(v) AS DECIMAL(38,2)) AS s_b
  FROM reps GROUP BY b, pg
),
dnull AS (
  SELECT rg.pg AS nk, rg.b,
         CAST(rg.s_b AS DOUBLE) / rg.n_b
         - CAST(t.s_all - rg.s_b AS DOUBLE) / (t.n_all - rg.n_b) AS d_b
  FROM rg CROSS JOIN tot t
),
pv AS (
  SELECT d.nk, d.d_obs,
         CAST(1 + sum(CASE WHEN abs(nu.d_b) >= abs(d.d_obs) THEN 1 ELSE 0 END)
              AS BIGINT) AS p_num
  FROM dob d JOIN dnull nu ON nu.nk = d.nk
  GROUP BY d.nk, d.d_obs
),
rk AS (
  SELECT nk, d_obs, p_num,
         CAST(row_number() OVER (ORDER BY p_num, nk) AS BIGINT) AS k,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM pv
),
adj AS (
  SELECT nk, d_obs, p_num, k, m,
         min(CAST(m AS DOUBLE) * p_num / ({_BH_B} + 1) / k)
           OVER (ORDER BY k DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_adj_raw,
         CASE WHEN p_num * m * {_BH_ALPHA_DEN}
                   <= k * {_BH_ALPHA_NUM} * ({_BH_B} + 1)
              THEN k ELSE 0 END AS pass_k
  FROM rk
),
kstar AS (SELECT max(pass_k) AS ks FROM adj)
SELECT a.nk AS nationkey, round(a.d_obs, 6) AS d_obs,
       a.p_num AS p_numerator, CAST({_BH_B} + 1 AS BIGINT) AS p_denominator,
       round(CAST(a.p_num AS DOUBLE) / ({_BH_B} + 1), 6) AS p_value,
       a.k AS bh_rank,
       round(least(a.p_adj_raw, 1.0), 6) AS p_adj,
       CAST(CASE WHEN a.k <= kstar.ks THEN 1 ELSE 0 END AS BIGINT) AS rejected
FROM adj a CROSS JOIN kstar
ORDER BY a.k
""",
    tags=("stats", "fdr", "multiple-testing", "inference"),
)
def q_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI–HOCHBERG FDR CONTROL over 25 simultaneous per-nation
    permutation tests (does this nation's mean order total differ from
    the rest?) — the multiple-testing layer every metric-drift monitor
    needs on top of a single test (at alpha=0.1, ~2.5 of 25 null
    nations would "fire" uncorrected).

    Exactness: p-values are exact rationals (1 + #{|d_b| >= |d_obs|})
    / (B+1) from the deterministic hash-lattice pseudo-grouping (one
    mod-25 assignment per replicate gives every nation a same-sized
    null draw — TPC-H nations are uniform), and the BH step-up
    decision p_(k) <= k*alpha/m is evaluated in INTEGER arithmetic
    (p_num*m*10 <= k*(B+1)) — no float threshold. The monotone
    adjusted p is the standard reverse running-min over m=25 rows.

    Scale shape: the replicate frame is one explode (B rows/order) into
    ONE partial-aggregating groupBy(b, pseudo-group) — 25*B=1600 group
    rows regardless of input size; everything after is domain-bounded
    (25-row windows)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_nationkey").alias("nk"),
        "o_custkey",
        dec(F.col("o_totalprice")).alias("v"),
    )
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("v").cast("decimal(38,2)").alias("s_all"),
    )
    obs = s.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("v").cast("decimal(38,2)").alias("s_i"),
    )
    dob = obs.crossJoin(F.broadcast(tot)).select(
        "nk",
        (
            F.col("s_i").cast("double") / F.col("n_i")
            - (F.col("s_all") - F.col("s_i")).cast("double")
            / (F.col("n_all") - F.col("n_i"))
        ).alias("d_obs"),
    )
    reps = s.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_BH_B - 1))).alias("b"),
        "o_custkey",
    ).select(
        "b",
        "v",
        (
            ((F.col("o_custkey") % _M) * _PERM_MULT + F.col("b") * 131)
            % _M
            % _BH_GROUPS
        )
        .cast("long")
        .alias("pg"),
    )
    rg = reps.groupBy("b", "pg").agg(
        F.count(F.lit(1)).cast("long").alias("n_b"),
        F.sum("v").cast("decimal(38,2)").alias("s_b"),
    )
    dnull = rg.crossJoin(F.broadcast(tot)).select(
        F.col("pg").alias("nk"),
        (
            F.col("s_b").cast("double") / F.col("n_b")
            - (F.col("s_all") - F.col("s_b")).cast("double")
            / (F.col("n_all") - F.col("n_b"))
        ).alias("d_b"),
    )
    pv = (
        dob.join(dnull, "nk")
        .groupBy("nk", "d_obs")
        .agg(
            (
                1
                + F.sum(
                    F.when(
                        F.abs(F.col("d_b")) >= F.abs(F.col("d_obs")), 1
                    ).otherwise(0)
                )
            )
            .cast("long")
            .alias("p_num")
        )
    )
    rk = pv.select(
        "nk",
        "d_obs",
        "p_num",
        F.row_number().over(W.orderBy("p_num", "nk")).cast("long").alias("k"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("long").alias("m"),
    )
    adj = rk.select(
        "nk",
        "d_obs",
        "p_num",
        "k",
        "m",
        F.min(
            F.col("m").cast("double") * F.col("p_num") / (_BH_B + 1) / F.col("k")
        )
        .over(W.orderBy(F.col("k").desc()).rowsBetween(W.unboundedPreceding, 0))
        .alias("p_adj_raw"),
        F.when(
            F.col("p_num") * F.col("m") * _BH_ALPHA_DEN
            <= F.col("k") * _BH_ALPHA_NUM * (_BH_B + 1),
            F.col("k"),
        )
        .otherwise(0)
        .alias("pass_k"),
    )
    kstar = adj.agg(F.max("pass_k").alias("ks"))
    return (
        adj.crossJoin(F.broadcast(kstar))
        .select(
            F.col("nk").alias("nationkey"),
            F.round("d_obs", 6).alias("d_obs"),
            F.col("p_num").alias("p_numerator"),
            F.lit(_BH_B + 1).cast("long").alias("p_denominator"),
            F.round(F.col("p_num").cast("double") / (_BH_B + 1), 6).alias(
                "p_value"
            ),
            F.col("k").alias("bh_rank"),
            F.round(F.least(F.col("p_adj_raw"), F.lit(1.0)), 6).alias("p_adj"),
            F.when(F.col("k") <= F.col("ks"), 1)
            .otherwise(0)
            .cast("long")
            .alias("rejected"),
        )
        .orderBy("bh_rank")
    )


# ---------------------------------------------------------------------------
# Isotonic calibration (exact minimax form of PAVA over domain buckets)
# ---------------------------------------------------------------------------

_ISO_WIDTH = 50000  # price-domain buckets 0..9 (the PSI binning)


@query(
    "q_isotonic_calibration",
    oracle=f"""
WITH s AS (
  SELECT least(CAST(floor(o_totalprice / {_ISO_WIDTH}) AS BIGINT), 9) AS bkt,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
),
g AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS w, CAST(sum(y) AS BIGINT) AS p
  FROM s GROUP BY bkt
),
pre AS (
  SELECT bkt, w, p,
         CAST(sum(w) OVER (ORDER BY bkt) AS BIGINT) AS cw,
         CAST(sum(p) OVER (ORDER BY bkt) AS BIGINT) AS cp
  FROM g
),
pre0 AS (
  SELECT bkt, w, p, cw, cp, cw - w AS cw0, cp - p AS cp0 FROM pre
),
tri AS (
  SELECT j.bkt AS bj, i.bkt AS bi, k.bkt AS bk,
         CAST(k.cp - i.cp0 AS DOUBLE) / (k.cw - i.cw0) AS seg_avg
  FROM pre0 j
  JOIN pre0 i ON i.bkt <= j.bkt
  JOIN pre0 k ON k.bkt >= j.bkt
),
inner_min AS (
  SELECT bj, bi, min(seg_avg) AS mn FROM tri GROUP BY bj, bi
),
fit AS (
  SELECT bj AS bkt, max(mn) AS iso FROM inner_min GROUP BY bj
)
SELECT g.bkt AS bucket, g.w AS n,
       round(CAST(g.p AS DOUBLE) / g.w, 6) AS raw_rate,
       round(fit.iso, 6) AS iso_rate
FROM g JOIN fit ON g.bkt = fit.bkt
ORDER BY bucket
""",
    tags=("stats", "isotonic", "calibration", "ml-features"),
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC (monotone nondecreasing) CALIBRATION of the
    urgent-priority rate against the order-total bucket — the
    score-calibration step (Zadrozny & Elkan 2002) a ranking/quality
    model runs before its scores become probabilities; companion to
    text_score_calibration's reliability diagram (which DIAGNOSES
    miscalibration; this FIXES it).

    Instead of the sequential pool-adjacent-violators loop, the fit
    uses PAVA's exact MINIMAX closed form — iso(j) = max_{{i<=j}}
    min_{{k>=j}} wavg(y, i..k) — over weighted prefix sums, so the
    whole fit is a declarative plan with an exact oracle. wavg is a
    single double divide of exact BIGINT prefix differences; min/max
    compare identical doubles in both engines.

    Scale shape: buckets come from the price DOMAIN (10 at every SF),
    so the input-sized work is ONE groupBy; the cubic (i,j,k) triple
    space is 10^3 domain-bounded rows on broadcast frames — the same
    bounded-grain-then-expensive-statistic shape as
    q_hodges_lehmann."""
    o = _t(spark, sf_dir, "orders")
    s = o.select(
        F.least(F.floor(F.col("o_totalprice") / _ISO_WIDTH), F.lit(9))
        .cast("long")
        .alias("bkt"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        )
        .otherwise(0)
        .alias("y"),
    )
    g = s.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum("y").cast("long").alias("p"),
    )
    pre = g.select(
        "bkt",
        "w",
        "p",
        F.sum("w").over(W.orderBy("bkt")).cast("long").alias("cw"),
        F.sum("p").over(W.orderBy("bkt")).cast("long").alias("cp"),
    ).select(
        "bkt",
        "w",
        "p",
        "cw",
        "cp",
        (F.col("cw") - F.col("w")).alias("cw0"),
        (F.col("cp") - F.col("p")).alias("cp0"),
    )
    j = pre.select(F.col("bkt").alias("bj"))
    i = pre.select(F.col("bkt").alias("bi"), "cw0", "cp0")
    k = pre.select(F.col("bkt").alias("bk"), "cw", "cp")
    tri = (
        j.join(F.broadcast(i), F.col("bi") <= F.col("bj"))
        .join(F.broadcast(k), F.col("bk") >= F.col("bj"))
        .select(
            "bj",
            "bi",
            (
                (F.col("cp") - F.col("cp0")).cast("double")
                / (F.col("cw") - F.col("cw0"))
            ).alias("seg_avg"),
        )
    )
    fit = (
        tri.groupBy("bj", "bi")
        .agg(F.min("seg_avg").alias("mn"))
        .groupBy("bj")
        .agg(F.max("mn").alias("iso"))
    )
    return (
        g.join(F.broadcast(fit), g.bkt == fit.bj)
        .select(
            F.col("bkt").alias("bucket"),
            F.col("w").alias("n"),
            F.round(F.col("p").cast("double") / F.col("w"), 6).alias("raw_rate"),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Two-feature OLS via closed-form normal equations (Cramer's rule)
# ---------------------------------------------------------------------------

# One formula text, used verbatim by BOTH engines (Spark F.expr and
# the DuckDB oracle) over the same one-row moment frame — identical
# parse tree => identical double op order => hash-equal output.
_OLS_DETS = {
    "det": "nn*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2)"
    " + s2*(s1*s12 - s11*s2)",
    "det0": "sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y)"
    " + s2*(s1y*s12 - s11*s2y)",
    "det1": "nn*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2)"
    " + s2*(s1*s2y - s1y*s2)",
    "det2": "nn*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2)"
    " + sy*(s1*s12 - s11*s2)",
}
_OLS_EXPRS = [
    e.format(**_OLS_DETS)
    for e in (
        "round(({det0})/({det}), 6) AS beta0",
        "round(({det1})/({det}), 6) AS beta1",
        "round(({det2})/({det}), 6) AS beta2",
        "round(1.0 - (syy - (({det0})/({det}))*sy - (({det1})/({det}))*s1y"
        " - (({det2})/({det}))*s2y) / (syy - sy*sy/nn), 6) AS r2",
    )
]
_OLS_OUT = ", ".join(_OLS_EXPRS)


@query(
    "q_ols_two_feature",
    oracle=f"""
WITH f AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS x1,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT f.x1, f.x2, CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM f JOIN orders o ON o.o_orderkey = f.ok
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(x1) AS DOUBLE) AS s1,
         CAST(sum(x2) AS DOUBLE) AS s2,
         CAST(sum(x1 * x1) AS DOUBLE) AS s11,
         CAST(sum(x1 * x2) AS DOUBLE) AS s12,
         CAST(sum(x2 * x2) AS DOUBLE) AS s22,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x1 * y) AS DOUBLE) AS s1y,
         CAST(sum(x2 * y) AS DOUBLE) AS s2y,
         CAST(sum(CAST(y AS DECIMAL(19,2)) * y) AS DOUBLE) AS syy
  FROM j
)
SELECT CAST(nn AS BIGINT) AS n, {_OLS_OUT}
FROM m
""",
    tags=("stats", "regression", "ml-features"),
)
def q_ols_two_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-FEATURE OLS (order total ~ item count + total quantity) by
    closed-form normal equations — the multiple-regression step up
    from q_price_elasticity's per-group simple slope: nine exact
    moment sums in one aggregate pass, then Cramer's rule on the 3x3
    system evaluated from ONE shared formula text (the same string
    feeds Spark's F.expr and the DuckDB oracle, so the double op
    order is identical by construction — no per-engine transcription
    to drift).

    Scale shape: a 100 TB regression is exactly this — one map-side-
    combinable aggregation to 10 numbers, solve on the driver-sized
    frame. No iteration, no gradient loop, no collect."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("long").alias("x1"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x2"),
    )
    o = _t(spark, sf_dir, "orders")
    j = f.join(o, f.ok == o.o_orderkey).select(
        "x1", "x2", dec(F.col("o_totalprice")).alias("y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y").cast("decimal(19,2)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    return m.selectExpr("CAST(nn AS BIGINT) AS n", *_OLS_EXPRS)


# ---------------------------------------------------------------------------
# Information-gain feature ranking (decision-stump screen)
# ---------------------------------------------------------------------------

# Shared entropy fragment: binary entropy of pos/total in nats, with
# the 0*ln(0) = 0 limit guarded. Same text feeds F.expr and DuckDB.
_H_EXPR = (
    "(CASE WHEN {p} <= 0 OR {p} >= {n} THEN 0.0 ELSE "
    "-(CAST({p} AS DOUBLE)/{n}) * ln(CAST({p} AS DOUBLE)/{n}) "
    "- (CAST({n} - {p} AS DOUBLE)/{n}) * ln(CAST({n} - {p} AS DOUBLE)/{n}) "
    "END)"
)


@query(
    "q_gini_split_gain",
    oracle=f"""
WITH s AS (
  SELECT o.o_orderkey,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y,
         [
           {{'f': 'segment', 'v': c.c_mktsegment}},
           {{'f': 'status', 'v': o.o_orderstatus}},
           {{'f': 'price_bucket',
             'v': CAST(least(CAST(floor(o.o_totalprice / 50000) AS BIGINT), 9)
                       AS VARCHAR)}},
           {{'f': 'order_month', 'v': CAST(month(o.o_orderdate) AS VARCHAR)}}
         ] AS fs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
x AS (SELECT y, unnest(fs, recursive := true) FROM s),
g AS (
  SELECT f, v, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p
  FROM x GROUP BY f, v
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) / 4 AS nn, CAST(sum(p) AS BIGINT) / 4 AS pp
  FROM g
),
hy AS (SELECT {_H_EXPR.format(p="pp", n="nn")} AS h FROM tot),
cond AS (
  SELECT g.f, CAST(count(*) AS BIGINT) AS n_values,
         CAST(sum(CAST(round(
             (CAST(g.n AS DOUBLE) / t.nn)
             * {_H_EXPR.format(p="g.p", n="g.n")}, 10)
           AS DECIMAL(28,10))) AS DOUBLE) AS h_cond
  FROM g CROSS JOIN tot t
  GROUP BY g.f, t.nn
)
SELECT c.f AS feature, c.n_values,
       round(c.h_cond, 6) AS h_cond,
       round(hy.h - c.h_cond, 6) AS info_gain
FROM cond c CROSS JOIN hy
ORDER BY info_gain DESC, feature
""",
    tags=("stats", "information-gain", "ml-features"),
)
def q_gini_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INFORMATION-GAIN FEATURE RANKING for predicting urgent
    priority — the decision-stump screen a feature pipeline runs
    before training (which columns carry signal at all; companion to
    q_mutual_information's single-pair MI and q_weight_of_evidence's
    per-bin scores). Four candidate features (segment, status, price
    bucket, order month) fan out as ONE map-side explode into one
    (feature, value) aggregate — a feature costs one group per
    distinct value, never a scan.

    Exactness: counts are exact; each value's weighted-entropy term
    is rounded to DECIMAL(28,10) before the cross-value fold (the PSI
    recipe — cross-group double sums re-round), and the binary
    entropy uses ONE shared formula text in both engines with the
    0*ln(0) limit guarded."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
        F.create_map(
            F.lit("segment"),
            F.col("c_mktsegment"),
            F.lit("status"),
            F.col("o_orderstatus"),
            F.lit("price_bucket"),
            F.least(F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(9))
            .cast("string"),
            F.lit("order_month"),
            F.month("o_orderdate").cast("string"),
        ).alias("fs"),
    )
    x = s.select("y", F.explode("fs").alias("f", "v"))
    g = x.groupBy("f", "v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("p"),
    )
    tot = g.agg(
        (F.sum("n").cast("long") / 4).cast("long").alias("nn"),
        (F.sum("p").cast("long") / 4).cast("long").alias("pp"),
    )
    hy = tot.selectExpr(f"{_H_EXPR.format(p='pp', n='nn')} AS h")
    cond = (
        g.crossJoin(F.broadcast(tot))
        .selectExpr(
            "f",
            "n",
            f"CAST(round((CAST(n AS DOUBLE) / nn)"
            f" * {_H_EXPR.format(p='p', n='n')}, 10) AS DECIMAL(28,10))"
            " AS term",
        )
        .groupBy("f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_values"),
            F.sum("term").cast("double").alias("h_cond"),
        )
    )
    return (
        cond.crossJoin(F.broadcast(hy))
        .select(
            F.col("f").alias("feature"),
            "n_values",
            F.round(F.col("h_cond"), 6).alias("h_cond"),
            F.round(F.col("h") - F.col("h_cond"), 6).alias("info_gain"),
        )
        .orderBy(F.col("info_gain").desc(), "feature")
    )


# ---------------------------------------------------------------------------
# Cramér's V categorical-association matrix
# ---------------------------------------------------------------------------


@query(
    "q_cramers_v",
    oracle="""
WITH s AS (
  SELECT o.o_orderkey,
         [
           {'pr': 'segment|priority', 'va': c.c_mktsegment,
            'vb': o.o_orderpriority},
           {'pr': 'segment|status', 'va': c.c_mktsegment,
            'vb': o.o_orderstatus},
           {'pr': 'priority|status', 'va': o.o_orderpriority,
            'vb': o.o_orderstatus}
         ] AS prs
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
x AS (SELECT unnest(prs, recursive := true) FROM s),
o_c AS (
  SELECT pr, va, vb, CAST(count(*) AS BIGINT) AS o FROM x GROUP BY pr, va, vb
),
ra AS (SELECT pr, va, CAST(sum(o) AS BIGINT) AS r FROM o_c GROUP BY pr, va),
cb AS (SELECT pr, vb, CAST(sum(o) AS BIGINT) AS c FROM o_c GROUP BY pr, vb),
nt AS (SELECT pr, CAST(sum(o) AS BIGINT) AS n FROM o_c GROUP BY pr),
dims AS (
  SELECT pr,
         least((SELECT count(*) FROM ra WHERE ra.pr = d.pr),
               (SELECT count(*) FROM cb WHERE cb.pr = d.pr)) - 1 AS df_min
  FROM (SELECT DISTINCT pr FROM o_c) d
),
chi AS (
  SELECT o_c.pr,
         CAST(sum(CAST(round(
             (o_c.o - CAST(ra.r AS DOUBLE) * cb.c / nt.n)
             * (o_c.o - CAST(ra.r AS DOUBLE) * cb.c / nt.n)
             / (CAST(ra.r AS DOUBLE) * cb.c / nt.n), 10)
           AS DECIMAL(28,10))) AS DOUBLE) AS chi2,
         max(nt.n) AS n
  FROM o_c
  JOIN ra ON ra.pr = o_c.pr AND ra.va = o_c.va
  JOIN cb ON cb.pr = o_c.pr AND cb.vb = o_c.vb
  JOIN nt ON nt.pr = o_c.pr
  GROUP BY o_c.pr
)
SELECT chi.pr AS pair, CAST(chi.n AS BIGINT) AS n,
       CAST(dims.df_min AS BIGINT) AS df_min,
       round(chi.chi2, 6) AS chi2,
       round(sqrt(chi.chi2 / (chi.n * dims.df_min)), 6) AS cramers_v
FROM chi JOIN dims ON dims.pr = chi.pr
ORDER BY pair
""",
    tags=("stats", "cramers-v", "association"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V ASSOCIATION MATRIX over the categorical columns
    (segment x priority x status pairs) — the categorical twin of
    q_corr_matrix's Pearson block: which discrete columns are
    redundant before feature selection (V near 1 = drop one),
    generalizing q_chi2_independence's single pair to the matrix.

    Scale shape: all three contingency tables come from ONE map-side
    explode into one (pair, va, vb) count aggregate — input is
    scanned once; marginals, totals and the <=25-cell chi-square
    folds are group-bounded. Per-cell (O-E)^2/E terms are rounded to
    DECIMAL(28,10) before the cross-cell fold (cross-group double
    sums re-round — the standing rule)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = o.join(c, o.o_custkey == c.c_custkey).select(
        F.array(
            F.struct(
                F.lit("segment|priority").alias("pr"),
                F.col("c_mktsegment").alias("va"),
                F.col("o_orderpriority").alias("vb"),
            ),
            F.struct(
                F.lit("segment|status").alias("pr"),
                F.col("c_mktsegment").alias("va"),
                F.col("o_orderstatus").alias("vb"),
            ),
            F.struct(
                F.lit("priority|status").alias("pr"),
                F.col("o_orderpriority").alias("va"),
                F.col("o_orderstatus").alias("vb"),
            ),
        ).alias("prs")
    )
    x = s.select(F.explode("prs").alias("e")).select("e.pr", "e.va", "e.vb")
    oc = x.groupBy("pr", "va", "vb").agg(F.count(F.lit(1)).cast("long").alias("o"))
    ra = oc.groupBy("pr", "va").agg(F.sum("o").cast("long").alias("r"))
    cb = oc.groupBy("pr", "vb").agg(F.sum("o").cast("long").alias("c"))
    nt = oc.groupBy("pr").agg(F.sum("o").cast("long").alias("n"))
    dims = (
        ra.groupBy("pr")
        .agg(F.count(F.lit(1)).alias("n_rows_a"))
        .join(cb.groupBy("pr").agg(F.count(F.lit(1)).alias("n_cols_b")), "pr")
        .select(
            "pr",
            (F.least("n_rows_a", "n_cols_b") - 1).cast("long").alias("df_min"),
        )
    )
    e = F.col("r").cast("double") * F.col("c") / F.col("n")
    chi = (
        oc.join(F.broadcast(ra), ["pr", "va"])
        .join(F.broadcast(cb), ["pr", "vb"])
        .join(F.broadcast(nt), "pr")
        .select(
            "pr",
            "n",
            F.round((F.col("o") - e) * (F.col("o") - e) / e, 10)
            .cast("decimal(28,10)")
            .alias("term"),
        )
        .groupBy("pr")
        .agg(
            F.sum("term").cast("double").alias("chi2"),
            F.max("n").alias("n"),
        )
    )
    return (
        chi.join(F.broadcast(dims), "pr")
        .select(
            F.col("pr").alias("pair"),
            F.col("n").cast("long").alias("n"),
            F.col("df_min"),
            F.round(F.col("chi2"), 6).alias("chi2"),
            F.round(
                F.sqrt(F.col("chi2") / (F.col("n") * F.col("df_min"))), 6
            ).alias("cramers_v"),
        )
        .orderBy("pair")
    )


# ---------------------------------------------------------------------------
# Theil + Atkinson inequality indices (the decomposable companions
# to q_gini_spend / q_lorenz_deciles)
# ---------------------------------------------------------------------------


@query(
    "q_theil_atkinson",
    oracle="""
WITH s AS (
  SELECT c.c_nationkey AS nk,
         CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_nationkey
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(spend) AS DECIMAL(38,2)) AS st
  FROM s
),
terms AS (
  SELECT s.nk,
         CAST(round((CAST(s.spend AS DOUBLE) / (CAST(t.st AS DOUBLE) / t.n))
               * ln(CAST(s.spend AS DOUBLE) / (CAST(t.st AS DOUBLE) / t.n)),
               10) AS DECIMAL(28,10)) AS t_term,
         CAST(round(ln(CAST(s.spend AS DOUBLE)
                       / (CAST(t.st AS DOUBLE) / t.n)), 10)
              AS DECIMAL(28,10)) AS l_term
  FROM s CROSS JOIN tot t
),
g AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n_cust,
         CAST(sum(t_term) AS DECIMAL(38,10)) AS ts,
         CAST(sum(l_term) AS DECIMAL(38,10)) AS ls
  FROM terms GROUP BY nk
),
agg AS (
  SELECT CAST(sum(n_cust) AS BIGINT) AS n,
         CAST(sum(ts) AS DOUBLE) AS tsum,
         CAST(sum(ls) AS DOUBLE) AS lsum
  FROM g
)
SELECT n,
       round(tsum / n, 6) AS theil_t,
       round(-lsum / n, 6) AS theil_l,
       round(1.0 - exp(lsum / n), 6) AS atkinson_1
FROM agg
""",
    tags=("stats", "inequality", "theil"),
)
def q_theil_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T / THEIL L / ATKINSON(eps=1) over per-customer spend —
    the DECOMPOSABLE inequality indices next to q_gini_spend (Gini
    does not split into within/between-group parts; Theil does, which
    is why fairness audits over population segments prefer it; the
    nation-grouped partial sums here ARE the within-group legs of
    that decomposition, folded to the totals).

    Exactness: spends are exact DECIMAL sums; each x/mu ln(x/mu) term
    rounds to DECIMAL(28,10) before the two-level fold (per-nation
    partials, then 25-row total — cross-group double sums re-round,
    and the fold tree is fixed so a 1000-executor run equals this
    one); Atkinson(1) = 1 − exp(mean ln(x/mu)) shares the L-series.
    Scale: one customer-grain aggregate, one term pass, group-bounded
    folds — no sort, no window."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_custkey", F.col("c_nationkey").alias("nk"))
        .agg(F.sum(dec(F.col("o_totalprice"))).cast("decimal(28,2)").alias("spend"))
    )
    tot = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("spend").cast("decimal(38,2)").alias("st"),
    )
    mu = F.col("st").cast("double") / F.col("n")
    ratio = F.col("spend").cast("double") / mu
    terms = s.crossJoin(F.broadcast(tot)).select(
        "nk",
        F.round(ratio * F.log(ratio), 10).cast("decimal(28,10)").alias("t_term"),
        F.round(F.log(ratio), 10).cast("decimal(28,10)").alias("l_term"),
    )
    g = terms.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n_cust"),
        F.sum("t_term").cast("decimal(38,10)").alias("ts"),
        F.sum("l_term").cast("decimal(38,10)").alias("ls"),
    )
    agg = g.agg(
        F.sum("n_cust").cast("long").alias("n"),
        F.sum("ts").cast("double").alias("tsum"),
        F.sum("ls").cast("double").alias("lsum"),
    )
    return agg.select(
        "n",
        F.round(F.col("tsum") / F.col("n"), 6).alias("theil_t"),
        F.round(-F.col("lsum") / F.col("n"), 6).alias("theil_l"),
        F.round(1.0 - F.exp(F.col("lsum") / F.col("n")), 6).alias("atkinson_1"),
    )


# ---------------------------------------------------------------------------
# Kendall tau-b between two monthly series (exact integer concordance)
# ---------------------------------------------------------------------------


@query(
    "q_kendall_tau_b",
    oracle="""
WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM orders GROUP BY month
),
p AS (
  SELECT CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
              THEN 1 ELSE 0 END AS c,
         CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
              THEN 1 ELSE 0 END AS d,
         CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
         CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
  FROM m a JOIN m b ON a.month < b.month
),
s AS (
  SELECT CAST(sum(c) AS BIGINT) AS cc, CAST(sum(d) AS BIGINT) AS dd,
         CAST(sum(tx) AS BIGINT) AS ntx, CAST(sum(ty) AS BIGINT) AS nty,
         CAST(count(*) AS BIGINT) AS n0
  FROM p
),
nm AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m)
SELECT nm.n AS n_months, s.cc AS concordant, s.dd AS discordant,
       round((s.cc - s.dd) / (sqrt(CAST(s.n0 - s.ntx AS DOUBLE))
                              * sqrt(CAST(s.n0 - s.nty AS DOUBLE))), 6)
         AS tau_b
FROM s CROSS JOIN nm
""",
    tags=("stats", "kendall", "rank", "correlation"),
)
def q_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL tau-b between monthly revenue and monthly order count
    — the third rank-association member (Spearman = rank Pearson over
    ROWS; Mann–Kendall = one series vs TIME; tau-b = two SERIES
    against each other with tie correction). Concordant/discordant
    pairs are exact integer comparisons of exact DECIMAL monthly
    aggregates; tau-b's denominator is the one double chain.

    Scale shape: the quadratic pair step runs at the MONTH grain
    (domain-bounded ~80 rows → ~3.2k pairs on a broadcast self-join)
    — the q_hodges_lehmann argument; the input-sized work is one
    exact groupBy."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month")
    ).agg(
        F.sum(dec(F.col("o_totalprice"))).cast("decimal(28,2)").alias("x"),
        F.count(F.lit(1)).cast("long").alias("y"),
    )
    a = m.select(
        F.col("month").alias("ma"), F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = m.select(
        F.col("month").alias("mb"), F.col("x").alias("xb"), F.col("y").alias("yb")
    )
    p = a.join(F.broadcast(b), F.col("ma") < F.col("mb")).select(
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") < F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") > F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("c"),
        F.when(
            ((F.col("xa") < F.col("xb")) & (F.col("ya") > F.col("yb")))
            | ((F.col("xa") > F.col("xb")) & (F.col("ya") < F.col("yb"))),
            1,
        )
        .otherwise(0)
        .alias("d"),
        F.when(F.col("xa") == F.col("xb"), 1).otherwise(0).alias("tx"),
        F.when(F.col("ya") == F.col("yb"), 1).otherwise(0).alias("ty"),
    )
    s = p.agg(
        F.sum("c").cast("long").alias("cc"),
        F.sum("d").cast("long").alias("dd"),
        F.sum("tx").cast("long").alias("ntx"),
        F.sum("ty").cast("long").alias("nty"),
        F.count(F.lit(1)).cast("long").alias("n0"),
    )
    nm = m.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return s.crossJoin(F.broadcast(nm)).select(
        F.col("n").alias("n_months"),
        F.col("cc").alias("concordant"),
        F.col("dd").alias("discordant"),
        F.round(
            (F.col("cc") - F.col("dd"))
            / (
                F.sqrt((F.col("n0") - F.col("ntx")).cast("double"))
                * F.sqrt((F.col("n0") - F.col("nty")).cast("double"))
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------------
# Partial correlation (controlling for a confounder)
# ---------------------------------------------------------------------------

@query(
    "q_partial_corr",
    oracle=f"""
WITH s AS (
  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS q,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
         CAST(l_discount AS DECIMAL(18,2)) AS d
  FROM lineitem
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
         CAST(sum(d) AS DOUBLE) AS sd,
         CAST(sum(CAST(q AS DECIMAL(19,2)) * q) AS DOUBLE) AS sqq,
         CAST(sum(CAST(p AS DECIMAL(19,2)) * p) AS DOUBLE) AS spp,
         CAST(sum(CAST(d AS DECIMAL(19,2)) * d) AS DOUBLE) AS sdd,
         CAST(sum(CAST(q AS DECIMAL(19,2)) * p) AS DOUBLE) AS sqp,
         CAST(sum(CAST(q AS DECIMAL(19,2)) * d) AS DOUBLE) AS sqd,
         CAST(sum(CAST(p AS DECIMAL(19,2)) * d) AS DOUBLE) AS spd
  FROM s
)
SELECT CAST(nn AS BIGINT) AS n,
       round((nn*sqp - sq*sp) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*spp - sp*sp)), 6) AS r_qp,
       round((nn*sqd - sq*sd) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*sdd - sd*sd)), 6) AS r_qd,
       round((nn*spd - sp*sd) / (sqrt(nn*spp - sp*sp) * sqrt(nn*sdd - sd*sd)), 6) AS r_pd,
       round((((nn*sqp - sq*sp) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*spp - sp*sp))) - ((nn*sqd - sq*sd) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*sdd - sd*sd))) * ((nn*spd - sp*sd) / (sqrt(nn*spp - sp*sp) * sqrt(nn*sdd - sd*sd))))
             / (sqrt(1.0 - ((nn*sqd - sq*sd) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*sdd - sd*sd))) * ((nn*sqd - sq*sd) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*sdd - sd*sd))))
                * sqrt(1.0 - ((nn*spd - sp*sd) / (sqrt(nn*spp - sp*sp) * sqrt(nn*sdd - sd*sd))) * ((nn*spd - sp*sd) / (sqrt(nn*spp - sp*sp) * sqrt(nn*sdd - sd*sd))))), 6)
         AS partial_r_qp_given_d
FROM m
""",
    tags=("stats", "partial-correlation", "ml-features"),
)
def q_partial_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL CORRELATION of quantity and extended price CONTROLLING
    FOR discount — the confounder-adjusted association (first-order
    partial r, the 2x2 inverse-correlation entry): what q_corr_matrix
    reports marginally, adjusted for the third variable. All nine
    moment sums exact DECIMAL in one pass; the three Pearson r's and
    the partial composition are ONE double chain written as shared
    expression text (the q_ols_two_feature recipe) so both engines
    evaluate the identical tree."""
    s = _t(spark, sf_dir, "lineitem").select(
        dec(F.col("l_quantity")).alias("q"),
        dec(F.col("l_extendedprice")).alias("p"),
        dec(F.col("l_discount")).alias("d"),
    )
    w = lambda c: F.col(c).cast("decimal(19,2)")  # noqa: E731
    m = s.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("p").cast("double").alias("sp"),
        F.sum("d").cast("double").alias("sd"),
        F.sum(w("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(w("p") * F.col("p")).cast("double").alias("spp"),
        F.sum(w("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(w("q") * F.col("p")).cast("double").alias("sqp"),
        F.sum(w("q") * F.col("d")).cast("double").alias("sqd"),
        F.sum(w("p") * F.col("d")).cast("double").alias("spd"),
    )
    r_qp = "(nn*sqp - sq*sp) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*spp - sp*sp))"
    r_qd = "(nn*sqd - sq*sd) / (sqrt(nn*sqq - sq*sq) * sqrt(nn*sdd - sd*sd))"
    r_pd = "(nn*spd - sp*sd) / (sqrt(nn*spp - sp*sp) * sqrt(nn*sdd - sd*sd))"
    return m.selectExpr(
        "CAST(nn AS BIGINT) AS n",
        f"round({r_qp}, 6) AS r_qp",
        f"round({r_qd}, 6) AS r_qd",
        f"round({r_pd}, 6) AS r_pd",
        f"round((({r_qp}) - ({r_qd}) * ({r_pd}))"
        f" / (sqrt(1.0 - ({r_qd}) * ({r_qd}))"
        f" * sqrt(1.0 - ({r_pd}) * ({r_pd}))), 6)"
        " AS partial_r_qp_given_d",
    )


# ---------------------------------------------------------------------------
# Differentially-private noisy counts (Laplace mechanism plumbing)
# ---------------------------------------------------------------------------

_DP_EPS_NUM, _DP_EPS_DEN = 1, 1  # epsilon = 1.0 (sensitivity-1 count)
_DP_MULT, _DP_OFF = 912871, 41  # odd => bijective lattice draw per group

# One shared formula text (F.expr + oracle): u in (0,1) from the
# lattice, Laplace(b=1/eps) by inverse CDF. ln over identical doubles.
_DP_LAP = (
    "(CASE WHEN u < 0.5 THEN ln(2.0 * u) ELSE -ln(2.0 * (1.0 - u)) END)"
    f" * {_DP_EPS_DEN}.0 / {_DP_EPS_NUM}.0"
)


@query(
    "q_dp_noisy_counts",
    oracle=f"""
WITH g AS (
  SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey
),
u AS (
  SELECT nk, n,
         (CAST((nk % {_M}) * {_DP_MULT} + {_DP_OFF} AS BIGINT) % {_M} + 0.5)
           / {_M} AS u
  FROM g
)
SELECT nk AS nationkey,
       round(n + {_DP_LAP}, 4) AS noisy_count,
       {_DP_EPS_NUM}.0 / {_DP_EPS_DEN}.0 AS epsilon
FROM u
ORDER BY nationkey
""",
    tags=("stats", "privacy", "dp-mechanism"),
)
def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAPLACE-MECHANISM NOISY COUNTS per nation (epsilon = 1,
    sensitivity-1 counting query) — the RELEASE side of the privacy
    family (q_k_anonymity_audit / q_l_diversity / q_t_closeness audit
    what's safe to join; this is the mechanism that publishes an
    aggregate anyway). Inverse-CDF Laplace draw per group, noise
    scale = sensitivity/epsilon, the composition-accounting epsilon
    in the output row.

    HONESTY NOTE (the multimodal-stub contract): the per-group
    uniform comes from the engine's DETERMINISTIC hash lattice so the
    mechanism's plumbing is exact-oracle-testable — this is NOT
    private randomness; a real deployment swaps the lattice draw for
    a cryptographic RNG and every other line (scale, inverse CDF,
    epsilon ledger) stands. Scale: one keyed count, noise applied
    map-side per group row."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    u = g.selectExpr(
        "nk",
        "n",
        f"(CAST((nk % {_M}) * {_DP_MULT} + {_DP_OFF} AS BIGINT)"
        f" % {_M} + 0.5) / {_M} AS u",
    )
    return u.selectExpr(
        "nk AS nationkey",
        f"round(n + {_DP_LAP}, 4) AS noisy_count",
        f"CAST({_DP_EPS_NUM}.0 AS DOUBLE) / {_DP_EPS_DEN}.0 AS epsilon",
    ).orderBy("nationkey")


# ---------------------------------------------------------------------------
# Energy distance (Székely) between two monthly-mean distributions
# ---------------------------------------------------------------------------


@query(
    "q_energy_distance",
    oracle="""
WITH s AS (
  SELECT c.c_mktsegment AS seg, strftime(o.o_orderdate, '%Y-%m') AS month,
         CAST(round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)))
                         AS DOUBLE) / count(*), 6) AS DECIMAL(18,6)) AS mv
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY seg, month
),
a AS (SELECT mv FROM s WHERE seg = 'BUILDING'),
b AS (SELECT mv FROM s WHERE seg = 'MACHINERY'),
xy AS (
  SELECT CAST(sum(CAST(abs(a.mv - b.mv) AS DECIMAL(28,6))) AS DECIMAL(38,6))
           AS sd, CAST(count(*) AS BIGINT) AS np
  FROM a CROSS JOIN b
),
xx AS (
  SELECT CAST(sum(CAST(abs(x.mv - y.mv) AS DECIMAL(28,6))) AS DECIMAL(38,6))
           AS sd, CAST(count(*) AS BIGINT) AS np
  FROM a x CROSS JOIN a y
),
yy AS (
  SELECT CAST(sum(CAST(abs(x.mv - y.mv) AS DECIMAL(28,6))) AS DECIMAL(38,6))
           AS sd, CAST(count(*) AS BIGINT) AS np
  FROM b x CROSS JOIN b y
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
       round(2.0 * (CAST(xy.sd AS DOUBLE) / xy.np)
             - CAST(xx.sd AS DOUBLE) / xx.np
             - CAST(yy.sd AS DOUBLE) / yy.np, 6) AS energy_dist
FROM xy CROSS JOIN xx CROSS JOIN yy
""",
    tags=("stats", "energy-distance", "drift"),
)
def q_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENERGY DISTANCE (Székely & Rizzo) between two segments'
    monthly-mean order totals — the kernel-free distribution distance
    completing the drift toolkit (KS = max CDF gap, PSI/JS = binned
    divergence, energy = moment-free metric sensitive to ALL
    distribution differences, zero iff equal): E = 2·mean|X−Y| −
    mean|X−X'| − mean|Y−Y'| (V-statistic form, diagonal included).

    Exactness: the pairwise |differences| are exact DECIMAL(18,6)
    values folded as DECIMAL(38,6); the three means and the final
    combination are one double chain. Scale: the quadratic pair step
    runs at the MONTH grain (the q_hodges_lehmann argument — ~80²
    broadcast pairs, never raw rows)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    s = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.date_format(F.col("o_orderdate"), "yyyy-MM").alias("month"),
        )
        .agg(
            F.round(
                F.sum(dec(F.col("o_totalprice"))).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            .cast("decimal(18,6)")
            .alias("mv")
        )
    )
    a = s.filter(F.col("seg") == "BUILDING").select(F.col("mv").alias("va"))
    b = s.filter(F.col("seg") == "MACHINERY").select(F.col("mv").alias("vb"))

    def pair_mean(x: DataFrame, xc: str, y: DataFrame, yc: str):
        return x.crossJoin(F.broadcast(y)).agg(
            F.sum(F.abs(F.col(xc) - F.col(yc)).cast("decimal(28,6)"))
            .cast("decimal(38,6)")
            .alias("sd"),
            F.count(F.lit(1)).cast("long").alias("np"),
        )

    xy = pair_mean(a, "va", b, "vb")
    xx = pair_mean(a, "va", a.select(F.col("va").alias("vb")), "vb")
    yy = pair_mean(b.select(F.col("vb").alias("va")), "va", b, "vb")
    na = a.agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    nb = b.agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    mean_of = lambda t: F.col(f"{t}_sd").cast("double") / F.col(f"{t}_np")  # noqa: E731
    return (
        xy.select(F.col("sd").alias("xy_sd"), F.col("np").alias("xy_np"))
        .crossJoin(F.broadcast(xx.select(F.col("sd").alias("xx_sd"), F.col("np").alias("xx_np"))))
        .crossJoin(F.broadcast(yy.select(F.col("sd").alias("yy_sd"), F.col("np").alias("yy_np"))))
        .crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_a",
            "n_b",
            F.round(
                2.0 * mean_of("xy") - mean_of("xx") - mean_of("yy"), 6
            ).alias("energy_dist"),
        )
    )


# ---------------------------------------------------------------------------
# Regression discontinuity (local-linear at a cutoff)
# ---------------------------------------------------------------------------

_RD_CUT = 250000  # running variable: order total; cutoff + bandwidth
_RD_BW = 100000

_RD_SIDE = (
    "(s{s}_sxy * s{s}_n - s{s}_sx * s{s}_sy)"
    " / (s{s}_sxx * s{s}_n - s{s}_sx * s{s}_sx)"
)
_RD_AT = (
    "(s{s}_sy / s{s}_n + ({slope}) * ({cut} - s{s}_sx / s{s}_n))"
)


@query(
    "q_regression_discontinuity",
    oracle=f"""
WITH s AS (
  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS y
  FROM orders
  WHERE o_totalprice >= {_RD_CUT - _RD_BW}
    AND o_totalprice < {_RD_CUT + _RD_BW}
),
m AS (
  SELECT
    CAST(sum(CASE WHEN x < {_RD_CUT} THEN 1 ELSE 0 END) AS DOUBLE) AS sl_n,
    CAST(sum(CASE WHEN x < {_RD_CUT} THEN x END) AS DOUBLE) AS sl_sx,
    CAST(sum(CASE WHEN x < {_RD_CUT} THEN y END) AS DOUBLE) AS sl_sy,
    CAST(sum(CASE WHEN x < {_RD_CUT}
                  THEN CAST(x AS DECIMAL(19,2)) * x END) AS DOUBLE) AS sl_sxx,
    CAST(sum(CASE WHEN x < {_RD_CUT} THEN x * y END) AS DOUBLE) AS sl_sxy,
    CAST(sum(CASE WHEN x >= {_RD_CUT} THEN 1 ELSE 0 END) AS DOUBLE) AS sr_n,
    CAST(sum(CASE WHEN x >= {_RD_CUT} THEN x END) AS DOUBLE) AS sr_sx,
    CAST(sum(CASE WHEN x >= {_RD_CUT} THEN y END) AS DOUBLE) AS sr_sy,
    CAST(sum(CASE WHEN x >= {_RD_CUT}
                  THEN CAST(x AS DECIMAL(19,2)) * x END) AS DOUBLE) AS sr_sxx,
    CAST(sum(CASE WHEN x >= {_RD_CUT} THEN x * y END) AS DOUBLE) AS sr_sxy
  FROM s
)
SELECT CAST(sl_n AS BIGINT) AS n_left, CAST(sr_n AS BIGINT) AS n_right,
       round({_RD_SIDE.format(s='l')}, 9) + 0.0 AS slope_left,
       round({_RD_SIDE.format(s='r')}, 9) + 0.0 AS slope_right,
       round(
         ({_RD_AT.format(s='r', slope=_RD_SIDE.format(s='r'), cut=_RD_CUT)})
         - ({_RD_AT.format(s='l', slope=_RD_SIDE.format(s='l'), cut=_RD_CUT)}),
         6) + 0.0 AS rd_estimate
FROM m
""",
    tags=("stats", "causal", "regression-discontinuity"),
)
def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REGRESSION DISCONTINUITY at a price cutoff — the third member
    of the causal toolkit (q_diff_in_diff = parallel trends,
    q_uplift_by_segment = randomized lift, RD = assignment by
    threshold): local-linear fits on each side of the cutoff inside
    the bandwidth, treatment effect = the jump between the two fitted
    values AT the cutoff. TPC-H has no true discontinuity, so the
    estimate is honestly ≈0 — the operator is the point (same
    contract as q_newman_modularity's near-zero Q).

    Exactness: side moments from one CASE-split aggregate pass
    (exact sums, (19,2)-widened squares), both slopes and the jump as
    shared formula text in one double chain."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_totalprice") >= _RD_CUT - _RD_BW)
        & (F.col("o_totalprice") < _RD_CUT + _RD_BW)
    )
    s = o.select(
        dec(F.col("o_totalprice")).alias("x"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("y"),
    )
    left = F.col("x") < _RD_CUT

    def side(tag, cond):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("double").alias(f"s{tag}_n"),
            F.sum(F.when(cond, F.col("x"))).cast("double").alias(f"s{tag}_sx"),
            F.sum(F.when(cond, F.col("y"))).cast("double").alias(f"s{tag}_sy"),
            F.sum(F.when(cond, F.col("x").cast("decimal(19,2)") * F.col("x")))
            .cast("double")
            .alias(f"s{tag}_sxx"),
            F.sum(F.when(cond, F.col("x") * F.col("y")))
            .cast("double")
            .alias(f"s{tag}_sxy"),
        ]

    m = s.agg(*(side("l", left) + side("r", ~left)))
    sl = _RD_SIDE.format(s="l")
    sr = _RD_SIDE.format(s="r")
    return m.selectExpr(
        "CAST(sl_n AS BIGINT) AS n_left",
        "CAST(sr_n AS BIGINT) AS n_right",
        f"round({sl}, 9) + 0.0 AS slope_left",
        f"round({sr}, 9) + 0.0 AS slope_right",
        f"round(({_RD_AT.format(s='r', slope=sr, cut=_RD_CUT)})"
        f" - ({_RD_AT.format(s='l', slope=sl, cut=_RD_CUT)}), 6) + 0.0"
        " AS rd_estimate",
    )


# ---------------------------------------------------------------------------
# Instrumental-variable Wald (LATE) estimate
# ---------------------------------------------------------------------------


@query(
    "q_iv_wald_estimate",
    oracle="""
WITH cust AS (
  SELECT c.c_custkey,
         CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS z,
         CASE WHEN count(o.o_orderkey) >= 10 THEN 1 ELSE 0 END AS d,
         CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
              AS DECIMAL(28,2)) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey, c.c_mktsegment
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(z) AS DOUBLE) AS nz,
         CAST(sum(1 - z) AS DOUBLE) AS nnz,
         CAST(sum(CASE WHEN z = 1 THEN d END) AS DOUBLE) AS d1,
         CAST(sum(CASE WHEN z = 0 THEN d END) AS DOUBLE) AS d0,
         CAST(sum(CASE WHEN z = 1 THEN y END) AS DOUBLE) AS y1,
         CAST(sum(CASE WHEN z = 0 THEN y END) AS DOUBLE) AS y0
  FROM cust
)
SELECT n,
       round(d1 / nz - d0 / nnz, 6) AS first_stage,
       round(y1 / nz - y0 / nnz, 6) AS reduced_form,
       round((y1 / nz - y0 / nnz) / (d1 / nz - d0 / nnz), 6) AS wald_late
FROM m
""",
    tags=("stats", "causal", "instrumental-variable"),
)
def q_iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSTRUMENTAL-VARIABLE WALD ESTIMATE (the LATE under a binary
    instrument) — the fourth causal-toolkit member (DiD, uplift, RD,
    IV): first stage E[D|Z=1]−E[D|Z=0], reduced form on the outcome,
    Wald ratio = the effect of engagement (≥10 orders) on spend for
    instrument-compliers. The fixture's instrument (segment
    membership) is ILLUSTRATIVE — TPC-H has no true random
    encouragement, so the number demonstrates the estimator, not an
    effect; the operator mechanics (binary-split exact means, one
    ratio) are what a real encouragement-design pipeline runs.

    Exactness: per-customer (z, d, y) from one LEFT-JOIN aggregate,
    four exact conditional sums, one shared double chain."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec(F.col("o_totalprice"))), F.lit(0).cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("y"),
        )
        .select(
            F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0).alias("z"),
            F.when(F.col("n_orders") >= 10, 1).otherwise(0).alias("d"),
            "y",
        )
    )
    m = cust.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("z").cast("double").alias("nz"),
        F.sum(1 - F.col("z")).cast("double").alias("nnz"),
        F.sum(F.when(F.col("z") == 1, F.col("d"))).cast("double").alias("d1"),
        F.sum(F.when(F.col("z") == 0, F.col("d"))).cast("double").alias("d0"),
        F.sum(F.when(F.col("z") == 1, F.col("y"))).cast("double").alias("y1"),
        F.sum(F.when(F.col("z") == 0, F.col("y"))).cast("double").alias("y0"),
    )
    return m.selectExpr(
        "n",
        "round(d1 / nz - d0 / nnz, 6) AS first_stage",
        "round(y1 / nz - y0 / nnz, 6) AS reduced_form",
        "round((y1 / nz - y0 / nnz) / (d1 / nz - d0 / nnz), 6) AS wald_late",
    )


# ---------------------------------------------------------------------------
# Propensity-style nearest-neighbor matching (with replacement) + ATT
# ---------------------------------------------------------------------------

_PSM_CALIPER = 50.0  # max |score gap| for a valid match (acctbal units)


def _nn_bucketed_scan(ev: DataFrame, carry: list) -> DataFrame:
    """Two-level bucketed backward/forward ignore-nulls fill (the KS
    prefix-sum recipe) shared by the matching estimator and its
    balance diagnostic: bucket by the SCORE DOMAIN, in-bucket
    ignore-nulls windows run bucket-keyed (parallel), and only the
    ~24 per-bucket boundary controls cross buckets through a global
    window — the single-partition scan never sees input-sized rows.
    Produces exactly the global scan's matches (carry = the
    previous/next bucket's boundary control).

    ``ev`` columns: score, t_id, is_t (1 = treated), plus each name
    in ``carry`` (non-null on control rows). Returns the TREATED rows
    with lo_s/hi_s (bracketing control scores) and lo_<c>/hi_<c> for
    every carried column."""
    ev = ev.withColumn("bkt", F.floor(F.col("score") / 500).cast("long"))
    wb = W.partitionBy("bkt").orderBy("score", "is_t", "t_id").rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = W.partitionBy("bkt").orderBy("score", "is_t", "t_id").rowsBetween(
        0, W.unboundedFollowing
    )
    is_ctl = F.col("is_t") == 0
    sel = [
        F.last(F.when(is_ctl, F.col("score")), ignorenulls=True)
        .over(wb)
        .alias("l_lo_s"),
        F.first(F.when(is_ctl, F.col("score")), ignorenulls=True)
        .over(wf)
        .alias("l_hi_s"),
    ]
    for c in carry:
        sel.append(
            F.last(F.when(is_ctl, F.col(c)), ignorenulls=True)
            .over(wb)
            .alias(f"l_lo_{c}")
        )
        sel.append(
            F.first(F.when(is_ctl, F.col(c)), ignorenulls=True)
            .over(wf)
            .alias(f"l_hi_{c}")
        )
    local = ev.select("*", *sel)
    bounds = (
        ev.filter(is_ctl)
        .groupBy("bkt")
        .agg(
            F.max(F.struct("score", *carry)).alias("mx"),
            F.min(F.struct("score", *carry)).alias("mn"),
        )
    )
    wcb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    wcf = W.orderBy("bkt").rowsBetween(1, W.unboundedFollowing)
    # carries on the FULL bucket grid (a bucket with no controls at
    # all still needs its neighbors' boundary controls)
    grid = ev.select("bkt").distinct()
    carry_full = grid.join(bounds, "bkt", "left").select(
        "bkt",
        F.last("mx", ignorenulls=True).over(wcb).alias("c_lo"),
        F.first("mn", ignorenulls=True).over(wcf).alias("c_hi"),
    )
    out = [
        F.coalesce(F.col("l_lo_s"), F.col("c_lo.score")).alias("lo_s"),
        F.coalesce(F.col("l_hi_s"), F.col("c_hi.score")).alias("hi_s"),
    ]
    for c in carry:
        out.append(
            F.coalesce(F.col(f"l_lo_{c}"), F.col(f"c_lo.{c}")).alias(f"lo_{c}")
        )
        out.append(
            F.coalesce(F.col(f"l_hi_{c}"), F.col(f"c_hi.{c}")).alias(f"hi_{c}")
        )
    return (
        local.join(F.broadcast(carry_full), "bkt")
        .select("*", *out)
        .filter(F.col("is_t") == 1)
    )


@query(
    "q_propensity_att",
    oracle=f"""
WITH cust AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS score,
         CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0)
              AS DECIMAL(28,2)) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
),
ctl AS (
  SELECT score, min(c_custkey) AS ctl_id
  FROM cust WHERE c_mktsegment = 'MACHINERY' GROUP BY score
),
ctly AS (
  SELECT l.score, l.ctl_id, c.y AS ctl_y
  FROM ctl l JOIN cust c ON c.c_custkey = l.ctl_id
),
ev AS (
  SELECT score, NULL AS t_id, CAST(NULL AS DECIMAL(28,2)) AS t_y,
         ctl_id, ctl_y, 0 AS is_t
  FROM ctly
  UNION ALL
  SELECT score, c_custkey AS t_id, y AS t_y, NULL, NULL, 1 AS is_t
  FROM cust WHERE c_mktsegment = 'BUILDING'
),
scan AS (
  SELECT *,
         last_value(CASE WHEN is_t = 0 THEN score END IGNORE NULLS)
           OVER wb AS lo_s,
         last_value(CASE WHEN is_t = 0 THEN ctl_y END IGNORE NULLS)
           OVER wb AS lo_y,
         first_value(CASE WHEN is_t = 0 THEN score END IGNORE NULLS)
           OVER wf AS hi_s,
         first_value(CASE WHEN is_t = 0 THEN ctl_y END IGNORE NULLS)
           OVER wf AS hi_y
  FROM ev
  WINDOW wb AS (ORDER BY score, is_t, t_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY score, is_t, t_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
matched AS (
  SELECT t_id, t_y,
         CASE WHEN hi_s IS NULL THEN lo_y
              WHEN lo_s IS NULL THEN hi_y
              WHEN score - lo_s <= hi_s - score THEN lo_y ELSE hi_y END AS m_y,
         CASE WHEN hi_s IS NULL THEN score - lo_s
              WHEN lo_s IS NULL THEN hi_s - score
              WHEN score - lo_s <= hi_s - score
                THEN score - lo_s ELSE hi_s - score END AS gap
  FROM scan WHERE is_t = 1
),
kept AS (SELECT * FROM matched WHERE gap <= {_PSM_CALIPER})
SELECT (SELECT CAST(count(*) AS BIGINT) FROM matched) AS n_treated,
       CAST(count(*) AS BIGINT) AS n_matched,
       round(CAST(sum(CAST(t_y - m_y AS DECIMAL(28,2))) AS DOUBLE)
             / count(*), 6) AS att,
       round(CAST(sum(gap) AS DOUBLE) / count(*), 6) AS mean_score_gap
FROM kept
""",
    tags=("stats", "causal", "matching"),
)
def q_propensity_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-NEIGHBOR MATCHING (with replacement, caliper) + ATT —
    the fifth causal-toolkit member: each treated customer (BUILDING)
    matches the nearest control (MACHINERY) on the balancing score
    (acctbal stands in for a fitted propensity; the MATCHING operator
    is the point), ties broken deterministically (per-score control
    representative = min custkey; equidistant neighbors prefer the
    lower score), matches beyond the caliper dropped, ATT = mean
    treated-minus-matched-control spend.

    Scale shape: nearest-neighbor matching is the AS-OF pattern, not
    a pair join — the two cohorts union into one score-ordered stream
    and backward/forward ignore-nulls fills pick each treated row's
    bracketing controls. The fill is the TWO-LEVEL bucketed form (the
    KS prefix-sum recipe): score-domain buckets run their windows
    keyed (parallel), only ~24 per-bucket boundary controls cross
    buckets through the one global window, and the result equals the
    single global scan exactly (the oracle's form). With replacement,
    matching is embarrassingly declarative — greedy
    without-replacement is the sequential variant a single-partition
    pass would own."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = _t(spark, sf_dir, "orders")
    cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(
            F.coalesce(
                F.sum(dec(F.col("o_totalprice"))), F.lit(0).cast("decimal(18,2)")
            )
            .cast("decimal(28,2)")
            .alias("y")
        )
        .select(
            "c_custkey",
            "c_mktsegment",
            dec(F.col("c_acctbal")).alias("score"),
            "y",
        )
    )
    ctl = (
        cust.filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy("score")
        .agg(F.min("c_custkey").alias("ctl_id"))
    )
    ctly = ctl.join(
        cust.select(F.col("c_custkey").alias("ctl_id"), F.col("y").alias("ctl_y")),
        "ctl_id",
    )
    ev = ctly.select(
        "score",
        F.lit(None).cast("long").alias("t_id"),
        F.lit(None).cast("decimal(28,2)").alias("t_y"),
        "ctl_y",
        F.lit(0).alias("is_t"),
    ).unionByName(
        cust.filter(F.col("c_mktsegment") == "BUILDING").select(
            "score",
            F.col("c_custkey").alias("t_id"),
            F.col("y").alias("t_y"),
            F.lit(None).cast("decimal(28,2)").alias("ctl_y"),
            F.lit(1).alias("is_t"),
        )
    )
    scan = _nn_bucketed_scan(ev, ["ctl_y"]).select(
        "*",
        F.col("lo_ctl_y").alias("lo_y"),
        F.col("hi_ctl_y").alias("hi_y"),
    )
    lo_gap = F.col("score") - F.col("lo_s")
    hi_gap = F.col("hi_s") - F.col("score")
    prefer_lo = F.col("hi_s").isNull() | (
        F.col("lo_s").isNotNull() & (lo_gap <= hi_gap)
    )
    matched = scan.select(
        "t_id",
        "t_y",
        F.when(prefer_lo, F.col("lo_y")).otherwise(F.col("hi_y")).alias("m_y"),
        F.when(prefer_lo, lo_gap).otherwise(hi_gap).alias("gap"),
    )
    kept = matched.filter(F.col("gap") <= _PSM_CALIPER)
    nt = matched.agg(F.count(F.lit(1)).cast("long").alias("n_treated"))
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        F.round(
            F.sum((F.col("t_y") - F.col("m_y")).cast("decimal(28,2)")).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("att"),
        F.round(
            F.sum("gap").cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_score_gap"),
    ).crossJoin(F.broadcast(nt)).select(
        "n_treated", "n_matched", "att", "mean_score_gap"
    )


@query(
    "q_treatment_balance_smd",
    oracle=f"""
WITH cust AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_acctbal AS DECIMAL(18,2)) AS score,
         CAST(count(o.o_orderkey) AS DECIMAL(18,2)) AS nord
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c.c_custkey, c.c_mktsegment, c.c_acctbal
),
ctl AS (
  SELECT score, min(c_custkey) AS ctl_id
  FROM cust WHERE c_mktsegment = 'MACHINERY' GROUP BY score
),
ctlx AS (
  SELECT l.score, c.nord AS ctl_ord
  FROM ctl l JOIN cust c ON c.c_custkey = l.ctl_id
),
ev AS (
  SELECT score, NULL AS t_id, CAST(NULL AS DECIMAL(18,2)) AS t_ord,
         ctl_ord, 0 AS is_t
  FROM ctlx
  UNION ALL
  SELECT score, c_custkey AS t_id, nord AS t_ord,
         NULL, 1 AS is_t
  FROM cust WHERE c_mktsegment = 'BUILDING'
),
scan AS (
  SELECT *,
         last_value(CASE WHEN is_t = 0 THEN score END IGNORE NULLS)
           OVER wb AS lo_s,
         last_value(CASE WHEN is_t = 0 THEN ctl_ord END IGNORE NULLS)
           OVER wb AS lo_o,
         first_value(CASE WHEN is_t = 0 THEN score END IGNORE NULLS)
           OVER wf AS hi_s,
         first_value(CASE WHEN is_t = 0 THEN ctl_ord END IGNORE NULLS)
           OVER wf AS hi_o
  FROM ev
  WINDOW wb AS (ORDER BY score, is_t, t_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (ORDER BY score, is_t, t_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
matched AS (
  SELECT score AS t_s, t_ord,
         CASE WHEN hi_s IS NULL THEN lo_s
              WHEN lo_s IS NULL THEN hi_s
              WHEN score - lo_s <= hi_s - score THEN lo_s ELSE hi_s END AS m_s,
         CASE WHEN hi_s IS NULL THEN lo_o
              WHEN lo_s IS NULL THEN hi_o
              WHEN score - lo_s <= hi_s - score THEN lo_o ELSE hi_o END AS m_o,
         CASE WHEN hi_s IS NULL THEN score - lo_s
              WHEN lo_s IS NULL THEN hi_s - score
              WHEN score - lo_s <= hi_s - score
                THEN score - lo_s ELSE hi_s - score END AS gap
  FROM scan WHERE is_t = 1
),
kept AS (SELECT * FROM matched WHERE gap <= {_PSM_CALIPER}),
stats AS (
  SELECT cohort, covariate,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS DOUBLE) / count(*) AS mu,
         (CAST(sum(x * x) AS DOUBLE)
          - count(*) * (CAST(sum(x) AS DOUBLE) / count(*))
                     * (CAST(sum(x) AS DOUBLE) / count(*)))
           / (count(*) - 1) AS v
  FROM (
    SELECT 'tb' AS cohort, 'score' AS covariate, score AS x
    FROM cust WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'tb', 'n_orders', nord FROM cust WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT 'cb', 'score', score FROM cust WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT 'cb', 'n_orders', nord FROM cust WHERE c_mktsegment = 'MACHINERY'
    UNION ALL
    SELECT 'ta', 'score', t_s FROM kept
    UNION ALL
    SELECT 'ta', 'n_orders', t_ord FROM kept
    UNION ALL
    SELECT 'ma', 'score', m_s FROM kept
    UNION ALL
    SELECT 'ma', 'n_orders', m_o FROM kept
  )
  GROUP BY cohort, covariate
)
SELECT tb.covariate,
       round((tb.mu - cb.mu) / sqrt((tb.v + cb.v) / 2), 6) AS smd_before,
       round((ta.mu - ma.mu) / sqrt((ta.v + ma.v) / 2), 6) AS smd_after,
       round(tb.v / cb.v, 6) AS var_ratio_before,
       round(ta.v / ma.v, 6) AS var_ratio_after,
       ta.n AS n_matched
FROM stats tb
JOIN stats cb ON cb.covariate = tb.covariate AND cb.cohort = 'cb'
JOIN stats ta ON ta.covariate = tb.covariate AND ta.cohort = 'ta'
JOIN stats ma ON ma.covariate = tb.covariate AND ma.cohort = 'ma'
WHERE tb.cohort = 'tb'
ORDER BY tb.covariate
""",
    tags=("stats", "causal", "matching", "diagnostic"),
)
def q_treatment_balance_smd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COVARIATE BALANCE DIAGNOSTIC for the matching estimator —
    standardized mean differences (Rosenbaum & Rubin's |SMD| < 0.1
    rule) and variance ratios, BEFORE (raw BUILDING vs MACHINERY
    cohorts) and AFTER nearest-neighbor matching, for the balancing
    score and the pre-treatment activity covariate (order count).
    This is the table that decides whether q_propensity_att's ATT is
    readable at all: matching is only as good as the balance it buys.

    Reuses the SHARED two-level bucketed as-of fill
    (_nn_bucketed_scan — the q_propensity_att machinery, carrying the
    matched control's covariates instead of its outcome), so the
    matched multiset here is exactly the estimator's. Moments fold as
    DECIMAL sums (x and x^2 exact), variances/SMDs are a handful of
    double ops over them; one user-keyed aggregate and the bucketed
    scan are the only input-sized work."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = _t(spark, sf_dir, "orders")
    cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment", "c_acctbal")
        .agg(F.count("o_orderkey").cast("decimal(18,2)").alias("nord"))
        .select(
            "c_custkey",
            "c_mktsegment",
            dec(F.col("c_acctbal")).alias("score"),
            "nord",
        )
    )
    ctl = (
        cust.filter(F.col("c_mktsegment") == "MACHINERY")
        .groupBy("score")
        .agg(F.min("c_custkey").alias("ctl_id"))
    )
    ctlx = ctl.join(
        cust.select(
            F.col("c_custkey").alias("ctl_id"), F.col("nord").alias("ctl_ord")
        ),
        "ctl_id",
    )
    ev = ctlx.select(
        "score",
        F.lit(None).cast("long").alias("t_id"),
        F.lit(None).cast("decimal(18,2)").alias("t_ord"),
        "ctl_ord",
        F.lit(0).alias("is_t"),
    ).unionByName(
        cust.filter(F.col("c_mktsegment") == "BUILDING").select(
            "score",
            F.col("c_custkey").alias("t_id"),
            F.col("nord").alias("t_ord"),
            F.lit(None).cast("decimal(18,2)").alias("ctl_ord"),
            F.lit(1).alias("is_t"),
        )
    )
    scan = _nn_bucketed_scan(ev, ["ctl_ord"])
    lo_gap = F.col("score") - F.col("lo_s")
    hi_gap = F.col("hi_s") - F.col("score")
    prefer_lo = F.col("hi_s").isNull() | (
        F.col("lo_s").isNotNull() & (lo_gap <= hi_gap)
    )
    matched = scan.select(
        F.col("score").alias("t_s"),
        "t_ord",
        F.when(prefer_lo, F.col("lo_s")).otherwise(F.col("hi_s")).alias("m_s"),
        F.when(prefer_lo, F.col("lo_ctl_ord"))
        .otherwise(F.col("hi_ctl_ord"))
        .alias("m_o"),
        F.when(prefer_lo, lo_gap).otherwise(hi_gap).alias("gap"),
    )
    kept = matched.filter(F.col("gap") <= _PSM_CALIPER)

    rows = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.lit("tb").alias("cohort"), F.lit("score").alias("covariate"), F.col("score").alias("x"))
        .unionByName(
            cust.filter(F.col("c_mktsegment") == "BUILDING").select(
                F.lit("tb").alias("cohort"), F.lit("n_orders").alias("covariate"), F.col("nord").alias("x")
            )
        )
        .unionByName(
            cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
                F.lit("cb").alias("cohort"), F.lit("score").alias("covariate"), F.col("score").alias("x")
            )
        )
        .unionByName(
            cust.filter(F.col("c_mktsegment") == "MACHINERY").select(
                F.lit("cb").alias("cohort"), F.lit("n_orders").alias("covariate"), F.col("nord").alias("x")
            )
        )
        .unionByName(
            kept.select(F.lit("ta").alias("cohort"), F.lit("score").alias("covariate"), F.col("t_s").alias("x"))
        )
        .unionByName(
            kept.select(F.lit("ta").alias("cohort"), F.lit("n_orders").alias("covariate"), F.col("t_ord").alias("x"))
        )
        .unionByName(
            kept.select(F.lit("ma").alias("cohort"), F.lit("score").alias("covariate"), F.col("m_s").alias("x"))
        )
        .unionByName(
            kept.select(F.lit("ma").alias("cohort"), F.lit("n_orders").alias("covariate"), F.col("m_o").alias("x"))
        )
    )
    n = F.count(F.lit(1))
    sx = F.sum("x").cast("double")
    sx2 = F.sum(F.col("x") * F.col("x")).cast("double")
    stats = rows.groupBy("cohort", "covariate").agg(
        n.cast("long").alias("n"),
        (sx / n).alias("mu"),
        ((sx2 - n * (sx / n) * (sx / n)) / (n - 1)).alias("v"),
    )

    def coh(tag):
        return (
            stats.filter(F.col("cohort") == tag)
            .select(
                "covariate",
                F.col("n").alias(f"n_{tag}"),
                F.col("mu").alias(f"mu_{tag}"),
                F.col("v").alias(f"v_{tag}"),
            )
        )

    j = (
        coh("tb")
        .join(coh("cb"), "covariate")
        .join(coh("ta"), "covariate")
        .join(coh("ma"), "covariate")
    )
    return j.select(
        "covariate",
        F.round(
            (F.col("mu_tb") - F.col("mu_cb"))
            / F.sqrt((F.col("v_tb") + F.col("v_cb")) / 2),
            6,
        ).alias("smd_before"),
        F.round(
            (F.col("mu_ta") - F.col("mu_ma"))
            / F.sqrt((F.col("v_ta") + F.col("v_ma")) / 2),
            6,
        ).alias("smd_after"),
        F.round(F.col("v_tb") / F.col("v_cb"), 6).alias("var_ratio_before"),
        F.round(F.col("v_ta") / F.col("v_ma"), 6).alias("var_ratio_after"),
        F.col("n_ta").alias("n_matched"),
    ).orderBy("covariate")


_QR_TAU = "0.90"  # pinball quantile level (exact DECIMAL both engines)
# grid/histogram sizing lives with the model step so the oracle and
# the engine can never drift apart
from cdc_via_flink_spark.operators.quantreg import (  # noqa: E402
    _QR_BUCKETS,  # noqa: F401  (re-exported for tests/pins)
    _QR_STEPS,
)


@query(
    "q_quantile_regression",
    bench3=True,
    oracle=f"""
WITH d AS (
  SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(18,2)) AS y
  FROM lineitem
),
b AS (
  SELECT CAST(round(CAST(sum(y) AS DOUBLE) / CAST(sum(x) AS DOUBLE) * 2, 2)
              AS DECIMAL(10,2)) AS smax,
         CAST(count(*) AS BIGINT) AS n
  FROM d
),
slopes AS (
  SELECT CAST(round(CAST((SELECT smax FROM b) AS DOUBLE) * g / {_QR_STEPS}.0,
              2) AS DECIMAL(10,2)) AS s
  FROM generate_series(0, {_QR_STEPS}) t(g)
),
resid AS MATERIALIZED (
  SELECT s.s, d.y - s.s * d.x AS r
  FROM d CROSS JOIN slopes s
),
ranked AS (
  SELECT s, r, row_number() OVER (PARTITION BY s ORDER BY r) AS rn
  FROM resid
),
agg AS (
  SELECT s,
         max(CASE WHEN rn <= (SELECT (9 * n + 9) // 10 FROM b)
                  THEN r END) AS q,
         sum(CASE WHEN rn <= (SELECT (9 * n + 9) // 10 FROM b)
                  THEN r END) AS s_lo,
         coalesce(sum(CASE WHEN rn > (SELECT (9 * n + 9) // 10 FROM b)
                           THEN r END), 0) AS s_hi
  FROM ranked GROUP BY s
),
loss AS (
  -- pinball decomposes over the rank split (ties at q contribute 0
  -- under either branch): tau*(S_hi - (n-k)q) + (1-tau)*(kq - S_lo)
  SELECT s, q,
         CAST({_QR_TAU} AS DECIMAL(3,2))
           * (s_hi - ((SELECT n FROM b) - (SELECT (9 * n + 9) // 10 FROM b)) * q)
         + CAST(1 - {_QR_TAU} AS DECIMAL(3,2))
           * ((SELECT (9 * n + 9) // 10 FROM b) * q - s_lo) AS pl
  FROM agg
)
SELECT CAST({_QR_TAU} AS DOUBLE) AS tau,
       CAST(s AS DOUBLE) AS slope,
       CAST(q AS DOUBLE) AS intercept,
       round(CAST(pl AS DOUBLE) / (SELECT n FROM b), 6) AS avg_pinball
FROM loss
ORDER BY pl, s
LIMIT 1
""",
    tags=("stats", "regression", "quantile"),
)
def q_quantile_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE REGRESSION (tau = 0.9) of extended price on quantity
    by exact grid search: 21 candidate slopes span [0, 2*(sum y /
    sum x)]; for each, the pinball-OPTIMAL intercept in closed form —
    the tau-quantile of the residuals (an exact order statistic, no
    interpolation) — then the total pinball loss picks the winner.
    The p90 price-per-unit frontier that OLS (q_ols_two_feature)
    cannot see: it prices the upper tail, not the mean.

    Scale shape (the two-level bucketed-histogram quantile — the 100x
    path the r10 docstring promised, now the implementation; r11:
    19.7 s -> 4.9 s at sf0.1, 3x scaling exponent 0.28): instead of 21
    parallel full-ranking sorts (a 21n-row shuffle), residuals are
    range-bucketed into _QR_BUCKETS monotone buckets per slope with
    per-(slope, bucket) count + exact-DECIMAL sum — a map-side-
    combinable hash aggregate whose shuffle is 21 x _QR_BUCKETS rows
    REGARDLESS of n. The rank-k bucket is located on that tiny frame
    (cumulative window over _QR_BUCKETS rows per slope); only the rows
    inside the target bucket (~n/_QR_BUCKETS per slope) are re-scanned
    and ranked to extract the exact order statistic q. Bucket bounds
    come from the global x/y envelope (model-sized 1-row collect,
    shared by all slopes: r in [min_y - s*max_x, max_y - s*min_x] for
    s >= 0, x > 0); the slope grid is evaluated by Spark on a local
    frame and exploded as a LITERAL array in the big passes (a
    BroadcastNestedLoopJoin measured 4x slower than explode). The
    double bucket id is MONOTONE in r, so lower buckets hold strictly
    smaller residuals and the pinball terms reconstruct exactly:
    S_lo = sum_below + (in-bucket prefix sum over rank <= k-cnt_below)
    (ties at q are interchangeable), S_hi = total - S_lo — every sum
    an exact DECIMAL fold, so both engines agree bit-for-bit with the
    oracle's full-sort formulation; the only doubles are the data-
    driven grid bound, the bucket id (a partitioner, never a value),
    and the final display casts. The argmin runs on the 21-row loss
    table. Two full scans total, each at ensure_min_partitions
    parallelism."""
    from cdc_via_flink_spark.operators.quantreg import pinball_grid_argmin
    from cdc_via_flink_spark.sources.tables import ensure_min_partitions

    li = ensure_min_partitions(
        _t(spark, sf_dir, "lineitem").select(
            F.col("l_quantity").cast("decimal(18,2)").alias("x"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
        )
    )
    return pinball_grid_argmin(spark, li)


_HOLT_WINDOW = 24  # trailing months fitted
_HOLT_H = 3  # forecast horizon


def _holt_oracle() -> str:
    steps = []
    for t in range(2, _HOLT_WINDOW + 1):
        steps.append(f"""
st{t} AS MATERIALIZED (
  SELECT q.l,
         CAST(round(0.10 * (q.l - q.pl) + 0.90 * q.pb, 6)
              AS DECIMAL(28,6)) AS b
  FROM (
    SELECT CAST(round(0.30 * s.y + 0.70 * (p.l + p.b), 6)
                AS DECIMAL(28,6)) AS l,
           p.l AS pl, p.b AS pb
    FROM st{t - 1} p
    CROSS JOIN (SELECT y FROM ser WHERE t = {t}) s
  ) q
)""")
    return f"""
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS mo,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,6)) AS y
  FROM orders GROUP BY date_trunc('month', o_orderdate)
),
idx AS (
  SELECT mo, y, row_number() OVER (ORDER BY mo DESC) AS rd FROM m
),
ser AS MATERIALIZED (
  SELECT {_HOLT_WINDOW + 1} - rd AS t, y FROM idx WHERE rd <= {_HOLT_WINDOW}
),
st1 AS MATERIALIZED (
  SELECT a.y AS l, CAST(b.y - a.y AS DECIMAL(28,6)) AS b
  FROM (SELECT y FROM ser WHERE t = 1) a
  CROSS JOIN (SELECT y FROM ser WHERE t = 2) b
),{",".join(steps)}
SELECT h,
       round(CAST(s.l + h * s.b AS DOUBLE), 2) AS forecast,
       round(CAST(s.l AS DOUBLE), 2) AS level,
       round(CAST(s.b AS DOUBLE), 2) AS trend
FROM st{_HOLT_WINDOW} s
CROSS JOIN (SELECT unnest([1, 2, 3]) AS h) hs
ORDER BY h
"""


@query(
    "q_holt_forecast",
    oracle=_holt_oracle(),
    tags=("stats", "forecast", "iterative-unrolled"),
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT LINEAR-TREND FORECAST (double exponential smoothing,
    a = 0.30, g = 0.10) of monthly revenue over the trailing 24
    months, horizons 1-3 — the trend-aware member of the forecasting
    family (q_forecast_revenue_change is seasonal-naive,
    q_forecast_mase scores them; Holt extrapolates drift both miss).

    Scale/parity shape: the month aggregate is the only input-sized
    work (one shuffle); the recurrence is inherently SEQUENTIAL over
    the bounded 24-point grid, so the series is collected once and
    folded in exact driver-side DECIMAL (operators/forecast.py — the
    markov/kmeans model-sized precedent) while the oracle chains 23
    MATERIALIZED CTEs through the identical exact arithmetic: DECIMAL
    coefficient products with one half-up round to 6 dp per step, so
    all three implementations agree bit-for-bit."""
    from cdc_via_flink_spark.operators.forecast import holt_forecast_frame

    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("mo"))
        .agg(
            F.sum(dec(F.col("o_totalprice"))).cast("decimal(28,6)").alias("y")
        )
        .orderBy(F.col("mo").desc())
        .limit(_HOLT_WINDOW)
    )
    return holt_forecast_frame(spark, m, _HOLT_H)


# SPRT (Wald 1945) of conversion rate: H0 p=0.18 vs H1 p=0.22,
# alpha = beta = 0.05. Log-likelihood-ratio increments and thresholds
# precomputed and inlined as identical 12-dp DECIMAL literals.
_SPRT_INC_S = "0.200670695462"  # ln(p1/p0)
_SPRT_INC_F = "-0.050010420575"  # ln((1-p1)/(1-p0))
_SPRT_A = "2.944438979166"  # ln((1-beta)/alpha): accept H1 at/above
_SPRT_B = "-2.944438979166"  # ln(beta/(1-alpha)): accept H0 at/below


@query(
    "q_sprt_monitor",
    oracle=f"""
WITH trials AS (
  SELECT CAST(ts AS DATE) AS d, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST({_SPRT_INC_S} AS DECIMAL(18,12))
              ELSE CAST({_SPRT_INC_F} AS DECIMAL(18,12)) END AS inc
  FROM events
),
daily AS (
  SELECT d, CAST(sum(inc) AS DECIMAL(28,12)) AS day_sum,
         CAST(count(*) AS BIGINT) AS day_n
  FROM trials GROUP BY d
),
dayoff AS MATERIALIZED (
  SELECT d,
         CAST(coalesce(sum(day_sum) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DECIMAL(28,12)) AS off_sum,
         CAST(coalesce(sum(day_n) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off_n
  FROM daily
),
cum AS (
  SELECT t.ts, t.event_id,
         CAST(o.off_sum + sum(t.inc) OVER (PARTITION BY t.d
                ORDER BY t.ts, t.event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS DECIMAL(28,12)) AS llr,
         o.off_n + row_number() OVER (PARTITION BY t.d
                ORDER BY t.ts, t.event_id) AS n
  FROM trials t JOIN dayoff o ON t.d = o.d
),
crossing AS (
  SELECT *, CASE WHEN llr >= {_SPRT_A} THEN 'accept_h1'
                 ELSE 'accept_h0' END AS decision
  FROM cum
  WHERE llr >= {_SPRT_A} OR llr <= {_SPRT_B}
  ORDER BY ts, event_id LIMIT 1
),
final AS (
  SELECT 'continue' AS decision, max(n) AS n, NULL AS llr_at
  FROM cum
)
SELECT decision, CAST(n AS BIGINT) AS n_at_decision,
       round(CAST(llr AS DOUBLE), 6) AS llr
FROM crossing
UNION ALL
SELECT f.decision, f.n, CAST(NULL AS DOUBLE)
FROM final f WHERE NOT EXISTS (SELECT 1 FROM crossing)
""",
    tags=("stats", "sequential-test", "sprt"),
)
def q_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD SPRT MONITOR of the event-level conversion rate — the
    always-valid sequential counterpart to q_ab_test_proportions'
    fixed-n test: each event adds an inlined-constant log-likelihood
    increment (purchase vs not, H0 p=0.18 vs H1 p=0.22), and the
    FIRST threshold crossing (ln 19 at alpha=beta=0.05) decides;
    peeking is free by construction. Returns the decision, the trial
    count at decision, and the LLR there.

    Scale shape: the global ordered cumulative sum uses the TWO-LEVEL
    prefix recipe (the KS/matching pattern): per-DAY partial cumsums
    run day-keyed (parallel), day offsets cross through one window on
    the bounded calendar grid — no input-sized single-partition scan.
    Increments are 12-dp DECIMAL literals identical in both engines;
    every cumulative value is an exact decimal sum, so the crossing
    row is bit-deterministic."""
    e = _t(spark, sf_dir, "events")
    inc_s = F.expr(f"CAST({_SPRT_INC_S} AS DECIMAL(18,12))")
    inc_f = F.expr(f"CAST({_SPRT_INC_F} AS DECIMAL(18,12))")
    trials = e.select(
        F.col("ts").cast("date").alias("d"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", inc_s)
        .otherwise(inc_f)
        .alias("inc"),
    )
    daily = trials.groupBy("d").agg(
        F.sum("inc").cast("decimal(28,12)").alias("day_sum"),
        F.count(F.lit(1)).cast("long").alias("day_n"),
    )
    wday = W.orderBy("d").rowsBetween(W.unboundedPreceding, -1)
    dayoff = daily.select(
        "d",
        F.coalesce(F.sum("day_sum").over(wday), F.lit(0))
        .cast("decimal(28,12)")
        .alias("off_sum"),
        F.coalesce(F.sum("day_n").over(wday), F.lit(0))
        .cast("long")
        .alias("off_n"),
    )
    win = W.partitionBy("d").orderBy("ts", "event_id")
    cum = trials.join(F.broadcast(dayoff), "d").select(
        "ts",
        "event_id",
        (
            F.col("off_sum")
            + F.sum("inc").over(win.rowsBetween(W.unboundedPreceding, 0))
        )
        .cast("decimal(28,12)")
        .alias("llr"),
        (F.col("off_n") + F.row_number().over(win)).alias("n"),
    )
    a = F.expr(f"CAST({_SPRT_A} AS DECIMAL(28,12))")
    b = F.expr(f"CAST({_SPRT_B} AS DECIMAL(28,12))")
    crossing = (
        cum.filter((F.col("llr") >= a) | (F.col("llr") <= b))
        .orderBy("ts", "event_id")
        .limit(1)
        .select(
            F.when(F.col("llr") >= a, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
            F.col("n").cast("long").alias("n_at_decision"),
            F.round(F.col("llr").cast("double"), 6).alias("llr"),
        )
    )
    final = cum.agg(F.max("n").cast("long").alias("n")).select(
        F.lit("continue").alias("decision"),
        F.col("n").alias("n_at_decision"),
        F.lit(None).cast("double").alias("llr"),
    )
    has = crossing.agg(F.count(F.lit(1)).alias("k"))
    return crossing.unionByName(
        final.crossJoin(F.broadcast(has)).filter(F.col("k") == 0).drop("k")
    )


# Two-sided alpha=0.05, power=0.80 normal quantiles, inlined
_MDE_ZA = "1.959964"
_MDE_ZB = "0.841621"


@query(
    "q_mde_power",
    oracle=f"""
WITH per_cust AS (
  SELECT c.c_mktsegment, c.c_custkey,
         CASE WHEN count(o.o_orderkey) >= 2 THEN 1 ELSE 0 END AS conv
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
),
seg AS (
  SELECT c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM per_cust GROUP BY c_mktsegment
)
SELECT segment, n_users,
       round(CAST(n_conv AS DOUBLE) / n_users, 6) AS base_rate,
       round(({_MDE_ZA} + {_MDE_ZB})
             * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / n_users)
                        * (1.0 - CAST(n_conv AS DOUBLE) / n_users)
                        / (CAST(n_users AS DOUBLE) / 2)), 6) AS mde_abs,
       round(({_MDE_ZA} + {_MDE_ZB})
             * sqrt(2.0 * (CAST(n_conv AS DOUBLE) / n_users)
                        * (1.0 - CAST(n_conv AS DOUBLE) / n_users)
                        / (CAST(n_users AS DOUBLE) / 2))
             / (CAST(n_conv AS DOUBLE) / n_users), 6) AS mde_rel
FROM seg
ORDER BY segment
""",
    tags=("stats", "experiment-design", "power"),
)
def q_mde_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MINIMUM DETECTABLE EFFECT / POWER TABLE per market segment —
    the experiment-DESIGN face of the testing family
    (q_ab_test_proportions evaluates a finished test; this sizes the
    next one): with each segment's users split into two equal arms
    and its observed repeat-purchase base rate, the smallest absolute
    and relative lift detectable at alpha=0.05 / power=0.80
    (two-proportion z formula; normal quantiles inlined as identical
    literals — no cross-engine quantile functions).

    One customer-keyed aggregate then segment-sized arithmetic; exact
    integer counts feed a handful of identical double ops."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.when(F.count("o_orderkey") >= 2, 1).otherwise(0).alias("conv")
        )
    )
    seg = per_cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").cast("long").alias("n_conv"),
    )
    p = F.col("n_conv").cast("double") / F.col("n_users")
    z = float(_MDE_ZA) + float(_MDE_ZB)
    mde = F.lit(z) * F.sqrt(
        2.0 * p * (1.0 - p) / (F.col("n_users").cast("double") / 2)
    )
    return seg.select(
        "segment",
        "n_users",
        F.round(p, 6).alias("base_rate"),
        F.round(mde, 6).alias("mde_abs"),
        F.round(mde / p, 6).alias("mde_rel"),
    ).orderBy("segment")


def _pacf_oracle() -> str:
    levels = []
    for k in range(2, _ACF_MAX_LAG + 1):
        levels.append(f"""
nd{k} AS (
  SELECT CAST((SELECT rho FROM rho WHERE lag = {k}) AS DOUBLE)
           - CAST(coalesce(sum(v.phi * r.rho), 0) AS DOUBLE) AS num,
         1.0 - CAST(coalesce(sum(v.phi * r2.rho), 0) AS DOUBLE) AS den
  FROM v{k - 1} v
  JOIN rho r ON r.lag = {k} - v.j
  JOIN rho r2 ON r2.lag = v.j
),
kk{k} AS (
  SELECT CAST(round(num / den, 12) AS DECIMAL(14,12)) AS phi FROM nd{k}
),
v{k} AS MATERIALIZED (
  SELECT v.j,
         CAST(round(v.phi - (SELECT phi FROM kk{k}) * v2.phi, 12)
              AS DECIMAL(14,12)) AS phi
  FROM v{k - 1} v JOIN v{k - 1} v2 ON v2.j = {k} - v.j
  UNION ALL SELECT {k} AS j, phi FROM kk{k}
),
p{k} AS (SELECT {k} AS lag, (SELECT phi FROM kk{k}) AS pacf)""")
    finals = " UNION ALL ".join(
        ["SELECT 1 AS lag, (SELECT phi FROM v1 WHERE j = 1) AS pacf"]
        + [f"SELECT lag, pacf FROM p{k}" for k in range(2, _ACF_MAX_LAG + 1)]
    )
    return f"""
WITH {_ACF_PAIRS_SQL},
rho AS MATERIALIZED (
  SELECT p.lag, CAST(round({_ACF_RAW_SQL}, 12) AS DECIMAL(14,12)) AS rho
  FROM pairs p CROSS JOIN base
),
v1 AS MATERIALIZED (
  SELECT 1 AS j, (SELECT rho FROM rho WHERE lag = 1) AS phi
),{",".join(levels)},
allp AS ({finals})
SELECT CAST(a.lag AS INT) AS lag,
       round(CAST(r.rho AS DOUBLE), 6) AS acf,
       round(CAST(a.pacf AS DOUBLE), 6) AS pacf
FROM allp a JOIN rho r ON r.lag = a.lag
ORDER BY a.lag
"""


@query(
    "q_pacf_revenue",
    oracle=_pacf_oracle(),
    tags=("stats", "timeseries", "pacf", "iterative-unrolled"),
)
def q_pacf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL AUTOCORRELATION FUNCTION of monthly revenue at lags
    1..6 by the DURBIN-LEVINSON recursion — with q_acf_revenue it
    completes the Box-Jenkins identification pair (ACF tails/PACF
    cuts => AR order; the reverse => MA order). Shares the ACF
    closed-form moments (_acf_raw, rounded to 12 dp as the rho
    input); the recursion is MODEL-sized (6 rho values), so it folds
    in exact driver-side DECIMAL (operators/forecast.pacf_frame —
    the holt/markov precedent) while the oracle chains the identical
    levels as MATERIALIZED CTEs: exact DECIMAL vector updates, ONE
    double divide per level rounded half-up to 12 dp. The only
    input-sized work is the month aggregate."""
    from cdc_via_flink_spark.operators.forecast import pacf_frame

    rho = _acf_raw(spark, sf_dir).select(
        "lag",
        F.round(F.col("acf_raw"), 12).cast("decimal(14,12)").alias("rho"),
    )
    return pacf_frame(spark, rho, _ACF_MAX_LAG)


_W1_BUCKET = 1000.0  # order-value bin width (price units)


@query(
    "q_wasserstein_1d",
    oracle=f"""
WITH d AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice / {_W1_BUCKET}) AS BIGINT) AS b
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
counts AS (
  SELECT b,
         CAST(count(*) FILTER (seg = 'BUILDING') AS BIGINT) AS c1,
         CAST(count(*) FILTER (seg = 'MACHINERY') AS BIGINT) AS c2
  FROM d GROUP BY b
),
tot AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2
  FROM counts
),
cum AS (
  SELECT b,
         CAST(sum(c1) OVER (ORDER BY b) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (ORDER BY b) AS BIGINT) AS f2
  FROM counts
),
-- EMD over the bin grid: sum |F1 - F2| * width, with the cdf gap as
-- the EXACT integer |f1*n2 - f2*n1| scaled once at the end
agg AS (
  SELECT CAST(sum(abs(f1 * t.n2 - f2 * t.n1)) AS DOUBLE) AS s,
         max(t.n1) AS n1, max(t.n2) AS n2,
         CAST(count(*) AS BIGINT) AS n_bins
  FROM cum CROSS JOIN tot t
)
SELECT n_bins, n1, n2,
       round(s * {_W1_BUCKET} / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
         AS wasserstein_1d
FROM agg
""",
    tags=("stats", "distribution-distance", "wasserstein"),
)
def q_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D WASSERSTEIN (earth mover's) DISTANCE between the BUILDING
    and MACHINERY order-value distributions, on a fixed 1000-unit bin
    grid — the magnitude-aware member of the distance family
    (q_ks_two_sample reports the worst POINT gap, q_psi_drift a
    log-ratio, q_energy_distance a kernel form; W1 integrates the
    whole cdf gap in price units, so a small shift of much mass and a
    large shift of little mass are told apart).

    Exactness: EMD = sum_bins |F1-F2| * width with the cdf gap kept
    as the EXACT INTEGER |f1*n2 - f2*n1| (no per-bin divides); ONE
    double scaling at the end — zero float-boundary risk. Scale
    shape: one groupBy onto the bounded bin grid; the cumulative
    windows run on grid-sized rows (the week-grid argument).
    Binning is the documented approximation: W1 error is bounded by
    the bin width."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    d = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") / _W1_BUCKET).cast("long").alias("b"),
    )
    is1 = F.col("seg") == "BUILDING"
    counts = d.groupBy("b").agg(
        F.count(F.when(is1, 1)).cast("long").alias("c1"),
        F.count(F.when(~is1, 1)).cast("long").alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    cum = counts.select(
        "b",
        F.sum("c1").over(W.orderBy("b")).cast("long").alias("f1"),
        F.sum("c2").over(W.orderBy("b")).cast("long").alias("f2"),
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(F.abs(F.col("f1") * F.col("n2") - F.col("f2") * F.col("n1")))
        .cast("double")
        .alias("s"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    return agg.select(
        "n_bins",
        "n1",
        "n2",
        F.round(
            F.col("s")
            * _W1_BUCKET
            / (F.col("n1").cast("double") * F.col("n2").cast("double")),
            6,
        ).alias("wasserstein_1d"),
    )


# R-squared decompositions share the OLS moment frame; one formula
# text feeds BOTH engines (the _OLS_DETS recipe).
_R2S = {
    "r2_full": "1.0 - (syy - (({det0})/({det}))*sy - (({det1})/({det}))*s1y"
    " - (({det2})/({det}))*s2y) / (syy - sy*sy/nn)".format(**_OLS_DETS),
    "r2_x1": "((nn*s1y - s1*sy)*(nn*s1y - s1*sy))"
    " / ((nn*s11 - s1*s1) * (nn*syy - sy*sy))",
    "r2_x2": "((nn*s2y - s2*sy)*(nn*s2y - s2*sy))"
    " / ((nn*s22 - s2*s2) * (nn*syy - sy*sy))",
}
_R2_SHAPLEY_EXPRS = [
    f"round({_R2S['r2_full']}, 6) AS r2_full",
    f"round(0.5*({_R2S['r2_x1']}) + 0.5*(({_R2S['r2_full']}) - ({_R2S['r2_x2']})), 6) AS phi_items",
    f"round(0.5*({_R2S['r2_x2']}) + 0.5*(({_R2S['r2_full']}) - ({_R2S['r2_x1']})), 6) AS phi_quantity",
    f"round((0.5*({_R2S['r2_x1']}) + 0.5*(({_R2S['r2_full']}) - ({_R2S['r2_x2']}))) / ({_R2S['r2_full']}), 6) AS share_items",
    f"round((0.5*({_R2S['r2_x2']}) + 0.5*(({_R2S['r2_full']}) - ({_R2S['r2_x1']}))) / ({_R2S['r2_full']}), 6) AS share_quantity",
]
_R2_SHAPLEY_OUT = ", ".join(_R2_SHAPLEY_EXPRS)


@query(
    "q_r2_shapley_decomposition",
    oracle=f"""
WITH f AS (
  SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS x1,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT f.x1, f.x2, CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
  FROM f JOIN orders o ON o.o_orderkey = f.ok
),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(x1) AS DOUBLE) AS s1,
         CAST(sum(x2) AS DOUBLE) AS s2,
         CAST(sum(x1 * x1) AS DOUBLE) AS s11,
         CAST(sum(x1 * x2) AS DOUBLE) AS s12,
         CAST(sum(x2 * x2) AS DOUBLE) AS s22,
         CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(x1 * y) AS DOUBLE) AS s1y,
         CAST(sum(x2 * y) AS DOUBLE) AS s2y,
         CAST(sum(CAST(y AS DECIMAL(19,2)) * y) AS DOUBLE) AS syy
  FROM j
)
SELECT CAST(nn AS BIGINT) AS n, {_R2_SHAPLEY_OUT}
FROM m
""",
    tags=("stats", "regression", "explainability", "shapley"),
)
def q_r2_shapley_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHAPLEY DECOMPOSITION OF R^2 (Lindeman-Merenda-Gold / Shapley
    regression importance) for the two-feature OLS — for linear
    models the game v(S) = R^2 of the S-feature fit has CLOSED-FORM
    coalition values from the same nine moments, so each feature's
    exact Shapley share of explained variance needs no refits:
    phi_i = (R2_i + R2_full - R2_other)/2, phi_1 + phi_2 = R2_full by
    construction. The global-explainability answer to "which feature
    carries the model" that raw betas (scale-dependent) and marginal
    R^2s (correlation-confounded) both get wrong.

    Scale/parity: the q_ols_two_feature recipe end-to-end — ONE
    map-side-combinable aggregation to ten exact numbers, every
    output expression a SHARED formula text evaluated identically by
    both engines on the one-row moment frame."""
    li = _t(spark, sf_dir, "lineitem")
    f = li.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).cast("long").alias("x1"),
        F.sum(F.col("l_quantity").cast("long")).cast("long").alias("x2"),
    )
    o = _t(spark, sf_dir, "orders")
    j = f.join(o, f.ok == o.o_orderkey).select(
        "x1", "x2", dec(F.col("o_totalprice")).alias("y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("s2y"),
        F.sum(F.col("y").cast("decimal(19,2)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    return m.selectExpr("CAST(nn AS BIGINT) AS n", *_R2_SHAPLEY_EXPRS)


_GMM_ITERS = 3
# A/B flag (VERDICT r12 #2): True = single-explode tail (r12), False =
# c1/c2 union tail (r11). Flipped only by the interleaved A/B harness;
# ships at the measured winner.
_GMM_TAIL_EXPLODE = True


def _gmm_oracle() -> str:
    its = []
    prev = "it0"
    for k in range(1, _GMM_ITERS + 1):
        its.append(f"""
e{k} AS MATERIALIZED (
  SELECT CAST(round(
           (p.pi1 * exp(-(d.x - p.mu1)*(d.x - p.mu1)/(2*p.s1*p.s1)) / p.s1)
           / ((p.pi1 * exp(-(d.x - p.mu1)*(d.x - p.mu1)/(2*p.s1*p.s1)) / p.s1)
              + ((1 - p.pi1) * exp(-(d.x - p.mu2)*(d.x - p.mu2)/(2*p.s2*p.s2))
                 / p.s2)), 12) AS DECIMAL(14,12)) AS r1,
         d.x
  FROM d CROSS JOIN {prev} p
),
m{k} AS MATERIALIZED (
  SELECT CAST(sum(r1) AS DOUBLE) AS n1,
         CAST(sum(CAST(round(CAST(r1 AS DOUBLE) * x, 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS sx1,
         CAST(sum(CAST(round(CAST(r1 AS DOUBLE) * x * x, 2)
                       AS DECIMAL(30,2))) AS DOUBLE) AS sxx1,
         CAST(sum(1 - r1) AS DOUBLE) AS n2,
         CAST(sum(CAST(round(CAST(1 - r1 AS DOUBLE) * x, 6)
                       AS DECIMAL(28,6))) AS DOUBLE) AS sx2,
         CAST(sum(CAST(round(CAST(1 - r1 AS DOUBLE) * x * x, 2)
                       AS DECIMAL(30,2))) AS DOUBLE) AS sxx2,
         CAST(count(*) AS DOUBLE) AS nn
  FROM e{k}
),
it{k} AS (
  SELECT round(n1 / nn, 12) AS pi1,
         round(sx1 / n1, 12) AS mu1,
         round(sqrt(greatest(sxx1 / n1 - (sx1/n1)*(sx1/n1), 1e-6)), 12) AS s1,
         round(sx2 / n2, 12) AS mu2,
         round(sqrt(greatest(sxx2 / n2 - (sx2/n2)*(sx2/n2), 1e-6)), 12) AS s2
  FROM m{k}
)""")
        prev = f"it{k}"
    return f"""
WITH d AS MATERIALIZED (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS x
  FROM orders
),
mom AS (
  SELECT CAST(count(*) AS DOUBLE) AS nn,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(19,2))
                  * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx
  FROM orders
),
it0 AS (
  SELECT 0.5 AS pi1,
         round(sx/nn - sqrt(sxx/nn - (sx/nn)*(sx/nn)), 12) AS mu1,
         round(sqrt(sxx/nn - (sx/nn)*(sx/nn)), 12) AS s1,
         round(sx/nn + sqrt(sxx/nn - (sx/nn)*(sx/nn)), 12) AS mu2,
         round(sqrt(sxx/nn - (sx/nn)*(sx/nn)), 12) AS s2
  FROM mom
),{",".join(its)}
SELECT 1 AS component, round(pi1, 6) AS weight,
       round(mu1, 2) AS mu, round(s1, 2) AS sigma
FROM {prev}
UNION ALL
SELECT 2, round(1 - pi1, 6), round(mu2, 2), round(s2, 2)
FROM {prev}
ORDER BY component
"""


@query(
    "q_gmm_em_1d",
    bench3=True,
    oracle=_gmm_oracle(),
    tags=("stats", "clustering", "em", "iterative-unrolled"),
)
def q_gmm_em_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D GAUSSIAN MIXTURE by EM (2 components, 3 unrolled
    iterations) over order values — SOFT clustering next to the
    kmeans family's hard assignments: every order carries a
    responsibility r in [0,1] instead of a cluster id, which is what
    downstream mixture-of-sources weighting actually needs. Init is
    moment-based and deterministic (mu = mean -/+ std, shared sigma,
    pi = 0.5); the declared statistic is the 3-step EM state.

    Scale shape: each iteration is ONE map-side-combinable aggregate
    pass (E-step responsibilities and all six M-step moments fused;
    no per-row state, no collect); parameters flow as 1-row broadcast
    frames. Parity: responsibilities and weighted moments are rounded
    (12/6/2 dp) and DECIMAL-folded, parameters round to 12 between
    iterations — both engines run the identical exp/sqrt double
    chain on identical inputs."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(dec(F.col("o_totalprice")).cast("double").alias("x"))
    mom = o.agg(
        F.count(F.lit(1)).cast("double").alias("nn"),
        F.sum(dec(F.col("o_totalprice"))).cast("double").alias("sx"),
        F.sum(
            dec(F.col("o_totalprice")).cast("decimal(19,2)")
            * dec(F.col("o_totalprice"))
        )
        .cast("double")
        .alias("sxx"),
    )
    mean = F.col("sx") / F.col("nn")
    std = F.sqrt(F.col("sxx") / F.col("nn") - mean * mean)
    params = mom.select(
        F.lit(0.5).alias("pi1"),
        F.round(mean - std, 12).alias("mu1"),
        F.round(std, 12).alias("s1"),
        F.round(mean + std, 12).alias("mu2"),
        F.round(std, 12).alias("s2"),
    )
    for _ in range(_GMM_ITERS):
        x, mu1, s1, mu2, s2, pi1 = (
            F.col("x"),
            F.col("mu1"),
            F.col("s1"),
            F.col("mu2"),
            F.col("s2"),
            F.col("pi1"),
        )
        a1 = pi1 * F.exp(-(x - mu1) * (x - mu1) / (2 * s1 * s1)) / s1
        a2 = (1 - pi1) * F.exp(-(x - mu2) * (x - mu2) / (2 * s2 * s2)) / s2
        e = d.crossJoin(F.broadcast(params)).select(
            F.round(a1 / (a1 + a2), 12).cast("decimal(14,12)").alias("r1"),
            "x",
        )
        r1d = F.col("r1").cast("double")
        m = e.agg(
            F.sum("r1").cast("double").alias("n1"),
            F.sum(F.round(r1d * F.col("x"), 6).cast("decimal(28,6)"))
            .cast("double")
            .alias("sx1"),
            F.sum(
                F.round(r1d * F.col("x") * F.col("x"), 2).cast("decimal(30,2)")
            )
            .cast("double")
            .alias("sxx1"),
            F.sum(1 - F.col("r1")).cast("double").alias("n2"),
            F.sum(
                F.round((1 - F.col("r1")).cast("double") * F.col("x"), 6).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("sx2"),
            F.sum(
                F.round(
                    (1 - F.col("r1")).cast("double") * F.col("x") * F.col("x"),
                    2,
                ).cast("decimal(30,2)")
            )
            .cast("double")
            .alias("sxx2"),
            F.count(F.lit(1)).cast("double").alias("nn"),
        )
        params = m.select(
            F.round(F.col("n1") / F.col("nn"), 12).alias("pi1"),
            F.round(F.col("sx1") / F.col("n1"), 12).alias("mu1"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("sxx1") / F.col("n1")
                        - (F.col("sx1") / F.col("n1"))
                        * (F.col("sx1") / F.col("n1")),
                        F.lit(1e-6),
                    )
                ),
                12,
            ).alias("s1"),
            F.round(F.col("sx2") / F.col("n2"), 12).alias("mu2"),
            F.round(
                F.sqrt(
                    F.greatest(
                        F.col("sxx2") / F.col("n2")
                        - (F.col("sx2") / F.col("n2"))
                        * (F.col("sx2") / F.col("n2")),
                        F.lit(1e-6),
                    )
                ),
                12,
            ).alias("s2"),
        )
    # ONE reference to params (r12): the c1/c2 union referenced the
    # 3-iteration nested-broadcast chain twice — explode a 2-struct
    # array instead so the EM chain executes once per run even where
    # exchange reuse fails to dedupe it. (r11 union form kept behind
    # _GMM_TAIL_EXPLODE for the VERDICT r12 #2 interleaved A/B.)
    if not _GMM_TAIL_EXPLODE:
        c1 = params.select(
            F.lit(1).alias("component"),
            F.round("pi1", 6).alias("weight"),
            F.round("mu1", 2).alias("mu"),
            F.round("s1", 2).alias("sigma"),
        )
        c2 = params.select(
            F.lit(2).alias("component"),
            F.round(1 - F.col("pi1"), 6).alias("weight"),
            F.round("mu2", 2).alias("mu"),
            F.round("s2", 2).alias("sigma"),
        )
        return c1.unionByName(c2).orderBy("component")
    return (
        params.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("component"),
                        F.round("pi1", 6).alias("weight"),
                        F.round("mu1", 2).alias("mu"),
                        F.round("s1", 2).alias("sigma"),
                    ),
                    F.struct(
                        F.lit(2).alias("component"),
                        F.round(1 - F.col("pi1"), 6).alias("weight"),
                        F.round("mu2", 2).alias("mu"),
                        F.round("s2", 2).alias("sigma"),
                    ),
                )
            ).alias("c")
        )
        .select("c.*")
        .orderBy("component")
    )


_CUPED_CUTOFF = "1996-01-01"  # pre/post split of the order history


@query(
    "q_cuped_adjustment",
    oracle=f"""
WITH pc AS (
  SELECT c.c_custkey, c.c_mktsegment AS arm,
         CAST(coalesce(sum(CASE WHEN o.o_orderdate < DATE '{_CUPED_CUTOFF}'
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
              AS DECIMAL(18,2)) AS x,
         CAST(coalesce(sum(CASE WHEN o.o_orderdate >= DATE '{_CUPED_CUTOFF}'
                          THEN CAST(o.o_totalprice AS DECIMAL(18,2)) END), 0)
              AS DECIMAL(18,2)) AS y
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
  GROUP BY c.c_custkey, c.c_mktsegment
),
pool AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(CAST(x AS DECIMAL(19,2)) * x) AS DOUBLE) AS sxx,
         CAST(sum(CAST(x AS DECIMAL(19,2)) * y) AS DOUBLE) AS sxy,
         CAST(sum(CAST(y AS DECIMAL(19,2)) * y) AS DOUBLE) AS syy
  FROM pc
),
th AS (
  SELECT n, sx / n AS xbar, sy / n AS ybar,
         (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
         (syy - sy * sy / n) / n AS var_y,
         (syy - sy * sy / n) / n
           - ((sxy - sx * sy / n) / (sxx - sx * sx / n))
             * ((sxy - sx * sy / n) / (sxx - sx * sx / n))
             * (sxx - sx * sx / n) / n AS var_adj
  FROM pool
),
arm AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_arm,
         CAST(sum(x) AS DOUBLE) AS asx, CAST(sum(y) AS DOUBLE) AS asy
  FROM pc GROUP BY arm
)
SELECT a.arm, a.n_arm,
       round(a.asy / a.n_arm, 6) AS mean_y,
       round(a.asy / a.n_arm
             - t.theta * (a.asx / a.n_arm - t.xbar), 6) AS mean_y_adj,
       round(t.theta, 6) AS theta,
       round(1.0 - t.var_adj / t.var_y, 6) AS var_reduction
FROM arm a CROSS JOIN th t
ORDER BY a.arm
""",
    tags=("stats", "experimentation", "cuped"),
)
def q_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION (Deng et al. 2013 — the
    pre-experiment-covariate adjustment every experimentation
    platform runs): per-customer pre-period spend X (before
    1996-01-01) adjusts post-period spend Y via Y* = Y - theta(X -
    Xbar), theta = cov(X,Y)/var(X); per-arm adjusted means move while
    the contrast stays unbiased, and var_reduction = rho^2 says how
    much smaller the experiment could have been. Completes the
    experimentation family: q_mde_power sizes, q_sprt_monitor peeks,
    q_ab_test_proportions tests, this one shrinks the noise.

    Scale/parity: one customer-keyed aggregate, then five pooled
    moments (the ACF (19,2)x(18,2) int128 widening recipe — exact
    DECIMAL folds) and closed-form combines: adjusted means and the
    variance identity var(Y*) = var(Y) - theta^2 var(X) evaluate
    straight from the moments, so no second data pass and no per-row
    adjusted column is ever materialized."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit(_CUPED_CUTOFF).cast("date")
    zero = F.lit(0).cast("decimal(18,2)")
    pc = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", F.col("c_mktsegment").alias("arm"))
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("o_orderdate") < cutoff, dec(F.col("o_totalprice")))
                ),
                zero,
            )
            .cast("decimal(18,2)")
            .alias("x"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderdate") >= cutoff, dec(F.col("o_totalprice"))
                    )
                ),
                zero,
            )
            .cast("decimal(18,2)")
            .alias("y"),
        )
    )
    pool = pc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("x"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(19,2)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.col("y").cast("decimal(19,2)") * F.col("y"))
        .cast("double")
        .alias("syy"),
    )
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    vx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    vy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    th = pool.select(
        "n",
        (F.col("sx") / F.col("n")).alias("xbar"),
        (F.col("sy") / F.col("n")).alias("ybar"),
        (cov / vx).alias("theta"),
        (vy / F.col("n")).alias("var_y"),
        (vy / F.col("n") - (cov / vx) * (cov / vx) * vx / F.col("n")).alias(
            "var_adj"
        ),
    )
    arm = pc.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n_arm"),
        F.sum("x").cast("double").alias("asx"),
        F.sum("y").cast("double").alias("asy"),
    )
    return (
        arm.crossJoin(F.broadcast(th))
        .select(
            "arm",
            "n_arm",
            F.round(F.col("asy") / F.col("n_arm"), 6).alias("mean_y"),
            F.round(
                F.col("asy") / F.col("n_arm")
                - F.col("theta") * (F.col("asx") / F.col("n_arm") - F.col("xbar")),
                6,
            ).alias("mean_y_adj"),
            F.round("theta", 6).alias("theta"),
            F.round(1.0 - F.col("var_adj") / F.col("var_y"), 6).alias(
                "var_reduction"
            ),
        )
        .orderBy("arm")
    )


@query(
    "q_srm_check",
    oracle="""
WITH a AS (
  SELECT CAST(count(*) FILTER (c_mktsegment = 'BUILDING') AS BIGINT) AS n1,
         CAST(count(*) FILTER (c_mktsegment = 'MACHINERY') AS BIGINT) AS n2
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
)
SELECT n1, n2,
       round((CAST(n1 - n2 AS DOUBLE) * (n1 - n2))
             / CAST(n1 + n2 AS DOUBLE) / 2
             + (CAST(n2 - n1 AS DOUBLE) * (n2 - n1))
               / CAST(n1 + n2 AS DOUBLE) / 2, 6) AS chi2,
       CASE WHEN (CAST(n1 - n2 AS DOUBLE) * (n1 - n2))
                 / CAST(n1 + n2 AS DOUBLE) / 2
                 + (CAST(n2 - n1 AS DOUBLE) * (n2 - n1))
                   / CAST(n1 + n2 AS DOUBLE) / 2 > 3.841459
            THEN 'SRM' ELSE 'ok' END AS verdict
FROM a
""",
    tags=("stats", "experimentation", "srm"),
)
def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH CHECK — the experimentation DATA-QUALITY
    gate that must pass before any readout is trusted (an assignment
    split that misses its expected 50/50 means the randomizer or the
    logging dropped users non-randomly, and every downstream effect
    estimate is suspect): chi-square of the observed BUILDING vs
    MACHINERY arm counts against equal allocation, with the 1-df 95%
    critical value (3.841459) inlined identically in both engines.
    One aggregate to two exact integers; chi2 is a handful of
    identical double ops."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    a = c.agg(
        F.count(F.when(F.col("c_mktsegment") == "BUILDING", 1))
        .cast("long")
        .alias("n1"),
        F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1))
        .cast("long")
        .alias("n2"),
    )
    d12 = (F.col("n1") - F.col("n2")).cast("double")
    d21 = (F.col("n2") - F.col("n1")).cast("double")
    tot = (F.col("n1") + F.col("n2")).cast("double")
    chi2 = d12 * (F.col("n1") - F.col("n2")) / tot / 2 + d21 * (
        F.col("n2") - F.col("n1")
    ) / tot / 2
    return a.select(
        "n1",
        "n2",
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > 3.841459, F.lit("SRM")).otherwise(F.lit("ok")).alias(
            "verdict"
        ),
    )


_QTE_QS = tuple(round(0.1 * k, 1) for k in range(1, 10))


def _qte_oracle() -> str:
    rows = "\nUNION ALL\n".join(
        f"""SELECT CAST({q} AS DOUBLE) AS tau,
       round(quantile_cont(CASE WHEN arm = 'BUILDING'
                                THEN o_totalprice END, {q}), 4) AS q_treated,
       round(quantile_cont(CASE WHEN arm = 'MACHINERY'
                                THEN o_totalprice END, {q}), 4) AS q_control
FROM j"""
        for q in _QTE_QS
    )
    return f"""
WITH j AS (
  SELECT c.c_mktsegment AS arm, o.o_totalprice
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
g AS ({rows})
SELECT tau, q_treated, q_control,
       round(q_treated - q_control, 4) AS qte
FROM g ORDER BY tau
"""


@query(
    "q_quantile_treatment_effect",
    oracle=_qte_oracle(),
    tags=("stats", "causal", "quantile"),
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS — the per-decile difference between
    the BUILDING and MACHINERY order-value distributions: where an
    average effect (q_uplift_by_segment) can net to ~0 while the
    tails move, the QTE curve says WHO moved (p10 shifts = the small
    orders, p90 shifts = the big ones); the decile-resolution
    companion to q_wasserstein_1d's one-number distance.

    Scale/parity: one fact-dim join, then per-arm interpolated
    percentiles as conditional aggregates (both engines
    linear-interpolate; rounded to 4 dp to absorb final-ulp wiggle —
    the q_percentiles recipe); the decile grid is 9 rows of
    arithmetic."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    o = _t(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey).select(
        F.col("c_mktsegment").alias("arm"), "o_totalprice"
    )
    t_val = F.when(F.col("arm") == "BUILDING", F.col("o_totalprice"))
    c_val = F.when(F.col("arm") == "MACHINERY", F.col("o_totalprice"))
    agg = j.agg(
        *[
            F.round(F.percentile(t_val, F.lit(q)), 4).alias(f"t_{k}")
            for k, q in enumerate(_QTE_QS)
        ],
        *[
            F.round(F.percentile(c_val, F.lit(q)), 4).alias(f"c_{k}")
            for k, q in enumerate(_QTE_QS)
        ],
    )
    rows = None
    for k, q in enumerate(_QTE_QS):
        r = agg.select(
            F.lit(q).alias("tau"),
            F.col(f"t_{k}").alias("q_treated"),
            F.col(f"c_{k}").alias("q_control"),
            F.round(F.col(f"t_{k}") - F.col(f"c_{k}"), 4).alias("qte"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.orderBy("tau")
