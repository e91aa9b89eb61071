"""Window-function queries (SURVEY.md A5/A6/J5) + pivot/unpivot.

All ranking/analytic/frame windows are single-shuffle plans
(partitionBy key); outputs cast ranks to BIGINT for cross-engine
schema alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.operators.asof import asof_join
from cdc_via_flink_spark.plans.parity import davg, dec, dsum
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "q_topk_per_segment",
    oracle="""
WITH r AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
""",
    tags=("A5", "A6", "window"),
    bench=True,
)
def q_topk_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number window + filter (the scalable top-k —
    no global sort, one shuffle on the group key)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q_running_revenue",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
           PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_rev
FROM lineitem WHERE l_suppkey % 5 = 0
""",
    tags=("A5", "window", "frame"),
)
def q_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per supplier with an explicit ROWS frame; DECIMAL
    accumulator keeps the prefix sums exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 5 == 0)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec(F.col("l_extendedprice"))).over(w).cast("double").alias("running_rev"),
    )


@query(
    "q_order_gaps",
    oracle="""
WITH g AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_date,
         lead(o_orderkey) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS next_key
  FROM orders
)
SELECT o_custkey, o_orderkey,
       CAST(coalesce(date_diff('day', prev_date, o_orderdate), -1) AS INTEGER) AS gap_days,
       coalesce(next_key, -1) AS next_key
FROM g WHERE o_custkey % 10 = 0
""",
    tags=("A5", "window", "lag"),
)
def q_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-customer inter-order gap in days."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("prev_date", F.lag("o_orderdate").over(w))
        .withColumn("next_key", F.lead("o_orderkey").over(w))
        .filter(F.col("o_custkey") % 10 == 0)
        .select(
            "o_custkey",
            "o_orderkey",
            F.coalesce(
                F.datediff(F.col("o_orderdate").cast("date"), F.col("prev_date").cast("date")),
                F.lit(-1),
            ).alias("gap_days"),
            F.coalesce("next_key", F.lit(-1)).alias("next_key"),
        )
    )


@query(
    "q_rank_parts",
    oracle="""
SELECT p_brand, p_partkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER (PARTITION BY p_brand
                           ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_size DESC)
""",
    tags=("A5", "window", "rank"),
)
def q_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank (ties on p_size are rank-stable by definition)
    and ntile with a unique ordering."""
    p = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    w2 = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w2).cast("long").alias("quartile"),
    )


@query(
    "q_first_last_values",
    oracle="""
SELECT DISTINCT c_nationkey,
       first_value(c_name) OVER (PARTITION BY c_nationkey
           ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
       last_value(c_name) OVER (PARTITION BY c_nationkey
           ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS poorest
FROM customer
""",
    tags=("A5", "window", "first_last"),
)
def q_first_last_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over a full-partition frame (unique
    ordering key → deterministic)."""
    c = _t(spark, sf_dir, "customer")
    w = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_nationkey",
        F.first("c_name").over(w).alias("richest"),
        F.last("c_name").over(w).alias("poorest"),
    ).distinct()


@query(
    "q_pivot_status",
    oracle="""
SELECT l_returnflag,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'O'
             THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_open,
       CAST(coalesce(sum(CASE WHEN l_linestatus = 'F'
             THEN CAST(l_quantity AS DECIMAL(18,2)) END), 0) AS DOUBLE) AS qty_filled
FROM lineitem GROUP BY l_returnflag
""",
    tags=("A3", "pivot"),
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list keeps the
    plan single-pass; oracle states the CASE-aggregate equivalent)."""
    li = _t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec(F.col("l_quantity"))))
    )
    return piv.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0)).cast("double").alias("qty_open"),
        F.coalesce(F.col("F"), F.lit(0)).cast("double").alias("qty_filled"),
    )


@query(
    "q_unpivot_balances",
    oracle="""
WITH cu AS (
  SELECT c_nationkey AS n_nationkey,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS customer
  FROM customer GROUP BY c_nationkey
),
su AS (
  SELECT s_nationkey AS n_nationkey,
         CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS supplier
  FROM supplier GROUP BY s_nationkey
),
wide AS (
  SELECT n.n_nationkey, cu.customer, su.supplier
  FROM nation n
  JOIN cu ON n.n_nationkey = cu.n_nationkey
  JOIN su ON n.n_nationkey = su.n_nationkey
)
SELECT n_nationkey, 'customer' AS side, customer AS balance FROM wide
UNION ALL
SELECT n_nationkey, 'supplier' AS side, supplier AS balance FROM wide
""",
    tags=("A7", "unpivot"),
)
def q_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack() after a two-sided aggregate."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(dsum(F.col("c_acctbal")).alias("customer"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(dsum(F.col("s_acctbal")).alias("supplier"))
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey")
    wide = n.join(c, "n_nationkey", "inner").join(s, "n_nationkey", "inner")
    return wide.selectExpr(
        "n_nationkey",
        "stack(2, 'customer', customer, 'supplier', supplier) AS (side, balance)",
    )


@query(
    "q_asof_last_purchase",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events WHERE event_type <> 'purchase'
),
r AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id AS purchase_id, "value" AS amount
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, ts_ms, 1 AS side, 0 AS seq, event_id, event_type,
         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS amount
  FROM l
  UNION ALL
  SELECT user_id, ts_ms, 0 AS side, purchase_id AS seq,
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         purchase_id, amount
  FROM r
),
p AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER w AS asof_purchase_id,
         last_value(amount IGNORE NULLS) OVER w AS asof_amount
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, side, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_ms, event_type,
       coalesce(asof_purchase_id, -1) AS last_purchase_id,
       CAST(coalesce(asof_amount, 0) AS DOUBLE) AS last_purchase_amount
FROM p WHERE side = 1
""",
    tags=("J5", "asof"),
    bench=True,
)
def q_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each non-purchase event enriched with the user's most
    recent purchase at-or-before it (operators/asof.py union-propagate
    idiom; both payload fields come atomically from one purchase row).
    """
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts_ms", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_ms",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts_ms",
        right_ts="ts_ms",
        payload_cols=["purchase_id", "amount"],
        right_seq="purchase_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        F.coalesce("asof_purchase_id", F.lit(-1)).alias("last_purchase_id"),
        F.coalesce("asof_amount", F.lit(0)).cast("double").alias("last_purchase_amount"),
    )


@query(
    "q_percentiles",
    oracle="""
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       CAST(min(o_totalprice) AS DOUBLE) AS min_price,
       CAST(max(o_totalprice) AS DOUBLE) AS max_price
FROM orders GROUP BY o_orderpriority
""",
    tags=("A3", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines linear-interpolate;
    result rounded to absorb any final-ulp wiggle)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("o_totalprice"), F.lit(0.9)), 4).alias("p90"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "q_rolling_30d_spend",
    oracle="""
WITH o AS (SELECT o_custkey, epoch_ms(o_orderdate) AS od_ms,
                  o_orderkey, o_totalprice
           FROM orders)
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY od_ms
           RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_30d,
       count(*) OVER (
           PARTITION BY o_custkey ORDER BY od_ms
           RANGE BETWEEN 2592000000 PRECEDING AND CURRENT ROW
       ) AS n_orders_30d
FROM o
""",
    tags=("A5", "window", "range-frame"),
)
def q_rolling_30d_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed window (value-based frame, not row-based): per
    customer, spend over the trailing 30 days of each order. The frame
    bound is on the epoch-ms ordering value itself — ties (same-ms
    orders) all join the frame, which rowsBetween can't express."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) * 1000).alias("od_ms"),
        "o_orderkey",
        "o_totalprice",
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("od_ms")
        .rangeBetween(-30 * 24 * 3600 * 1000, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec(F.col("o_totalprice"))).over(w).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


@query(
    "q_ntile_balance_quartiles",
    oracle="""
WITH q AS (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ntile(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal, c_custkey) AS quartile
  FROM customer
)
SELECT c_nationkey, quartile, count(*) AS n,
       CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            / count(c_acctbal) AS DOUBLE) AS avg_bal
FROM q GROUP BY c_nationkey, quartile
""",
    tags=("A5", "window", "ntile"),
)
def q_ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) bucketing per nation (deterministic via custkey
    tie-break), then per-bucket stats — the distribution-summary shape
    used for data-quality cuts over a corpus."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        c.withColumn("quartile", F.ntile(4).over(w).cast("long"))
        .groupBy("c_nationkey", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            davg(F.col("c_acctbal")).alias("avg_bal"),
        )
    )


@query(
    "q_cohort_retention",
    oracle="""
WITH su AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
  SELECT DISTINCT e.user_id, s.cohort_wk,
         datediff('day', CAST(s.cohort_wk AS DATE),
                  CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS wk_off
  FROM events e JOIN su s ON e.user_id = s.user_id
)
SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week, wk_off,
       count(*) AS n_active
FROM act WHERE wk_off >= 0
GROUP BY 1, 2
""",
    tags=("A3", "cohort", "retention"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-signup week,
    counted as active in each subsequent week — the standard
    product-analytics shape (cohort × week-offset matrix). Week
    arithmetic is day-diff // 7 of week-truncated dates in BOTH
    engines (date_diff('week', ...) counts boundary crossings with
    engine-specific week anchors — a cross-engine trap)."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_wk"))
    )
    act = (
        ev.join(su, "user_id")
        .select(
            "user_id",
            "cohort_wk",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_wk").cast("date"),
                )
                / 7
            ).alias("wk_off"),
        )
        .distinct()
        .filter(F.col("wk_off") >= 0)
    )
    return act.groupBy(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"), "wk_off"
    ).agg(F.count(F.lit(1)).alias("n_active"))


@query(
    "q_signup_purchase_funnel",
    oracle="""
WITH s AS (
  SELECT user_id, min(epoch_ms(ts)) AS s_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS p_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= s.s_ts
  GROUP BY e.user_id
)
SELECT CASE WHEN p.p_ts IS NULL THEN 'no_purchase'
            WHEN p.p_ts - s.s_ts <= 86400000 THEN 'within_1d'
            WHEN p.p_ts - s.s_ts <= 604800000 THEN 'within_7d'
            ELSE 'later' END AS bucket,
       count(*) AS n_users
FROM s LEFT JOIN p ON p.user_id = s.user_id
GROUP BY bucket
""",
    tags=("A3", "J3", "funnel"),
)
def q_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-funnel conversion: per user, first signup then first
    purchase at-or-after it; bucket the conversion lag (1d / 7d /
    later / none). The product-analytics shape over an event stream —
    two min-aggregates and a left join, all hash-partitioned on
    user_id so the three stages reuse ONE shuffle's partitioning."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts_ms") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("p_ts"))
    )
    lag = F.col("p_ts") - F.col("s_ts")
    bucket = (
        F.when(F.col("p_ts").isNull(), "no_purchase")
        .when(lag <= 86400000, "within_1d")
        .when(lag <= 604800000, "within_7d")
        .otherwise("later")
    )
    return (
        s.join(p, "user_id", "left")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q_sessionize_events",
    oracle="""
WITH t AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, event_id, ts_ms,
         sum(CASE WHEN prev_ts IS NULL OR ts_ms - prev_ts > 1800000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
  FROM t
)
SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
       count(*) AS n_events,
       max(ts_ms) - min(ts_ms) AS duration_ms
FROM s GROUP BY user_id, session_num
""",
    tags=("A5", "sessionize"),
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with EXPLICIT session ids: a session
    boundary is a >30-min silence; session_num is the running count of
    boundaries (lag + conditional cumsum — the idiom when you need the
    id ON each event, e.g. to join features back, which the
    session_window aggregate in win_session_10m can't give you). Both
    windows and the final aggregate share the user_id partitioning —
    one keyed shuffle end to end."""
    ev = _t(spark, sf_dir, "events")
    w_ord = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    boundary = (
        F.col("prev_ts").isNull() | ((F.col("ts_ms") - F.col("prev_ts")) > 1800000)
    ).cast("int")
    s = (
        ev.select("user_id", "event_id", "ts_ms")
        .withColumn("prev_ts", F.lag("ts_ms").over(w_ord))
        .withColumn(
            "session_num",
            F.sum(boundary).over(w_ord.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    return s.groupBy("user_id", "session_num").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("duration_ms"),
    )


@query(
    "q_asof_tolerance",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events WHERE event_type <> 'purchase'
),
r AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id AS purchase_id, "value" AS amount
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, ts_ms, 1 AS side, 0 AS seq, event_id, event_type,
         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS amount,
         CAST(NULL AS BIGINT) AS r_ts
  FROM l
  UNION ALL
  SELECT user_id, ts_ms, 0 AS side, purchase_id AS seq,
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         purchase_id, amount, ts_ms AS r_ts
  FROM r
),
p AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER w AS m_id,
         last_value(amount IGNORE NULLS) OVER w AS m_amount,
         last_value(r_ts IGNORE NULLS) OVER w AS m_ts
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, side, seq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
f AS (
  SELECT *, (m_ts IS NOT NULL AND ts_ms - m_ts <= 259200000) AS fresh
  FROM p WHERE side = 1
)
SELECT event_id, user_id, ts_ms, event_type,
       coalesce(CASE WHEN fresh THEN m_id END, -1) AS last_purchase_id,
       CAST(coalesce(CASE WHEN fresh THEN m_amount END, 0) AS DOUBLE)
         AS last_purchase_amount
FROM f
""",
    tags=("J5", "asof", "tolerance"),
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with STALENESS TOLERANCE (pandas merge_asof
    tolerance semantics): each non-purchase event gets the user's most
    recent purchase ONLY if it happened within the last 3 days —
    older state is rejected as stale (the freshness rule every
    feature-store point-in-time lookup enforces; a plain as-of join
    silently serves arbitrarily old state). Same single keyed shuffle
    as q_asof_last_purchase: the matched right ts propagates inside
    the payload struct, so the tolerance check is a free projection."""
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts_ms", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_ms",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts_ms",
        right_ts="ts_ms",
        payload_cols=["purchase_id", "amount"],
        right_seq="purchase_id",
        tolerance=3 * 24 * 3600 * 1000,  # 3 days in ms
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        F.coalesce("asof_purchase_id", F.lit(-1)).alias("last_purchase_id"),
        F.coalesce("asof_amount", F.lit(0)).cast("double").alias("last_purchase_amount"),
    )


_ASOF_U_CTE = """
WITH l AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
  FROM events WHERE event_type <> 'purchase'
),
r AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id AS purchase_id, "value" AS amount
  FROM events WHERE event_type = 'purchase'
),
u AS (
  SELECT user_id, ts_ms, 1 AS side, 0 AS seq, event_id, event_type,
         CAST(NULL AS BIGINT) AS purchase_id, CAST(NULL AS DOUBLE) AS amount,
         CAST(NULL AS BIGINT) AS r_ts
  FROM l
  UNION ALL
  SELECT user_id, ts_ms, {r_side} AS side, purchase_id AS seq,
         CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
         purchase_id, amount, ts_ms AS r_ts
  FROM r
)
"""


def _asof_events(spark: SparkSession, sf_dir: str, **kw) -> DataFrame:
    """Shared harness for the as-of direction variants: non-purchase
    events (left) joined to purchases (right) per user."""
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts_ms", "event_type"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts_ms",
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        left_ts="ts_ms",
        right_ts="ts_ms",
        payload_cols=["purchase_id", "amount"],
        right_seq="purchase_id",
        **kw,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_ms",
        "event_type",
        F.coalesce("asof_purchase_id", F.lit(-1)).alias("purchase_id"),
        F.coalesce("asof_amount", F.lit(0)).cast("double").alias("amount"),
    )


@query(
    "q_asof_forward",
    oracle=_ASOF_U_CTE.format(r_side=0) + """,
p AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER w AS m_id,
         last_value(amount IGNORE NULLS) OVER w AS m_amount
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms DESC, side ASC, seq DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_ms, event_type,
       coalesce(m_id, -1) AS purchase_id,
       CAST(coalesce(m_amount, 0) AS DOUBLE) AS amount
FROM p WHERE side = 1
""",
    tags=("J5", "asof", "forward"),
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (pandas merge_asof
    direction='forward'): each non-purchase event enriched with the
    user's NEXT purchase at-or-after it — the "time to conversion"
    primitive. Same single keyed shuffle as the backward form; the
    propagation runs as a descending-time prefix frame so Spark
    evaluates it incrementally (an ascending suffix frame would
    re-aggregate per row — see operators/asof.py)."""
    return _asof_events(spark, sf_dir, direction="forward")


@query(
    "q_asof_nearest",
    oracle=_ASOF_U_CTE.format(r_side=0) + """,
p AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER wb AS b_id,
         last_value(amount IGNORE NULLS) OVER wb AS b_amount,
         last_value(r_ts IGNORE NULLS) OVER wb AS b_ts,
         last_value(purchase_id IGNORE NULLS) OVER wf AS f_id,
         last_value(amount IGNORE NULLS) OVER wf AS f_amount,
         last_value(r_ts IGNORE NULLS) OVER wf AS f_ts
  FROM u
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts_ms ASC, side ASC, seq ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts_ms DESC, side ASC, seq DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT *,
         (b_ts IS NOT NULL AND (f_ts IS NULL OR ts_ms - b_ts <= f_ts - ts_ms))
           AS use_bw
  FROM p WHERE side = 1
)
SELECT event_id, user_id, ts_ms, event_type,
       coalesce(CASE WHEN use_bw THEN b_id ELSE f_id END, -1) AS purchase_id,
       CAST(coalesce(CASE WHEN use_bw THEN b_amount ELSE f_amount END, 0)
            AS DOUBLE) AS amount
FROM c
""",
    tags=("J5", "asof", "nearest"),
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, NEAREST direction (pandas merge_asof
    direction='nearest'): each non-purchase event enriched with the
    user's closest purchase in either time direction, equal distance
    resolving backward. Both propagations share ONE keyed shuffle
    (two sorts over the same Exchange)."""
    return _asof_events(spark, sf_dir, direction="nearest")


@query(
    "q_asof_strict",
    oracle=_ASOF_U_CTE.format(r_side=2) + """,
p AS (
  SELECT *,
         last_value(purchase_id IGNORE NULLS) OVER w AS m_id,
         last_value(amount IGNORE NULLS) OVER w AS m_amount
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms ASC, side ASC, seq ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, ts_ms, event_type,
       coalesce(m_id, -1) AS purchase_id,
       CAST(coalesce(m_amount, 0) AS DOUBLE) AS amount
FROM p WHERE side = 1
""",
    tags=("J5", "asof", "strict"),
)
def q_asof_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with allow_exact_matches=False (pandas merge_asof):
    the latest purchase STRICTLY before each event — an
    exactly-simultaneous purchase no longer matches (the
    no-lookahead-even-at-equal-time rule point-in-time feature
    pipelines need). In the oracle the right side sorts AFTER the
    left at equal timestamps (side 2 > 1), dropping it from the
    prefix frame — the same mechanism the operator uses."""
    return _asof_events(spark, sf_dir, allow_exact_matches=False)


@query(
    "q_gapfill_interpolate",
    oracle="""
WITH obs AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE)
              / count(*) AS DOUBLE) AS v,
         count(*) AS n_obs
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY 1),
grid AS (
  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
g AS (
  SELECT grid.user_id, grid.day, obs.v, obs.n_obs
  FROM grid LEFT JOIN obs ON grid.user_id = obs.user_id AND grid.day = obs.day
),
w AS (
  SELECT *,
         last_value(CASE WHEN v IS NOT NULL THEN {'day': day, 'v': v} END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
         last_value(CASE WHEN v IS NOT NULL THEN {'day': day, 'v': v} END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY day DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nxt
  FROM g
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
       COALESCE(n_obs, 0) AS n_obs,
       round(CASE WHEN v IS NOT NULL THEN v
                  ELSE prev.v + (nxt.v - prev.v)
                       * (date_diff('day', prev.day, day)
                          / date_diff('day', prev.day, nxt.day)) END
             + 0.0, 6) AS value_filled,
       v IS NULL AS is_gap
FROM w
""",
    tags=("A5", "timeseries", "gapfill"),
)
def q_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series GAP-FILL + LINEAR INTERPOLATION (the hypertable
    `time_bucket_gapfill`/`interpolate` idiom): per-user daily buckets,
    a dense calendar grid spanning each user's observed range
    (`sequence` + explode — generated distributed, never driver-side),
    and missing days filled by interpolating between the nearest
    observed neighbors via two IGNORE-NULLS last_value windows (one
    ASC, one DESC — same hash partitioning, so ONE shuffle feeds both
    sorts; no self-join, no as-of join against the observation table).
    Interior gaps only by construction (grid is bounded by each user's
    min/max observed day), so both interpolation endpoints always
    exist. At 100 TB the grid explode is map-side from the span
    aggregate and the whole fill is one keyed window pass."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("v"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    span = obs.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "user_id", F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    g = grid.join(obs, ["user_id", "day"], "left")
    marked = F.when(F.col("v").isNotNull(), F.struct("day", "v"))
    w_prev = (
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy(F.col("day").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    prev = F.last(marked, ignorenulls=True).over(w_prev)
    nxt = F.last(marked, ignorenulls=True).over(w_next)
    frac = F.datediff(F.col("day"), prev.getField("day")) / F.datediff(
        nxt.getField("day"), prev.getField("day")
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        prev.getField("v") + (nxt.getField("v") - prev.getField("v")) * frac
    )
    return g.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.round(interp + F.lit(0.0), 6).alias("value_filled"),
        F.col("v").isNull().alias("is_gap"),
    )


@query(
    "q_analytic_rank_fns",
    oracle="""
SELECT c_custkey,
       c_mktsegment,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       CAST(nth_value(c_custkey, 2) OVER
            (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS second_richest,
       CAST(lag(c_custkey, 2, -1) OVER w AS BIGINT) AS lag2,
       CAST(lead(c_custkey, 3, -1) OVER w AS BIGINT) AS lead3
FROM customer
WHERE c_custkey <= 300
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
""",
    tags=("A5", "window", "analytic"),
)
def q_analytic_rank_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining SQL analytic functions in one declared query:
    percent_rank / cume_dist (relative standing), nth_value over a
    running frame (second-richest-so-far), and offset lag/lead with
    explicit defaults. One keyed window partitioning serves all five
    — no extra shuffles for extra functions."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wf = w.rowsBetween(W.unboundedPreceding, 0)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value(F.col("c_custkey"), 2).over(wf).cast("long").alias(
            "second_richest"
        ),
        F.lag("c_custkey", 2, -1).over(w).cast("long").alias("lag2"),
        F.lead("c_custkey", 3, -1).over(w).cast("long").alias("lead3"),
    )


@query(
    "q_winsorize",
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER () AS n
  FROM orders
),
cuts AS (
  SELECT max(CASE WHEN rn = CAST(ceil(0.01 * n) AS BIGINT)
                  THEN o_totalprice END) AS p01,
         max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                  THEN o_totalprice END) AS p99
  FROM r
)
SELECT o_orderpriority,
       count(*) AS n,
       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            / count(*) AS DOUBLE) AS raw_mean,
       CAST(CAST(sum(CAST(
           CASE WHEN o_totalprice < cuts.p01 THEN cuts.p01
                WHEN o_totalprice > cuts.p99 THEN cuts.p99
                ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
            / count(*) AS DOUBLE) AS wins_mean,
       CAST(sum(CASE WHEN o_totalprice < cuts.p01
                       OR o_totalprice > cuts.p99 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clipped
FROM r CROSS JOIN cuts
GROUP BY o_orderpriority
""",
    tags=("A5", "cleaning", "winsorize"),
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZATION — outlier clipping at exact DISCRETE percentiles
    (P1/P99 as the element at rank ceil(q·n), the cross-engine-exact
    formulation this repo's percentile queries standardize on): order
    totals clamped to the cuts, then per-priority raw vs winsorized
    means (decimal-exact) and clip counts — the robust-statistics
    pass a feature pipeline runs before normalization.

    Scale note: the global rank is the one genuinely global step; at
    100 TB swap it for approx_percentile cuts (the sketch family
    already declared) — the clamp/aggregate shape is unchanged."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = W.orderBy("o_totalprice", "o_orderkey")
    r = o.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("n"),
    )
    cuts = r.agg(
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.01 * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p01"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.99 * F.col("n")).cast("long"),
                F.col("o_totalprice"),
            )
        ).alias("p99"),
    )
    clamped = F.when(F.col("o_totalprice") < F.col("p01"), F.col("p01")).when(
        F.col("o_totalprice") > F.col("p99"), F.col("p99")
    ).otherwise(F.col("o_totalprice"))
    return (
        r.crossJoin(F.broadcast(cuts))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("raw_mean"),
            (
                F.sum(clamped.cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("wins_mean"),
            F.sum(
                F.when(
                    (F.col("o_totalprice") < F.col("p01"))
                    | (F.col("o_totalprice") > F.col("p99")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clipped"),
        )
    )


@query(
    "q_rolling_zscore_anomaly",
    oracle="""
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE)
           AS spend
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, day
),
w AS (
  SELECT user_id, day, spend,
         count(*) OVER win AS n_prev,
         CAST(CAST(sum(CAST(round(spend, 6) AS DECIMAL(28,6))) OVER win
              AS DOUBLE) AS DOUBLE) AS sum_prev,
         CAST(CAST(sum(CAST(round(spend * spend, 6) AS DECIMAL(28,6)))
              OVER win AS DOUBLE) AS DOUBLE) AS sum2_prev
  FROM d
  WINDOW win AS (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
),
z AS (
  SELECT user_id, day, spend, n_prev,
         CASE WHEN n_prev >= 3 THEN
           round((spend - sum_prev / n_prev)
                 / greatest(sqrt(greatest(sum2_prev / n_prev
                       - (sum_prev / n_prev) * (sum_prev / n_prev), 0.0)),
                     1e-9), 4)
         END AS zscore
  FROM w
)
SELECT user_id,
       count(*) AS n_days,
       CAST(count(zscore) AS BIGINT) AS n_scored,
       CAST(count(CASE WHEN abs(zscore) >= 3.0 THEN 1 END) AS BIGINT)
         AS n_anomalies,
       COALESCE(round(max(abs(zscore)), 4), -1.0) AS max_abs_z
FROM z GROUP BY user_id
""",
    tags=("A5", "timeseries", "anomaly"),
)
def q_rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING Z-SCORE ANOMALY DETECTION — per-user daily spend scored
    against the TRAILING week's mean/std (the 7-preceding-rows frame
    EXCLUDES the current day, so an outlier never masks itself),
    |z| >= 3 flagged; per-user summary with the score coverage an
    alerting pipeline audits. Moments come from decimal-exact rounded
    running sums (order/engine-free); days with under 3 prior
    observations are unscored rather than wrongly scored. One keyed
    shuffle: the daily rollup and all three frame aggregates share the
    user partitioning."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
    )
    win = W.partitionBy("user_id").orderBy("day").rowsBetween(-7, -1)
    w = d.select(
        "user_id",
        "day",
        "spend",
        F.count(F.lit(1)).over(win).alias("n_prev"),
        F.sum(F.round("spend", 6).cast("decimal(28,6)"))
        .over(win)
        .cast("double")
        .alias("sum_prev"),
        F.sum(F.round(F.col("spend") * F.col("spend"), 6).cast("decimal(28,6)"))
        .over(win)
        .cast("double")
        .alias("sum2_prev"),
    )
    mean = F.col("sum_prev") / F.col("n_prev")
    var = F.greatest(F.col("sum2_prev") / F.col("n_prev") - mean * mean, F.lit(0.0))
    z = F.when(
        F.col("n_prev") >= 3,
        F.round(
            (F.col("spend") - mean) / F.greatest(F.sqrt(var), F.lit(1e-9)), 4
        ),
    )
    zz = w.withColumn("zscore", z)
    return zz.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count("zscore").alias("n_scored"),
        F.count(F.when(F.abs(F.col("zscore")) >= 3.0, 1)).alias("n_anomalies"),
        F.coalesce(F.round(F.max(F.abs(F.col("zscore"))), 4), F.lit(-1.0)).alias(
            "max_abs_z"
        ),
    )


@query(
    "q_session_paths",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
p AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM e WHERE rn <= 3
  GROUP BY user_id
),
c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path),
r AS (
  SELECT path, n_users,
         row_number() OVER (ORDER BY n_users DESC, path) AS rk
  FROM c
)
SELECT path, n_users, CAST(rk AS BIGINT) AS rk FROM r WHERE rk <= 15
""",
    tags=("analytics", "sequence", "paths", "A5"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTRY-PATH ANALYSIS — the first three events of every user's
    journey concatenated into a path string ('signup>view>click'),
    ranked by user count: the onboarding-funnel exploration query a
    product analyst starts from. One keyed window for ordinals, the
    path via an ORDER-pinned aggregation (collect_list over the
    windowed rank, array_join — deterministic, no arrival-order
    dependence), top-15 via WindowGroupLimit."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    e = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)
    p = e.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s.getField("event_type"),
            ),
            ">",
        ).alias("path")
    )
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    wr = W.orderBy(F.col("n_users").desc(), F.col("path"))
    return (
        c.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= 15)
    )


@query(
    "q_ma_crossover",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE)
           AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY day
),
m AS (
  SELECT day, rev,
         CAST(CAST(sum(CAST(round(rev, 6) AS DECIMAL(28,6)))
              OVER w3 AS DOUBLE) AS DOUBLE) / count(*) OVER w3 AS ma3,
         CAST(CAST(sum(CAST(round(rev, 6) AS DECIMAL(28,6)))
              OVER w10 AS DOUBLE) AS DOUBLE) / count(*) OVER w10 AS ma10,
         count(*) OVER w10 AS n10
  FROM d
  WINDOW w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w10 AS (ORDER BY day ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
),
sig AS (
  SELECT day, rev, ma3, ma10,
         CASE WHEN ma3 > ma10 THEN 1 ELSE -1 END AS pos,
         lag(CASE WHEN ma3 > ma10 THEN 1 ELSE -1 END)
           OVER (ORDER BY day) AS prev_pos
  FROM m WHERE n10 = 10
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       round(rev, 2) AS rev,
       round(ma3, 6) AS ma3,
       round(ma10, 6) AS ma10,
       CASE WHEN prev_pos IS NOT NULL AND pos > prev_pos THEN 'golden'
            WHEN prev_pos IS NOT NULL AND pos < prev_pos THEN 'death'
            ELSE 'none' END AS crossover
FROM sig
""",
    tags=("A5", "timeseries", "signal"),
)
def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOVING-AVERAGE CROSSOVER detection — the short-window (3-day)
    vs long-window (10-day) trend signal over daily revenue, crossings
    labelled golden (short crosses above) or death: the trading-style
    change-point heuristic an ops dashboard runs on any KPI. Both
    frames ride ONE global sort (decimal-exact running sums); only
    days with a full long window are scored."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev")
        )
    )
    w3 = W.orderBy("day").rowsBetween(-2, 0)
    w10 = W.orderBy("day").rowsBetween(-9, 0)

    def ma(w):
        return F.sum(F.round("rev", 6).cast("decimal(28,6)")).over(w).cast(
            "double"
        ) / F.count(F.lit(1)).over(w)

    m = d.select(
        "day",
        "rev",
        ma(w3).alias("ma3"),
        ma(w10).alias("ma10"),
        F.count(F.lit(1)).over(w10).alias("n10"),
    ).filter(F.col("n10") == 10)
    pos = F.when(F.col("ma3") > F.col("ma10"), 1).otherwise(-1)
    sig = m.select(
        "day",
        "rev",
        "ma3",
        "ma10",
        pos.alias("pos"),
        F.lag(pos).over(W.orderBy("day")).alias("prev_pos"),
    )
    return sig.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("rev", 2).alias("rev"),
        F.round("ma3", 6).alias("ma3"),
        F.round("ma10", 6).alias("ma10"),
        F.when(
            F.col("prev_pos").isNotNull() & (F.col("pos") > F.col("prev_pos")),
            "golden",
        )
        .when(
            F.col("prev_pos").isNotNull() & (F.col("pos") < F.col("prev_pos")),
            "death",
        )
        .otherwise("none")
        .alias("crossover"),
    )


@query(
    "q_repeat_purchase_interval",
    oracle="""
WITH p AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_ms
  FROM events WHERE event_type = 'purchase'
),
g AS (
  SELECT user_id, (ts_ms - prev_ms) / 3600000.0 AS gap_h
  FROM p WHERE prev_ms IS NOT NULL
),
r AS (
  SELECT gap_h, row_number() OVER (ORDER BY gap_h, user_id) AS rn,
         count(*) OVER () AS n
  FROM g
)
SELECT CAST(max(n) AS BIGINT) AS n_gaps,
       round(CAST(CAST(sum(CAST(round(gap_h, 6) AS DECIMAL(28,6)))
             AS DOUBLE) AS DOUBLE) / max(n), 6) AS mean_gap_h,
       round(max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN gap_h END), 6) AS median_gap_h,
       round(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                      THEN gap_h END), 6) AS p90_gap_h
FROM r
""",
    tags=("analytics", "retention", "A5"),
)
def q_repeat_purchase_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPEAT-PURCHASE INTERVAL distribution — the inter-event-time
    profile behind churn windows and re-engagement timing: per-user
    consecutive purchase gaps (one keyed lag), summarized with a
    decimal-exact mean and DISCRETE median/P90 (element-at-rank, the
    house percentile formulation)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts_ms", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id")
    g = (
        p.withColumn("prev_ms", F.lag("ts_ms").over(w))
        .filter(F.col("prev_ms").isNotNull())
        .select(
            "user_id",
            ((F.col("ts_ms") - F.col("prev_ms")) / 3600000.0).alias("gap_h"),
        )
    )
    r = g.select(
        "gap_h",
        F.row_number().over(W.orderBy("gap_h", "user_id")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("n"),
    )
    return r.agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.round(
            F.sum(F.round("gap_h", 6).cast("decimal(28,6)")).cast("double")
            / F.max("n"),
            6,
        ).alias("mean_gap_h"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                    F.col("gap_h"),
                )
            ),
            6,
        ).alias("median_gap_h"),
        F.round(
            F.max(
                F.when(
                    F.col("rn") == F.ceil(0.9 * F.col("n")).cast("long"),
                    F.col("gap_h"),
                )
            ),
            6,
        ).alias("p90_gap_h"),
    )


@query(
    "q_returnflag_trend",
    oracle="""
WITH m AS (
  SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         l_returnflag, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT month, CAST(sum(n) AS BIGINT) AS tot FROM m GROUP BY month)
SELECT m.month, m.l_returnflag, m.n,
       round(CAST(m.n AS DOUBLE) / t.tot, 6) AS share
FROM m JOIN t ON m.month = t.month
""",
    tags=("analytics", "trend", "A3"),
)
def q_returnflag_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly SHARE-OF-TOTAL trend by return flag — the composition
    time series a logistics dashboard carries (return-rate drift):
    per-month flag counts with shares against month totals derived
    FROM the cell table (no second scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM").alias(
            "month"
        ),
        "l_returnflag",
    ).agg(F.count(F.lit(1)).alias("n"))
    t = m.groupBy("month").agg(F.sum("n").cast("long").alias("tot"))
    return m.join(F.broadcast(t), "month").select(
        "month",
        "l_returnflag",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("share"),
    )


# --- z-normalized subsequence similarity (UCR-style) ---

TSS_L = 8  # subsequence length
TSS_TOP = 20
# z-normalized ramp pattern (mean 0, unit variance), inlined as the
# SAME literal doubles in both engines
TSS_PATTERN = (
    -1.5275252316519468, -1.091089451179962, -0.6546536707079772,
    -0.2182178902359924, 0.2182178902359924, 0.6546536707079772,
    1.091089451179962, 1.5275252316519468,
)


def _tss_oracle() -> str:
    leads = ",\n         ".join(
        f"lead(\"value\", {i}) OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        f" AS x{i}"
        for i in range(TSS_L)
    )
    mean = "(" + " + ".join(f"x{i}" for i in range(TSS_L)) + f") / {TSS_L}.0"
    s2 = (
        "("
        + " + ".join(f"(x{i} - m) * (x{i} - m)" for i in range(TSS_L))
        + f") / {TSS_L}.0"
    )
    dist = " + ".join(
        f"((x{i} - m) / sqrt(s2) - ({TSS_PATTERN[i]!r})) *"
        f" ((x{i} - m) / sqrt(s2) - ({TSS_PATTERN[i]!r}))"
        for i in range(TSS_L)
    )
    return f"""
WITH w1 AS (
  SELECT user_id, event_id AS start_event_id,
         {leads}
  FROM events
),
w2 AS (SELECT *, {mean} AS m FROM w1 WHERE x{TSS_L - 1} IS NOT NULL),
w3 AS (SELECT *, {s2} AS s2 FROM w2),
d AS (
  SELECT user_id, start_event_id, round({dist}, 6) AS zdist
  FROM w3 WHERE s2 > 0
)
SELECT user_id, start_event_id, zdist FROM d
ORDER BY zdist, user_id, start_event_id LIMIT {TSS_TOP}
"""


@query(
    "q_ts_similarity_topk",
    oracle=_tss_oracle(),
    tags=("A5", "timeseries", "similarity", "ucr"),
)
def q_ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-NORMALIZED SUBSEQUENCE SIMILARITY SEARCH (the UCR-suite
    primitive; cf. "Time Series Similarity Search for Streaming Data
    in Distributed Systems", EDBT 2019 — PAPERS.md): over every
    user's event-value series, score every length-8 subsequence
    against a fixed z-normalized query pattern (a ramp) by
    z-normalized Euclidean distance and return the global top-20
    matches. Z-normalizing each window (subtract ITS mean, divide by
    ITS std) is what makes the match amplitude- and offset-invariant
    — the semantics that plain correlation windows (q_ma_crossover)
    don't give.

    Scale shape: the windows come from 8 lead() columns over the
    per-user ordering — ONE exchange on user_id, no self-join, no
    per-user array materialization; constant-variance windows are
    excluded exactly (s2 > 0); the global top-k compiles to
    TakeOrderedAndProject. All arithmetic is the same left-associated
    double chain in both engines, so the oracle matches bit-for-bit
    at 6 d.p."""
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        "user_id",
        F.col("event_id").alias("start_event_id"),
        *[F.lead("value", i).over(w).alias(f"x{i}") for i in range(TSS_L)],
    ).filter(F.col(f"x{TSS_L - 1}").isNotNull())
    def lsum(cols):
        # explicit left fold: the SAME association order as the
        # oracle's "a + b + c" chain, so doubles match bit-for-bit
        acc = cols[0]
        for c in cols[1:]:
            acc = acc + c
        return acc

    mean = lsum([F.col(f"x{i}") for i in range(TSS_L)]) / float(TSS_L)
    w2 = base.withColumn("m", mean)
    s2 = lsum(
        [
            (F.col(f"x{i}") - F.col("m")) * (F.col(f"x{i}") - F.col("m"))
            for i in range(TSS_L)
        ]
    ) / float(TSS_L)
    w3 = w2.withColumn("s2", s2).filter(F.col("s2") > 0)
    z = [
        (F.col(f"x{i}") - F.col("m")) / F.sqrt(F.col("s2")) - F.lit(TSS_PATTERN[i])
        for i in range(TSS_L)
    ]
    dist = lsum([zi * zi for zi in z])
    return (
        w3.select(
            "user_id", "start_event_id", F.round(dist, 6).alias("zdist")
        )
        .orderBy("zdist", "user_id", "start_event_id")
        .limit(TSS_TOP)
    )


# --- windowFunnel (ordered event chain within a sliding window) ---

WF_WINDOW_MS = 21_600_000  # 6 hours — tight enough that the fixture's
# sparse streams separate all three funnel levels (41 / 11 of 150)
WF_CHAIN = ("view", "click", "purchase")


@query(
    "q_window_funnel",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
w1 AS (
  SELECT user_id, event_type, ts_ms, event_id,
         max(CASE WHEN event_type = 'view' THEN ts_ms END)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_c1
  FROM t
),
w2 AS (
  SELECT user_id, event_type, ts_ms, last_c1,
         max(CASE WHEN event_type = 'click' THEN last_c1 END)
           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                 ROWS UNBOUNDED PRECEDING) AS best_anchor2
  FROM w1
),
lv AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
         max(CASE WHEN event_type = 'click' AND last_c1 IS NOT NULL
                   AND last_c1 >= ts_ms - {WF_WINDOW_MS}
             THEN 1 ELSE 0 END) AS l2,
         max(CASE WHEN event_type = 'purchase' AND best_anchor2 IS NOT NULL
                   AND best_anchor2 >= ts_ms - {WF_WINDOW_MS}
             THEN 1 ELSE 0 END) AS l3
  FROM w2 GROUP BY user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(l1) AS BIGINT) AS reached_1,
       CAST(sum(l2) AS BIGINT) AS reached_2,
       CAST(sum(l3) AS BIGINT) AS reached_3,
       round(CAST(sum(l3) AS DOUBLE) / greatest(sum(l1), 1), 6)
         AS full_conversion
FROM lv
""",
    tags=("A5", "funnel", "window-funnel"),
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel — max ordered-chain depth within a sliding window
    (the ClickHouse/Amplitude funnel primitive, distinct from the
    first-event lag funnel q_signup_purchase_funnel): per user, does
    a view → click → purchase chain exist with ALL events inside six
    hours of the chain's opening view? Computed greedily and EXACTLY
    with two running windows: last_c1 = the latest view at-or-before
    each event, best_anchor2 = the best (latest) such anchor carried
    by any click so far — choosing the latest anchor is optimal, so
    level-3 holds iff a purchase sees best_anchor2 within the window.
    No event-pair join, no per-user array: the classic O(n²)
    funnel-join collapses to two window passes.

    Scale shape: ONE exchange on user_id, both running windows and
    the final per-user flags reuse its partitioning; the chain filter
    pushes the three event types into the scan."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*WF_CHAIN)
    )
    w = W.partitionBy("user_id").orderBy("ts_ms", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    c1, c2, c3 = WF_CHAIN
    w1 = ev.withColumn(
        "last_c1",
        F.max(
            F.when(F.col("event_type") == c1, F.col("ts_ms"))
        ).over(w),
    )
    w2 = w1.withColumn(
        "best_anchor2",
        F.max(
            F.when(F.col("event_type") == c2, F.col("last_c1"))
        ).over(w),
    )
    lv = w2.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == c1, 1).otherwise(0)).alias("l1"),
        F.max(
            F.when(
                (F.col("event_type") == c2)
                & F.col("last_c1").isNotNull()
                & (F.col("last_c1") >= F.col("ts_ms") - WF_WINDOW_MS),
                1,
            ).otherwise(0)
        ).alias("l2"),
        F.max(
            F.when(
                (F.col("event_type") == c3)
                & F.col("best_anchor2").isNotNull()
                & (F.col("best_anchor2") >= F.col("ts_ms") - WF_WINDOW_MS),
                1,
            ).otherwise(0)
        ).alias("l3"),
    )
    return lv.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("l1").cast("long").alias("reached_1"),
        F.sum("l2").cast("long").alias("reached_2"),
        F.sum("l3").cast("long").alias("reached_3"),
        F.round(
            F.sum("l3").cast("double") / F.greatest(F.sum("l1"), F.lit(1)), 6
        ).alias("full_conversion"),
    )


# --- trend + smoothing statistics over the monthly revenue series ---

_SQL_MREV = """
  SELECT c.c_nationkey AS nk,
         strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS month,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
"""


def _mrev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation monthly revenue (exact DECIMAL sum) — the shared
    series behind the Mann–Kendall and EWMA queries."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_nationkey").alias("nk")
    )
    return (
        o.join(c, "o_custkey")
        .groupBy(
            "nk",
            F.date_format(
                F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
            ).alias("month"),
        )
        .agg(F.sum(dec(F.col("o_totalprice"))).alias("rev"))
    )


@query(
    "q_mann_kendall_trend",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
n AS (SELECT nk, CAST(count(*) AS BIGINT) AS n_months FROM mrev GROUP BY nk),
pairs AS (
  SELECT a.nk,
         CASE WHEN b.rev > a.rev THEN 1
              WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sgn
  FROM mrev a JOIN mrev b ON a.nk = b.nk AND a.month < b.month
),
s AS (SELECT nk, CAST(sum(sgn) AS BIGINT) AS s_stat FROM pairs GROUP BY nk)
SELECT n.nk AS nationkey, n.n_months, s.s_stat,
       round(CAST(s.s_stat AS DOUBLE)
             / (n.n_months * (n.n_months - 1) / 2.0), 6) AS kendall_tau
FROM n JOIN s ON n.nk = s.nk
""",
    tags=("A5", "trend-test", "mann-kendall"),
)
def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN–KENDALL TREND TEST (Mann 1945 / Kendall 1975 — the
    nonparametric monotone-trend screen a data-quality pipeline runs
    over every metric series): per nation, over the monthly revenue
    series, S = #(concordant month pairs) − #(discordant), and
    Kendall's tau = S / C(n,2). Sign-based, so it needs NO float
    parity policy beyond the one final divide — revenues compare as
    exact DECIMALs.

    Scale shape: the pair join is blocked per nation AND quadratic
    only in the MONTH count (the time dimension, ~constant as data
    grows 100×), never in row count — the base aggregate is the only
    input-sized shuffle. Month-pair fan-out: C(84,2) ≈ 3.5k rows per
    nation."""
    mrev = _mrev(spark, sf_dir)
    n = mrev.groupBy("nk").agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    a = mrev.select("nk", F.col("month").alias("m1"), F.col("rev").alias("r1"))
    b = mrev.select("nk", F.col("month").alias("m2"), F.col("rev").alias("r2"))
    pairs = (
        a.join(b, "nk")
        .filter(F.col("m1") < F.col("m2"))
        .select(
            "nk",
            F.when(F.col("r2") > F.col("r1"), 1)
            .when(F.col("r2") < F.col("r1"), -1)
            .otherwise(0)
            .alias("sgn"),
        )
    )
    s = pairs.groupBy("nk").agg(F.sum("sgn").cast("long").alias("s_stat"))
    return (
        n.join(s, "nk")
        .select(
            F.col("nk").alias("nationkey"),
            "n_months",
            "s_stat",
            F.round(
                F.col("s_stat").cast("double")
                / (F.col("n_months") * (F.col("n_months") - 1) / 2.0),
                6,
            ).alias("kendall_tau"),
        )
    )


@query(
    "q_ewma_revenue",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
idx AS (
  SELECT nk, CAST(rev AS DOUBLE) AS rev,
         row_number() OVER (PARTITION BY nk ORDER BY month) AS rn,
         count(*) OVER (PARTITION BY nk) AS n,
         max(month) OVER (PARTITION BY nk) AS last_month
  FROM mrev
),
w AS (
  SELECT nk, last_month, n, rev,
         power(0.5, CAST(n - rn AS DOUBLE)) AS w
  FROM idx
),
agg AS (
  SELECT nk, any_value(last_month) AS last_month,
         CAST(any_value(n) AS BIGINT) AS n_months,
         sum(CAST(round(rev * w, 4) AS DECIMAL(38,4))) AS num,
         sum(CAST(round(w, 12) AS DECIMAL(38,12))) AS den
  FROM w GROUP BY nk
)
SELECT nk AS nationkey, last_month, n_months,
       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 2) AS ewma_revenue
FROM agg
""",
    tags=("A5", "smoothing", "ewma"),
)
def q_ewma_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPONENTIALLY WEIGHTED MOVING AVERAGE of monthly revenue per
    nation (pandas ewm adjust=True semantics: weighted mean with
    w_t = (1−α)^(T−t)), α = 0.5 — i.e. a one-month half-life. The
    smoothed "current run-rate" metric a finance rollup keeps next to
    the raw series.

    Float-parity design: α = 0.5 makes every weight an exact power of
    two, so power(0.5, k) is BIT-EXACT in any IEEE-754 pow (no
    cross-engine libm risk — the reason this query uses a half-life
    rather than the textbook 0.3); contributions round then sum as
    DECIMAL (order-independent), and the single num/den divide is the
    one shared float op. Scale shape: one input-sized groupBy, then
    windows over nation×month cells (bounded by the time dimension);
    nothing quadratic, no driver collect."""
    mrev = _mrev(spark, sf_dir)
    pw = W.partitionBy("nk")
    idx = mrev.select(
        "nk",
        F.col("rev").cast("double").alias("rev"),
        F.row_number().over(pw.orderBy("month")).alias("rn"),
        F.count(F.lit(1)).over(pw).alias("n"),
        F.max("month").over(pw).alias("last_month"),
    )
    wgt = idx.withColumn(
        "w", F.pow(F.lit(0.5), (F.col("n") - F.col("rn")).cast("double"))
    )
    agg = wgt.groupBy("nk").agg(
        F.any_value("last_month").alias("last_month"),
        F.any_value("n").cast("long").alias("n_months"),
        F.sum(F.round(F.col("rev") * F.col("w"), 4).cast("decimal(38,4)")).alias(
            "num"
        ),
        F.sum(F.round(F.col("w"), 12).cast("decimal(38,12)")).alias("den"),
    )
    return agg.select(
        F.col("nk").alias("nationkey"),
        "last_month",
        "n_months",
        F.round(
            F.col("num").cast("double") / F.col("den").cast("double"), 2
        ).alias("ewma_revenue"),
    )


@query(
    "q_theil_sen_slope",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
pts AS (
  SELECT nk,
         CAST(substring(month, 1, 4) AS BIGINT) * 12
           + CAST(substring(month, 6, 2) AS BIGINT) AS x,
         CAST(rev AS DOUBLE) AS y
  FROM mrev
),
slopes AS (
  SELECT a.nk,
         round((b.y - a.y) / (b.x - a.x), 9) AS slope
  FROM pts a JOIN pts b ON a.nk = b.nk AND a.x < b.x
)
SELECT nk AS nationkey,
       CAST(count(*) AS BIGINT) AS n_slopes,
       round(quantile_cont(slope, 0.5), 6) AS theil_sen_slope
FROM slopes GROUP BY nk
""",
    tags=("A5", "robust-regression", "theil-sen"),
)
def q_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL–SEN ROBUST TREND SLOPE (Theil 1950 / Sen 1968): per
    nation, the median of all pairwise month-to-month revenue slopes
    — the robust-regression companion to q_mann_kendall_trend (same
    monthly series, same month-blocked pair space): up to ~29% of the
    months can be corrupted before the estimate moves.

    Parity: slopes are rounded to 9 dp before the median; both
    engines interpolate the even-count median identically
    (lower + (upper−lower)·0.5 over the same rounded doubles — Spark
    percentile() vs DuckDB quantile_cont). Scale shape: identical to
    Mann–Kendall — pair fan-out is C(n_months, 2) per nation, the
    time dimension, invariant as row count grows 100×; the exact
    median runs over those bounded slope sets, never over raw rows."""
    mrev = _mrev(spark, sf_dir)
    pts = mrev.select(
        "nk",
        (
            F.substring("month", 1, 4).cast("long") * 12
            + F.substring("month", 6, 2).cast("long")
        ).alias("x"),
        F.col("rev").cast("double").alias("y"),
    )
    a = pts.select("nk", F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select("nk", F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "nk")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "nk",
            F.round(
                (F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1")), 9
            ).alias("slope"),
        )
    )
    return slopes.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n_slopes"),
        F.round(F.expr("percentile(slope, 0.5)"), 6).alias("theil_sen_slope"),
    ).select(
        F.col("nk").alias("nationkey"), "n_slopes", "theil_sen_slope"
    )


@query(
    "q_event_lateness_histogram",
    oracle="""
WITH seq AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         max(epoch_ms(ts)) OVER (PARTITION BY user_id
             ORDER BY epoch_ms(ts) // 3600000,
                      md5(CAST(event_id AS VARCHAR))
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_wm
  FROM events
),
lat AS (
  SELECT (high_wm - ts_ms) / 60000 AS lm FROM seq
),
b AS (
  SELECT CASE WHEN lm <= 0 THEN 0 WHEN lm <= 5 THEN 1 WHEN lm <= 30 THEN 2
              WHEN lm <= 120 THEN 3 ELSE 4 END AS bucket_id,
         CASE WHEN lm <= 0 THEN 'on-time' WHEN lm <= 5 THEN '1-5m'
              WHEN lm <= 30 THEN '6-30m' WHEN lm <= 120 THEN '31-120m'
              ELSE '>120m' END AS bucket
  FROM lat
)
SELECT CAST(bucket_id AS BIGINT) AS bucket_id, bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       round(count(*) / CAST(sum(count(*)) OVER () AS DOUBLE), 6) AS share
FROM b GROUP BY bucket_id, bucket
""",
    tags=("W1", "lateness", "data-quality"),
)
def q_event_lateness_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME LATENESS HISTOGRAM — the batch audit that sizes a
    streaming watermark: replay each user's events in ARRIVAL order,
    track the running high watermark, and bucket how far
    behind it each event's timestamp arrives (on-time / ≤5m / ≤30m /
    ≤120m / beyond). The resulting distribution is exactly the
    evidence that picks `withWatermark`'s delay: the bucket that
    captures ~99% of events IS the delay budget, and the `>120m`
    tail is the dead-letter rate the pipeline must route (see
    cdc_dead_letter). The fixture's event_id order is perfectly
    time-sorted (zero disorder measured), so arrival order is
    simulated deterministically: events land batched by hour but
    SHUFFLED within the batch (md5 of the id — the classic
    out-of-order-within-a-file shape), identically in both engines.

    Scale shape: one user-partitioned running-max window (keyed
    shuffle on user_id), then a 5-bucket groupBy — the share window
    runs over 5 aggregated rows. Nothing global touches raw events."""
    e = load_table(spark, sf_dir, "events")
    uw = (
        W.partitionBy("user_id")
        .orderBy(
            (F.col("ts_ms") / 3600000).cast("long"),
            F.md5(F.col("event_id").cast("string")),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    lat = e.select(
        ((F.max("ts_ms").over(uw) - F.col("ts_ms")) / 60000).alias("lm")
    )
    b = lat.select(
        F.when(F.col("lm") <= 0, 0)
        .when(F.col("lm") <= 5, 1)
        .when(F.col("lm") <= 30, 2)
        .when(F.col("lm") <= 120, 3)
        .otherwise(4)
        .alias("bucket_id"),
        F.when(F.col("lm") <= 0, "on-time")
        .when(F.col("lm") <= 5, "1-5m")
        .when(F.col("lm") <= 30, "6-30m")
        .when(F.col("lm") <= 120, "31-120m")
        .otherwise(">120m")
        .alias("bucket"),
    )
    g = b.groupBy("bucket_id", "bucket").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return g.select(
        F.col("bucket_id").cast("long"),
        "bucket",
        "n_events",
        F.round(
            F.col("n_events")
            / F.sum("n_events").over(W.partitionBy()).cast("double"),
            6,
        ).alias("share"),
    )


@query(
    "q_cusum_changepoint",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
stats AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n,
         sum(rev) AS tot
  FROM mrev GROUP BY nk
),
cum AS (
  SELECT m.nk, m.month,
         sum(m.rev) OVER (PARTITION BY m.nk ORDER BY m.month
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crev,
         row_number() OVER (PARTITION BY m.nk ORDER BY m.month) AS i,
         s.n, s.tot
  FROM mrev m JOIN stats s ON m.nk = s.nk
),
cusum AS (
  SELECT nk, month,
         CAST(crev AS DOUBLE) - (CAST(i AS DOUBLE) / n) * CAST(tot AS DOUBLE)
           AS cs
  FROM cum
),
ranked AS (
  SELECT nk, month, round(cs, 6) AS cusum_stat,
         row_number() OVER (PARTITION BY nk
             ORDER BY abs(cs) DESC, month) AS rn
  FROM cusum
)
SELECT nk AS nationkey, month AS changepoint_month, cusum_stat
FROM ranked WHERE rn = 1
""",
    tags=("A5", "changepoint", "cusum"),
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM CHANGE-POINT DETECTION (Page 1954, the centered form used
    in bootstrap changepoint analysis): per nation, the month where
    the cumulative deviation from the series mean — CS_i = Σ_{t≤i} x_t
    − (i/n)·Σx — peaks in absolute value: the single most likely level
    shift in the monthly revenue series. The drift screen a metrics
    pipeline runs before alerting on a trend (and the complement to
    the monotone tests: Mann–Kendall asks IF the series moved, CUSUM
    asks WHEN).

    Parity: both cumulative and total sums fold as exact DECIMALs; the
    centering arithmetic is a shared double chain on identical inputs
    evaluated in one expression. Scale shape: one keyed groupBy + one
    nation-partitioned running window over month cells + the bounded
    argmax window — identical to the EWMA plan, nothing global."""
    mrev = _mrev(spark, sf_dir)
    stats = mrev.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev").alias("tot")
    )
    pw = W.partitionBy("nk").orderBy("month")
    cum = (
        mrev.join(stats, "nk")
        .select(
            "nk",
            "month",
            F.sum("rev")
            .over(pw.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("crev"),
            F.row_number().over(pw).alias("i"),
            "n",
            "tot",
        )
    )
    cs = cum.select(
        "nk",
        "month",
        (
            F.col("crev").cast("double")
            - (F.col("i").cast("double") / F.col("n")) * F.col("tot").cast("double")
        ).alias("cs"),
    )
    rw = W.partitionBy("nk").orderBy(F.abs(F.col("cs")).desc(), "month")
    return (
        cs.withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            F.col("nk").alias("nationkey"),
            F.col("month").alias("changepoint_month"),
            F.round("cs", 6).alias("cusum_stat"),
        )
    )


@query(
    "q_seasonal_indices",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
tot AS (
  SELECT month, sum(rev) AS rev FROM mrev GROUP BY month
),
ma AS (
  SELECT month, CAST(rev AS DOUBLE) AS rev,
         count(*) OVER w AS n_win,
         CAST(sum(rev) OVER w AS DOUBLE) AS s_win
  FROM tot
  WINDOW w AS (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
),
ratio AS (
  SELECT CAST(substring(month, 6, 2) AS BIGINT) AS cal_month,
         round(rev / (s_win / n_win), 9) AS r
  FROM ma WHERE n_win = 13
)
SELECT cal_month,
       CAST(count(*) AS BIGINT) AS n_obs,
       round(CAST(sum(CAST(r AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6)
         AS seasonal_index
FROM ratio GROUP BY cal_month
""",
    tags=("A5", "seasonality", "decomposition"),
)
def q_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL INDICES via RATIO-TO-MOVING-AVERAGE (the classical
    multiplicative-decomposition first step, and the month-of-year
    companion to q_weekday_seasonality): total monthly revenue divided
    by its centered 13-month moving average (full windows only), the
    ratios averaged per calendar month — index > 1 marks a
    seasonally-strong month after trend removal, which a raw
    by-month average conflates with growth.

    Parity: the window sum folds exact DECIMAL revenue; the MA divide,
    ratio and 9-dp round are one shared double chain; per-calendar-
    month ratios re-fold as DECIMAL. Scale shape: one keyed groupBy to
    the month grid (bounded by the time dimension), a single ordered
    window over ~84 rows, a 12-row output aggregate — at 100× the
    month grid is unchanged, so everything after the first aggregate
    is constant work."""
    mrev = _mrev(spark, sf_dir)
    tot = mrev.groupBy("month").agg(F.sum("rev").alias("rev"))
    w = W.orderBy("month").rowsBetween(-6, 6)
    ma = tot.select(
        "month",
        F.col("rev").cast("double").alias("rev"),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.sum("rev").over(w).cast("double").alias("s_win"),
    )
    ratio = ma.filter(F.col("n_win") == 13).select(
        F.substring("month", 6, 2).cast("long").alias("cal_month"),
        F.round(F.col("rev") / (F.col("s_win") / F.col("n_win")), 9).alias("r"),
    )
    return ratio.groupBy("cal_month").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(
            F.sum(F.col("r").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("seasonal_index"),
    )


@query(
    "q_runs_test",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
med AS (
  SELECT nk, quantile_cont(CAST(rev AS DOUBLE), 0.5) AS med
  FROM mrev GROUP BY nk
),
cls AS (
  SELECT m.nk, m.month,
         CASE WHEN CAST(m.rev AS DOUBLE) > d.med THEN 1 ELSE -1 END AS sgn
  FROM mrev m JOIN med d ON m.nk = d.nk
  WHERE CAST(m.rev AS DOUBLE) <> d.med
),
seq AS (
  SELECT nk, sgn,
         lag(sgn) OVER (PARTITION BY nk ORDER BY month) AS prev
  FROM cls
),
st AS (
  SELECT nk,
         CAST(1 + count(CASE WHEN prev IS NOT NULL AND sgn <> prev
                             THEN 1 END) AS BIGINT) AS n_runs,
         CAST(count(CASE WHEN sgn = 1 THEN 1 END) AS BIGINT) AS n_above,
         CAST(count(CASE WHEN sgn = -1 THEN 1 END) AS BIGINT) AS n_below
  FROM seq GROUP BY nk
)
SELECT nk AS nationkey, n_runs, n_above, n_below,
       round((n_runs - (2.0 * n_above * n_below / (n_above + n_below) + 1))
             / sqrt(2.0 * n_above * n_below
                    * (2.0 * n_above * n_below - n_above - n_below)
                    / ((n_above + n_below) * (n_above + n_below)
                       * (n_above + n_below - 1.0))), 6) AS z_stat
FROM st
""",
    tags=("A5", "randomness-test", "runs-test"),
)
def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD–WOLFOWITZ RUNS TEST (1940) on each nation's monthly
    revenue series: classify months above/below the series median
    (exact-median ties excluded), count sign runs, and compute the
    normal-approximation z statistic — |z| ≫ 0 means the sequence
    clusters or oscillates rather than varying randomly. Completes
    the series-diagnostics trio: Mann–Kendall (monotone trend), CUSUM
    (level shift), runs test (non-randomness of the residual
    pattern).

    Parity: the median interpolates identically in both engines
    (the Theil–Sen recipe); run counting is pure integers via one
    lag() per nation; the z formula is a single shared double chain
    rounded to 6 dp. Scale shape: one keyed groupBy to month cells,
    two nation-keyed window passes, a 25-row output — nothing grows
    with row count."""
    mrev = _mrev(spark, sf_dir)
    med = mrev.groupBy("nk").agg(
        F.expr("percentile(CAST(rev AS DOUBLE), 0.5)").alias("med")
    )
    cls = (
        mrev.join(med, "nk")
        .filter(F.col("rev").cast("double") != F.col("med"))
        .select(
            "nk",
            "month",
            F.when(F.col("rev").cast("double") > F.col("med"), 1)
            .otherwise(-1)
            .alias("sgn"),
        )
    )
    wl = W.partitionBy("nk").orderBy("month")
    seq = cls.select("nk", "sgn", F.lag("sgn").over(wl).alias("prev"))
    st = seq.groupBy("nk").agg(
        (
            F.lit(1)
            + F.count(
                F.when(
                    F.col("prev").isNotNull() & (F.col("sgn") != F.col("prev")),
                    1,
                )
            )
        )
        .cast("long")
        .alias("n_runs"),
        F.count(F.when(F.col("sgn") == 1, 1)).cast("long").alias("n_above"),
        F.count(F.when(F.col("sgn") == -1, 1)).cast("long").alias("n_below"),
    )
    na, nb, nr = F.col("n_above"), F.col("n_below"), F.col("n_runs")
    return st.select(
        F.col("nk").alias("nationkey"),
        "n_runs",
        "n_above",
        "n_below",
        F.round(
            (nr - (F.lit(2.0) * na * nb / (na + nb) + 1))
            / F.sqrt(
                F.lit(2.0)
                * na
                * nb
                * (F.lit(2.0) * na * nb - na - nb)
                / ((na + nb) * (na + nb) * (na + nb - F.lit(1.0)))
            ),
            6,
        ).alias("z_stat"),
    )


@query(
    "q_spc_control_chart",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
m AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(rev) AS DOUBLE) AS sx,
         CAST(sum(CAST(rev AS DECIMAL(19,2)) * rev) AS DOUBLE) AS sxx
  FROM mrev GROUP BY nk
),
stats AS (
  SELECT nk, n, sx / n AS mu,
         sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1)) AS sigma
  FROM m WHERE n > 1
),
z AS (
  SELECT r.nk, r.month,
         (CAST(r.rev AS DOUBLE) - s.mu) / s.sigma AS z, s.n
  FROM mrev r JOIN stats s ON r.nk = s.nk
),
flags AS (
  SELECT nk, month, z, n,
         CASE WHEN abs(z) > 3 THEN 1 ELSE 0 END AS r1,
         CASE WHEN
           (CASE WHEN z > 2 THEN 1 ELSE 0 END
            + CASE WHEN lag(z, 1) OVER w > 2 THEN 1 ELSE 0 END
            + CASE WHEN lag(z, 2) OVER w > 2 THEN 1 ELSE 0 END) >= 2
           OR
           (CASE WHEN z < -2 THEN 1 ELSE 0 END
            + CASE WHEN lag(z, 1) OVER w < -2 THEN 1 ELSE 0 END
            + CASE WHEN lag(z, 2) OVER w < -2 THEN 1 ELSE 0 END) >= 2
         THEN 1 ELSE 0 END AS r2
  FROM z
  WINDOW w AS (PARTITION BY nk ORDER BY month)
)
SELECT nk AS nationkey, CAST(max(n) AS BIGINT) AS n_months,
       CAST(sum(r1) AS BIGINT) AS n_rule1,
       CAST(sum(r2) AS BIGINT) AS n_rule2,
       round(max(abs(z)), 6) AS worst_z
FROM flags GROUP BY nk
ORDER BY nationkey
""",
    tags=("A5", "spc", "control-chart"),
)
def q_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHEWHART CONTROL CHART with Western Electric rules over each
    nation's monthly revenue: rule 1 (a point beyond 3σ) and rule 2
    (2 of 3 consecutive beyond 2σ on the SAME side) — the process-
    monitoring primitive next to CUSUM (which finds WHERE the level
    shifted; SPC flags months as they violate). μ/σ come from exact
    DECIMAL moments (the (19,2)-widened int128 product, q_acf_revenue
    precedent) so every z is an identical double in both engines; the
    rule windows are nation-keyed lags over month cells — no
    single-partition work, quadratic in nothing."""
    mrev = _mrev(spark, sf_dir)
    m = mrev.groupBy("nk").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("rev").cast("double").alias("sx"),
        F.sum(F.col("rev").cast("decimal(19,2)") * F.col("rev"))
        .cast("double")
        .alias("sxx"),
    )
    mu = F.col("sx") / F.col("n")
    stats = m.filter(F.col("n") > 1).select(
        "nk",
        "n",
        mu.alias("mu"),
        F.sqrt((F.col("sxx") - F.col("n") * mu * mu) / (F.col("n") - 1)).alias(
            "sigma"
        ),
    )
    z = mrev.join(F.broadcast(stats), "nk").select(
        "nk",
        "month",
        "n",
        ((F.col("rev").cast("double") - F.col("mu")) / F.col("sigma")).alias("z"),
    )
    w = W.partitionBy("nk").orderBy("month")
    up = lambda c: F.when(c > 2, 1).otherwise(0)  # noqa: E731
    dn = lambda c: F.when(c < -2, 1).otherwise(0)  # noqa: E731
    zc = F.col("z")
    flags = z.select(
        "nk",
        "n",
        "z",
        F.when(F.abs(zc) > 3, 1).otherwise(0).alias("r1"),
        F.when(
            (up(zc) + up(F.lag("z", 1).over(w)) + up(F.lag("z", 2).over(w)) >= 2)
            | (dn(zc) + dn(F.lag("z", 1).over(w)) + dn(F.lag("z", 2).over(w)) >= 2),
            1,
        )
        .otherwise(0)
        .alias("r2"),
    )
    return (
        flags.groupBy("nk")
        .agg(
            F.max("n").cast("long").alias("n_months"),
            F.sum("r1").cast("long").alias("n_rule1"),
            F.sum("r2").cast("long").alias("n_rule2"),
            F.round(F.max(F.abs(F.col("z"))), 6).alias("worst_z"),
        )
        .withColumnRenamed("nk", "nationkey")
        .orderBy("nationkey")
    )


@query(
    "q_cusum_binary_seg",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
stats AS (
  SELECT nk, CAST(count(*) AS BIGINT) AS n, sum(rev) AS tot
  FROM mrev GROUP BY nk
),
cum AS (
  SELECT m.nk, m.month,
         sum(m.rev) OVER (PARTITION BY m.nk ORDER BY m.month) AS crev,
         row_number() OVER (PARTITION BY m.nk ORDER BY m.month) AS i,
         s.n, s.tot
  FROM mrev m JOIN stats s ON m.nk = s.nk
),
cs1 AS (
  SELECT nk, month,
         CAST(crev AS DOUBLE) - (CAST(i AS DOUBLE) / n) * CAST(tot AS DOUBLE)
           AS cs
  FROM cum
),
cp1 AS (
  SELECT nk, month AS cp_month, round(cs, 6) AS cusum_stat
  FROM (SELECT nk, month, cs,
               row_number() OVER (PARTITION BY nk
                   ORDER BY abs(cs) DESC, month) AS rn
        FROM cs1)
  WHERE rn = 1
),
sides AS (
  SELECT m.nk, m.month, m.rev,
         CASE WHEN m.month <= c.cp_month THEN 'L' ELSE 'R' END AS side
  FROM mrev m JOIN cp1 c ON m.nk = c.nk
),
sstats AS (
  SELECT nk, side, CAST(count(*) AS BIGINT) AS n, sum(rev) AS tot
  FROM sides GROUP BY nk, side
),
scum AS (
  SELECT s.nk, s.side, s.month,
         sum(s.rev) OVER (PARTITION BY s.nk, s.side ORDER BY s.month) AS crev,
         row_number() OVER (PARTITION BY s.nk, s.side ORDER BY s.month) AS i,
         t.n, t.tot
  FROM sides s JOIN sstats t ON s.nk = t.nk AND s.side = t.side
),
scs AS (
  SELECT nk, side, month, n,
         CAST(crev AS DOUBLE) - (CAST(i AS DOUBLE) / n) * CAST(tot AS DOUBLE)
           AS cs
  FROM scum
),
scp AS (
  SELECT nk, side, month
  FROM (SELECT nk, side, month, n,
               row_number() OVER (PARTITION BY nk, side
                   ORDER BY abs(cs) DESC, month) AS rn
        FROM scs)
  WHERE rn = 1 AND n >= 2
)
SELECT c.nk AS nationkey, c.cp_month AS cp1_month, c.cusum_stat,
       max(CASE WHEN s.side = 'L' THEN s.month END) AS cp_left_month,
       max(CASE WHEN s.side = 'R' THEN s.month END) AS cp_right_month
FROM cp1 c LEFT JOIN scp s ON s.nk = c.nk
GROUP BY c.nk, c.cp_month, c.cusum_stat
ORDER BY nationkey
""",
    tags=("A5", "changepoint", "binary-segmentation"),
)
def q_cusum_binary_seg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY SEGMENTATION — the second level of changepoint
    detection: after q_cusum_changepoint finds the dominant shift,
    recurse on each side for the next shift per side (the classic
    multi-changepoint recipe; two levels unrolled keep it one
    declarative plan with an exact oracle, the q_pagerank3 rule for
    iterative algorithms). Sides shorter than 2 months yield NULL.
    Every window is (nation[, side])-keyed over month cells — the
    recursion multiplies KEYS, never row volume."""
    mrev = _mrev(spark, sf_dir)

    def argmax_cs(df, keys):
        w = W.partitionBy(*keys).orderBy("month")
        stats = df.groupBy(*keys).agg(
            F.count(F.lit(1)).cast("long").alias("n"), F.sum("rev").alias("tot")
        )
        cum = df.join(stats, list(keys)).select(
            *keys,
            "month",
            F.sum("rev").over(w).alias("crev"),
            F.row_number().over(w).alias("i"),
            "n",
            "tot",
        )
        cs = cum.select(
            *keys,
            "month",
            "n",
            (
                F.col("crev").cast("double")
                - (F.col("i").cast("double") / F.col("n"))
                * F.col("tot").cast("double")
            ).alias("cs"),
        )
        rw = W.partitionBy(*keys).orderBy(F.abs(F.col("cs")).desc(), "month")
        return cs.withColumn("rn", F.row_number().over(rw)).filter(
            F.col("rn") == 1
        )

    cp1 = argmax_cs(mrev, ("nk",)).select(
        "nk",
        F.col("month").alias("cp_month"),
        F.round("cs", 6).alias("cusum_stat"),
    )
    sides = mrev.join(F.broadcast(cp1.select("nk", "cp_month")), "nk").select(
        "nk",
        "month",
        "rev",
        F.when(F.col("month") <= F.col("cp_month"), "L").otherwise("R").alias(
            "side"
        ),
    )
    scp = (
        argmax_cs(sides, ("nk", "side"))
        .filter(F.col("n") >= 2)
        .select("nk", "side", "month")
    )
    return (
        cp1.join(scp, "nk", "left")
        .groupBy("nk", "cp_month", "cusum_stat")
        .agg(
            F.max(F.when(F.col("side") == "L", F.col("month"))).alias(
                "cp_left_month"
            ),
            F.max(F.when(F.col("side") == "R", F.col("month"))).alias(
                "cp_right_month"
            ),
        )
        .select(
            F.col("nk").alias("nationkey"),
            F.col("cp_month").alias("cp1_month"),
            "cusum_stat",
            "cp_left_month",
            "cp_right_month",
        )
        .orderBy("nationkey")
    )


@query(
    "q_extreme_value_levels",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
mx AS (
  SELECT month, max(rev) AS m FROM mrev GROUP BY month
),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS DOUBLE) AS sx,
         CAST(sum(CAST(m AS DECIMAL(19,2)) * m) AS DOUBLE) AS sxx
  FROM mx
),
fit AS (
  SELECT n,
         sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1))
           * sqrt(6.0) / pi() AS beta,
         (sx / n) - 0.5772156649015329
           * (sqrt((sxx - n * (sx / n) * (sx / n)) / (n - 1))
              * sqrt(6.0) / pi()) AS mu
  FROM mom
)
SELECT n AS n_months, round(mu, 2) AS gumbel_mu, round(beta, 2) AS gumbel_beta,
       round(mu - beta * ln(-ln(1.0 - 1.0/12.0)), 2) AS level_1y,
       round(mu - beta * ln(-ln(1.0 - 1.0/60.0)), 2) AS level_5y,
       round(mu - beta * ln(-ln(1.0 - 1.0/120.0)), 2) AS level_10y
FROM fit
""",
    tags=("A5", "extreme-value", "gumbel"),
)
def q_extreme_value_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTREME-VALUE RETURN LEVELS (Gumbel, method of moments) over
    monthly maximum nation-revenues: the "what peak should we
    provision for once a year / 5 years / 10 years" question capacity
    planning asks of every load metric. β = s·√6/π, μ = x̄ − γβ
    (Euler–Mascheroni as an explicit literal so both engines use the
    same constant), return level x_T = μ − β·ln(−ln(1−1/T)). Block
    maxima via one month-grid aggregate; moments exact DECIMAL
    ((19,2)-widened product); the fit itself is a shared double
    chain. DuckDB's pi() and Spark's lit(math.pi) are the same IEEE
    double."""
    import math

    mrev = _mrev(spark, sf_dir)
    mx = mrev.groupBy("month").agg(F.max("rev").alias("m"))
    mom = mx.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("m").cast("double").alias("sx"),
        F.sum(F.col("m").cast("decimal(19,2)") * F.col("m"))
        .cast("double")
        .alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    mean = sx / n
    std = F.sqrt((sxx - n * mean * mean) / (n - 1))
    beta = std * F.lit(math.sqrt(6.0)) / F.lit(math.pi)
    mu = mean - F.lit(0.5772156649015329) * beta
    def lvl(t):
        return F.round(mu - beta * F.log(-F.log(F.lit(1.0 - 1.0 / t))), 2)
    fit = mom.select(
        n.alias("n_months"),
        F.round(mu, 2).alias("gumbel_mu"),
        F.round(beta, 2).alias("gumbel_beta"),
        lvl(12.0).alias("level_1y"),
        lvl(60.0).alias("level_5y"),
        lvl(120.0).alias("level_10y"),
    )
    return fit


@query(
    "q_forecast_mase",
    oracle=f"""
WITH mrev AS ({_SQL_MREV}),
lagged AS (
  SELECT nk, month, rev,
         lag(rev, 1) OVER (PARTITION BY nk ORDER BY month) AS prev1,
         lag(rev, 12) OVER (PARTITION BY nk ORDER BY month) AS prev12
  FROM mrev
),
err AS (
  SELECT nk,
         CAST(count(CASE WHEN prev12 IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_seasonal,
         sum(CASE WHEN prev12 IS NOT NULL THEN abs(rev - prev12) END)
           AS sae_seasonal,
         CAST(count(CASE WHEN prev1 IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_naive,
         sum(CASE WHEN prev1 IS NOT NULL THEN abs(rev - prev1) END)
           AS sae_naive
  FROM lagged GROUP BY nk
)
SELECT nk AS nationkey, n_seasonal, n_naive,
       round(CAST(sae_seasonal AS DOUBLE) / n_seasonal, 2) AS mae_seasonal,
       round(CAST(sae_naive AS DOUBLE) / n_naive, 2) AS mae_naive,
       round((CAST(sae_seasonal AS DOUBLE) / n_seasonal)
             / (CAST(sae_naive AS DOUBLE) / n_naive), 6) AS mase
FROM err ORDER BY nationkey
""",
    tags=("A5", "forecasting", "mase"),
)
def q_forecast_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE — Mean Absolute Scaled Error (Hyndman & Koehler 2006, the
    scale-free forecast-accuracy standard): the seasonal-naive
    forecast (x_{t−12}) scored against the naive one-step baseline
    (x_{t−1}) per nation. MASE < 1 ⇒ the seasonal model beats naive
    drift — the go/no-go gate before q_forecast_revenue_change's
    model ships. Absolute errors are exact DECIMAL differences summed
    exactly; two divides and one ratio at the end. One nation-keyed
    lag window over month cells."""
    mrev = _mrev(spark, sf_dir)
    pw = W.partitionBy("nk").orderBy("month")
    lagged = mrev.select(
        "nk",
        "rev",
        F.lag("rev", 1).over(pw).alias("prev1"),
        F.lag("rev", 12).over(pw).alias("prev12"),
    )
    err = lagged.groupBy("nk").agg(
        F.count(F.when(F.col("prev12").isNotNull(), 1)).cast("long").alias(
            "n_seasonal"
        ),
        F.sum(
            F.when(
                F.col("prev12").isNotNull(),
                F.abs(F.col("rev") - F.col("prev12")),
            )
        ).alias("sae_seasonal"),
        F.count(F.when(F.col("prev1").isNotNull(), 1)).cast("long").alias(
            "n_naive"
        ),
        F.sum(
            F.when(
                F.col("prev1").isNotNull(), F.abs(F.col("rev") - F.col("prev1"))
            )
        ).alias("sae_naive"),
    )
    mae_s = F.col("sae_seasonal").cast("double") / F.col("n_seasonal")
    mae_n = F.col("sae_naive").cast("double") / F.col("n_naive")
    return err.select(
        F.col("nk").alias("nationkey"),
        "n_seasonal",
        "n_naive",
        F.round(mae_s, 2).alias("mae_seasonal"),
        F.round(mae_n, 2).alias("mae_naive"),
        F.round(mae_s / mae_n, 6).alias("mase"),
    ).orderBy("nationkey")
