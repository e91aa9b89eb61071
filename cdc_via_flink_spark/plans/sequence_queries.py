"""Event-sequence analytics: Markov chains over the CDC event stream,
marketing attribution, and survival analysis — the "what happens
next / what caused it / how long until it happens" family that sits
on top of the reconstructed event sequences the reference's pipelines
produce (SURVEY.md §2.8 extension surface; the reference itself,
`DebeziumTransactionReconstructor.java`, stops at reassembly).

Scale shapes: every per-user sequence operator is ONE user-keyed
window (single shuffle); the Markov matrix / week grid / credit table
downstream work runs on state-space-sized rows (~25 / ~53 / ~6), so
the iterative and cumulative parts never touch input-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.plans.parity import dec
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Markov transition matrix
# ---------------------------------------------------------------------------

_SQL_TRANS = """
SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
FROM (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
)
WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


@query(
    "q_markov_transitions",
    oracle=f"""
WITH t AS ({_SQL_TRANS}),
r AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
      FROM t GROUP BY from_type)
SELECT t.from_type, t.to_type, t.c,
       round(CAST(t.c AS DOUBLE) / r.row_total, 6) AS p
FROM t JOIN r ON t.from_type = r.from_type
ORDER BY t.from_type, t.to_type
""",
    tags=("sequence", "markov", "A5"),
)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER MARKOV TRANSITION MATRIX of user event sequences —
    P(next event type | current), the behavioral model behind
    session-path products (and q_markov_stationary's input). One
    user-keyed lead() window (single shuffle), then a groupBy on the
    |types|² ≈ 25-row state space; row-conditional probabilities are
    exact counts with one double divide."""
    e = _t(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    r = t.groupBy("from_type").agg(F.sum("c").cast("long").alias("row_total"))
    return (
        t.join(F.broadcast(r), "from_type")
        .select(
            "from_type",
            "to_type",
            "c",
            F.round(F.col("c").cast("double") / F.col("row_total"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# Stationary distribution (unrolled power iteration, decimal-exact)
# ---------------------------------------------------------------------------

_K_ITER = 16
_DP = "decimal(18,12)"


def _stationary_oracle_iters() -> list:
    its = []
    prev = "pi0"
    for i in range(1, _K_ITER + 1):
        its.append(f"""
pi{i} AS (
  SELECT m.to_type AS state,
         CAST(round(sum(p.pi * m.p), 12) AS DECIMAL(18,12)) AS pi
  FROM {prev} p JOIN m ON m.from_type = p.state
  GROUP BY m.to_type
)""")
        prev = f"pi{i}"
    return its


def _stationary_oracle() -> str:
    its = _stationary_oracle_iters()
    prev = f"pi{_K_ITER}"
    return f"""
WITH t AS ({_SQL_TRANS}),
r AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
      FROM t GROUP BY from_type),
m AS (
  SELECT t.from_type, t.to_type,
         CAST(round(CAST(t.c AS DOUBLE) / r.row_total, 12)
              AS DECIMAL(18,12)) AS p
  FROM t JOIN r ON t.from_type = r.from_type
),
states AS (SELECT from_type AS state FROM r),
n AS (SELECT count(*) AS ns FROM states),
pi0 AS (
  SELECT state,
         CAST(round(1.0 / (SELECT ns FROM n), 12) AS DECIMAL(18,12)) AS pi
  FROM states
),{",".join(its)}
SELECT state, CAST(pi AS DOUBLE) AS pi FROM {prev} ORDER BY state
"""


@query(
    "q_markov_stationary",
    oracle=_stationary_oracle(),
    tags=("sequence", "markov", "iterative-unrolled"),
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIONARY DISTRIBUTION of the event-type Markov chain — 16
    unrolled power iterations π' = πP, the long-run share of time a
    user spends in each state (the q_pagerank3 recipe on the event
    chain; PageRank IS this computation plus damping).

    Exactness: matrix entries and π are DECIMAL(18,12); each
    iteration's products run exact ((18,12)×(18,12) → (37,24), inside
    int128 in both engines), sums are exact, and ONE round-to-12
    closes each iteration — so 16 iterations accumulate zero float
    drift and the oracle matches bit-for-bit. The iteration runs on
    the ≤25-row matrix; the only input-sized work is the lead()
    window building the transition counts."""
    e = _t(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    r = t.groupBy("from_type").agg(F.sum("c").cast("long").alias("row_total"))
    m = t.join(r, "from_type").select(
        "from_type",
        "to_type",
        F.round(F.col("c").cast("double") / F.col("row_total"), 12)
        .cast(_DP)
        .alias("p"),
    )
    states = r.select(F.col("from_type").alias("state"))
    n = states.agg(F.count(F.lit(1)).alias("ns"))
    pi = states.crossJoin(F.broadcast(n)).select(
        "state",
        F.round(F.lit(1.0) / F.col("ns"), 12).cast(_DP).alias("pi"),
    )
    for _ in range(_K_ITER):
        pi = (
            pi.join(m, pi.state == m.from_type)
            .groupBy(F.col("to_type").alias("state"))
            .agg(
                F.round(F.sum(F.col("pi") * F.col("p")), 12)
                .cast(_DP)
                .alias("pi")
            )
        )
    return pi.select("state", F.col("pi").cast("double").alias("pi")).orderBy(
        "state"
    )


# ---------------------------------------------------------------------------
# Last-touch attribution
# ---------------------------------------------------------------------------

_ATTR_WINDOW_S = 7 * 24 * 3600  # 7-day lookback


@query(
    "q_attribution_last_touch",
    oracle=f"""
WITH seq AS (
  SELECT event_type, epoch(ts) AS es,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type,
         last_value(CASE WHEN event_type <> 'purchase' THEN epoch(ts) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_es
  FROM events
),
credit AS (
  SELECT CASE WHEN touch_type IS NOT NULL
               AND es - touch_es <= {_ATTR_WINDOW_S}
              THEN touch_type ELSE 'direct' END AS channel
  FROM seq WHERE event_type = 'purchase'
),
c AS (SELECT channel, CAST(count(*) AS BIGINT) AS conversions
      FROM credit GROUP BY channel),
t AS (SELECT CAST(sum(conversions) AS BIGINT) AS total FROM c)
SELECT c.channel, c.conversions,
       round(CAST(c.conversions AS DOUBLE) / t.total, 6) AS share
FROM c CROSS JOIN t
ORDER BY c.channel
""",
    tags=("sequence", "attribution", "J5"),
)
def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH ATTRIBUTION — each purchase credits the user's most
    recent non-purchase event within a 7-day lookback, else 'direct':
    the as-of-join-shaped marketing query, expressed as ONE user-keyed
    window (last(..., ignorenulls) over rows up to the previous event)
    instead of a range self-join — the same single-shuffle argument as
    q_asof_last_purchase, but inline in the sequence. Touch type and
    time come from the same IGNORE-NULLS pattern (null iff purchase),
    so they can never desynchronize. Timestamps compare as epoch
    seconds (exact BIGINTs)."""
    e = _t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    non_p = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    non_es = F.when(
        F.col("event_type") != "purchase", F.unix_timestamp("ts")
    )
    seq = e.select(
        "event_type",
        F.unix_timestamp("ts").alias("es"),
        F.last(non_p, ignorenulls=True).over(w).alias("touch_type"),
        F.last(non_es, ignorenulls=True).over(w).alias("touch_es"),
    )
    credit = seq.filter(F.col("event_type") == "purchase").select(
        F.when(
            F.col("touch_type").isNotNull()
            & (F.col("es") - F.col("touch_es") <= _ATTR_WINDOW_S),
            F.col("touch_type"),
        )
        .otherwise("direct")
        .alias("channel")
    )
    c = credit.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("conversions")
    )
    t = c.agg(F.sum("conversions").cast("long").alias("total"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "channel",
            "conversions",
            F.round(F.col("conversions").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Kaplan–Meier survival: time to second order
# ---------------------------------------------------------------------------

_KM_MAX_WEEK = 52


@query(
    "q_survival_km",
    oracle=f"""
WITH r AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
dur AS (
  SELECT f.o_custkey,
         CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS ev,
         least(CAST(floor(date_diff('day', f.o_orderdate,
                 COALESCE(s.o_orderdate, horizon.h)) / 7) AS BIGINT),
               {_KM_MAX_WEEK}) AS wk
  FROM (SELECT * FROM r WHERE rn = 1) f
  LEFT JOIN (SELECT * FROM r WHERE rn = 2) s ON f.o_custkey = s.o_custkey
  CROSS JOIN horizon
),
g AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(ev) AS BIGINT) AS d_events
  FROM dur GROUP BY wk
),
risk AS (
  SELECT wk, d_events,
         CAST(sum(n_total) OVER (ORDER BY wk DESC) AS BIGINT) AS n_risk
  FROM g
),
fac AS (
  SELECT wk, n_risk, d_events,
         CAST(round(1.0 - CAST(d_events AS DOUBLE) / n_risk, 12) AS DOUBLE)
           AS f
  FROM risk
),
km AS (
  SELECT wk, n_risk, d_events,
         CASE WHEN min(f) OVER (ORDER BY wk) = 0 THEN 0.0
              ELSE exp(sum(ln(CASE WHEN f > 0 THEN f ELSE 1.0 END))
                       OVER (ORDER BY wk)) END AS s
  FROM fac
)
SELECT wk, n_risk, d_events,
       round(CAST(d_events AS DOUBLE) / n_risk, 6) AS hazard,
       round(s, 6) AS survival
FROM km
ORDER BY wk
""",
    tags=("sequence", "survival", "kaplan-meier"),
)
def q_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER SURVIVAL of time-to-repeat-purchase: per customer,
    weeks from first to second order (censored at the dataset horizon
    if none), weekly risk sets n_t = Σ_{w≥t} count(w) via a reverse
    cumulative sum over the ≤53-week grid, hazard d_t/n_t, and
    S(t) = Π_{j≤t}(1 − d_j/n_j) — the churn curve that sets retention
    budgets (q_cohort_retention's model-based sibling).

    Scale/parity: the input-sized work is one customer-keyed
    row_number window; everything cumulative runs on the bounded week
    grid. Counts are exact integers; each KM factor is one double
    divide ROUNDED to 12 dp before the ln/exp product chain, and the
    output rounds to 6 dp — the same shared-double-chain policy as
    q_runs_test (both engines evaluate ln/exp over identical
    doubles)."""
    o = _t(spark, sf_dir, "orders")
    r = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    f = r.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("d1")
    )
    s = r.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("d2")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    dur = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
            F.least(
                F.floor(
                    F.datediff(F.coalesce(F.col("d2"), F.col("h")), F.col("d1"))
                    / 7
                ).cast("long"),
                F.lit(_KM_MAX_WEEK).cast("long"),
            ).alias("wk"),
        )
    )
    g = dur.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("ev").cast("long").alias("d_events"),
    )
    risk = g.select(
        "wk",
        "d_events",
        F.sum("n_total").over(W.orderBy(F.col("wk").desc())).cast("long").alias(
            "n_risk"
        ),
    )
    fac = risk.select(
        "wk",
        "n_risk",
        "d_events",
        F.round(
            1.0 - F.col("d_events").cast("double") / F.col("n_risk"), 12
        ).alias("f"),
    )
    # a week where everyone at risk converts (f == 0) zeroes survival
    # from then on; ln only ever sees nonzero factors
    km = fac.select(
        "wk",
        "n_risk",
        "d_events",
        F.when(F.min("f").over(W.orderBy("wk")) == 0, F.lit(0.0))
        .otherwise(
            F.exp(
                F.sum(
                    F.log(F.when(F.col("f") > 0, F.col("f")).otherwise(1.0))
                ).over(W.orderBy("wk"))
            )
        )
        .alias("s"),
    )
    return km.select(
        "wk",
        "n_risk",
        "d_events",
        F.round(F.col("d_events").cast("double") / F.col("n_risk"), 6).alias(
            "hazard"
        ),
        F.round("s", 6).alias("survival"),
    ).orderBy("wk")


@query(
    "q_attribution_linear",
    oracle=f"""
WITH p AS (
  SELECT user_id, event_id AS pid, epoch(ts) AS pes
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type AS channel, epoch(ts) AS tes
  FROM events WHERE event_type <> 'purchase'
),
tw AS (
  SELECT p.pid, t.channel
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.tes < p.pes AND p.pes - t.tes <= {_ATTR_WINDOW_S}
),
n AS (SELECT pid, CAST(count(*) AS BIGINT) AS n_touch FROM tw GROUP BY pid),
pc AS (
  SELECT tw.pid, tw.channel, CAST(count(*) AS BIGINT) AS c, n.n_touch
  FROM tw JOIN n ON tw.pid = n.pid GROUP BY tw.pid, tw.channel, n.n_touch
),
credit AS (
  SELECT channel,
         sum(CAST(round(CAST(c AS DOUBLE) / n_touch, 12)
                  AS DECIMAL(28,12))) AS credit
  FROM pc GROUP BY channel
  UNION ALL
  SELECT 'direct' AS channel,
         CAST(count(*) AS DECIMAL(28,12)) AS credit
  FROM p WHERE NOT EXISTS (SELECT 1 FROM tw WHERE tw.pid = p.pid)
),
tot AS (SELECT CAST(sum(credit) AS DOUBLE) AS total FROM credit)
SELECT c.channel, round(CAST(c.credit AS DOUBLE), 6) AS credit,
       round(CAST(c.credit AS DOUBLE) / t.total, 6) AS share
FROM credit c CROSS JOIN tot t
ORDER BY c.channel
""",
    tags=("sequence", "attribution", "multi-touch"),
)
def q_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR MULTI-TOUCH ATTRIBUTION — every touch in the 7-day
    window before a purchase shares the conversion credit equally
    (1/n each), the fairness counterpoint to
    q_attribution_last_touch's winner-takes-all. Touch-purchase pairs
    come from a USER-keyed range join (pair space bounded by
    per-user event counts — the dedup blocking argument on the user
    key); fractional credits are rounded to 12 dp and folded as
    DECIMAL(28,12) so channel totals are association-order
    independent; untouched purchases credit 'direct' wholly."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.unix_timestamp("ts").alias("pes"),
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_timestamp("ts").alias("tes"),
    )
    tw = p.join(t, "user_id").filter(
        (F.col("tes") < F.col("pes"))
        & (F.col("pes") - F.col("tes") <= _ATTR_WINDOW_S)
    ).select("pid", "channel")
    n = tw.groupBy("pid").agg(F.count(F.lit(1)).cast("long").alias("n_touch"))
    pc = (
        tw.groupBy("pid", "channel")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .join(F.broadcast(n), "pid")
    )
    touched = pc.groupBy("channel").agg(
        F.sum(
            F.round(F.col("c").cast("double") / F.col("n_touch"), 12).cast(
                "decimal(28,12)"
            )
        ).alias("credit")
    )
    direct = (
        p.join(tw.select("pid").distinct(), "pid", "left_anti")
        .agg(F.count(F.lit(1)).cast("decimal(28,12)").alias("credit"))
        .select(F.lit("direct").alias("channel"), "credit")
    )
    credit = touched.unionByName(direct)
    tot = credit.agg(F.sum("credit").cast("double").alias("total"))
    return (
        credit.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("credit").cast("double"), 6).alias("credit"),
            F.round(F.col("credit").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard (Fleming-Harrington survival)
# ---------------------------------------------------------------------------


@query(
    "q_nelson_aalen",
    oracle=f"""
WITH r AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
dur AS (
  SELECT f.o_custkey,
         CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS ev,
         least(CAST(floor(date_diff('day', f.o_orderdate,
                 COALESCE(s.o_orderdate, horizon.h)) / 7) AS BIGINT),
               {_KM_MAX_WEEK}) AS wk
  FROM (SELECT * FROM r WHERE rn = 1) f
  LEFT JOIN (SELECT * FROM r WHERE rn = 2) s ON f.o_custkey = s.o_custkey
  CROSS JOIN horizon
),
g AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(ev) AS BIGINT) AS d_events
  FROM dur GROUP BY wk
),
risk AS (
  SELECT wk, d_events,
         CAST(sum(n_total) OVER (ORDER BY wk DESC) AS BIGINT) AS n_risk
  FROM g
),
haz AS (
  SELECT wk, n_risk, d_events,
         CAST(round(CAST(d_events AS DOUBLE) / n_risk, 12)
              AS DECIMAL(28,12)) AS h
  FROM risk
),
na AS (
  SELECT wk, n_risk, d_events,
         CAST(sum(h) OVER (ORDER BY wk) AS DOUBLE) AS ch
  FROM haz
)
SELECT wk, n_risk, d_events,
       round(ch, 6) AS cum_hazard,
       round(exp(-ch), 6) AS s_fleming
FROM na
ORDER BY wk
""",
    tags=("sequence", "survival", "nelson-aalen"),
)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN CUMULATIVE HAZARD of time-to-repeat-purchase, and
    the Fleming-Harrington survival exp(-H(t)) it induces — the
    sum-of-hazards counterpart to q_survival_km's product-limit
    estimator (the two agree closely where weekly hazards are small
    and diverge exactly where conversion spikes, which is the
    diagnostic the pair exists for).

    Scale/parity: identical shape to q_survival_km — one
    customer-keyed row_number window is the only input-sized work;
    the cumulative sum runs over the <=53-week grid. Each weekly
    hazard d_t/n_t is one double divide ROUNDED to 12 dp and folded
    as DECIMAL(28,12), so the running sum H(t) is
    association-order-independent and bit-equal across engines;
    exp(-H) is one libm call over identical doubles."""
    o = _t(spark, sf_dir, "orders")
    r = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    f = r.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("d1")
    )
    s = r.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("d2")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    dur = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
            F.least(
                F.floor(
                    F.datediff(F.coalesce(F.col("d2"), F.col("h")), F.col("d1"))
                    / 7
                ).cast("long"),
                F.lit(_KM_MAX_WEEK).cast("long"),
            ).alias("wk"),
        )
    )
    g = dur.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("ev").cast("long").alias("d_events"),
    )
    risk = g.select(
        "wk",
        "d_events",
        F.sum("n_total").over(W.orderBy(F.col("wk").desc())).cast("long").alias(
            "n_risk"
        ),
    )
    haz = risk.select(
        "wk",
        "n_risk",
        "d_events",
        F.round(F.col("d_events").cast("double") / F.col("n_risk"), 12)
        .cast("decimal(28,12)")
        .alias("h"),
    )
    na = haz.select(
        "wk",
        "n_risk",
        "d_events",
        F.sum("h").over(W.orderBy("wk")).cast("double").alias("ch"),
    )
    return na.select(
        "wk",
        "n_risk",
        "d_events",
        F.round("ch", 6).alias("cum_hazard"),
        F.round(F.exp(-F.col("ch")), 6).alias("s_fleming"),
    ).orderBy("wk")


# ---------------------------------------------------------------------------
# Exact Shapley-value attribution over channel-exposure coalitions
# ---------------------------------------------------------------------------

_SHAP_LATTICE_CAP = 127  # static subset enumeration bound (supports <=7 channels)


@query(
    "q_attribution_shapley",
    oracle=f"""
WITH ch AS MATERIALIZED (
  SELECT channel, CAST(row_number() OVER (ORDER BY channel) - 1 AS INT) AS idx
  FROM (SELECT DISTINCT event_type AS channel FROM events
        WHERE event_type <> 'purchase')
),
n AS (SELECT CAST(count(*) AS INT) AS nch FROM ch),
ue AS (
  SELECT DISTINCT e.user_id, ch.idx
  FROM events e JOIN ch ON e.event_type = ch.channel
),
um AS (
  SELECT user_id, CAST(sum(1 << idx) AS BIGINT) AS mask
  FROM ue GROUP BY user_id
),
conv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
coh AS (
  SELECT um.mask,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conv
  FROM um LEFT JOIN conv c ON um.user_id = c.user_id
  GROUP BY um.mask
),
r AS MATERIALIZED (
  SELECT mask,
         CAST(round(CAST(n_conv AS DOUBLE) / n_users, 12)
              AS DECIMAL(18,12)) AS cr
  FROM coh
),
lat AS (
  SELECT CAST(g AS BIGINT) AS mask
  FROM generate_series(0, {_SHAP_LATTICE_CAP}) t(g)
  WHERE g < (SELECT 1 << nch FROM n)
),
pairs AS (
  SELECT c.channel, c.idx, l.mask
  FROM ch c CROSS JOIN lat l
  WHERE (l.mask & (1 << c.idx)) = 0
),
contrib AS (
  SELECT p.channel,
         CAST(factorial(bit_count(p.mask))
              * factorial((SELECT nch FROM n) - 1 - bit_count(p.mask))
              AS BIGINT) AS w,
         COALESCE(rw.cr, CAST(0 AS DECIMAL(18,12)))
           - COALESCE(ro.cr, CAST(0 AS DECIMAL(18,12))) AS marg
  FROM pairs p
  LEFT JOIN r rw ON rw.mask = (p.mask | (1 << p.idx))
  LEFT JOIN r ro ON ro.mask = p.mask
),
phi AS (
  SELECT channel,
         CAST(sum(w * marg) AS DOUBLE)
           / CAST((SELECT factorial(nch) FROM n) AS DOUBLE) AS phi
  FROM contrib GROUP BY channel
),
tot AS (
  SELECT CAST(sum(CAST(round(phi, 12) AS DECIMAL(28,12))) AS DOUBLE) AS total
  FROM phi
)
SELECT p.channel,
       round(p.phi, 6) AS shapley_value,
       round(CASE WHEN t.total <> 0 THEN p.phi / t.total ELSE 0.0 END, 6)
         AS credit_share
FROM phi p CROSS JOIN tot t
ORDER BY p.channel
""",
    tags=("sequence", "attribution", "shapley"),
)
def q_attribution_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SHAPLEY-VALUE ATTRIBUTION (Shapley 1953, as used for
    marketing credit in Zhao et al. 2018): the coalition worth
    v(S) is the observed conversion RATE of users exposed to exactly
    channel subset S, and each channel's credit is its exact Shapley
    value phi_i = sum_S |S|!(n-1-|S|)!/n! * (v(S+i) - v(S)) — the
    principled alternative to the heuristic last-touch/linear rules
    (this one uniquely satisfies efficiency + symmetry + dummy).

    Scale shape: the ONLY input-sized work is one distinct + groupBy
    per user (exposure bitmask via sum of distinct channel bits, one
    shuffle on user_id); everything Shapley runs on the 2^n-subset
    lattice (n = |channels|, statically enumerated to 128 rows and
    pruned to the observed channel count), so a 100 TB event log
    costs the same lattice work as a 10 GB one. Exactness: coalition
    rates are 12-dp DECIMAL, permutation weights are INTEGER
    factorials (phi scaled by n! stays integer-weighted DECIMAL until
    one final double divide), so both engines agree bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    ch = (
        e.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("channel"))
        .distinct()
        .select(
            "channel",
            (F.row_number().over(W.orderBy("channel")) - 1)
            .cast("int")
            .alias("idx"),
        )
    )
    n = ch.agg(F.count(F.lit(1)).cast("int").alias("nch"))
    ue = (
        e.join(F.broadcast(ch), e.event_type == ch.channel)
        .select("user_id", "idx")
        .distinct()
    )
    um = ue.groupBy("user_id").agg(
        F.sum(F.expr("shiftleft(1, idx)")).cast("long").alias("mask")
    )
    conv = (
        e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    coh = (
        um.join(conv.withColumn("cv", F.lit(1)), "user_id", "left")
        .groupBy("mask")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.coalesce(F.col("cv"), F.lit(0))).cast("long").alias("n_conv"),
        )
    )
    r = coh.select(
        "mask",
        F.round(F.col("n_conv").cast("double") / F.col("n_users"), 12)
        .cast("decimal(18,12)")
        .alias("cr"),
    )
    lat = (
        spark.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(_SHAP_LATTICE_CAP))).alias("g")
        )
        .crossJoin(F.broadcast(n))
        .filter(F.col("g") < F.expr("shiftleft(1, nch)"))
        .select(F.col("g").cast("long").alias("mask"), "nch")
    )
    pairs = ch.crossJoin(lat).filter(
        F.col("mask").bitwiseAND(F.expr("shiftleft(1, idx)")) == 0
    ).withColumn("mask_w", F.expr("cast(mask | shiftleft(1, idx) as bigint)"))
    zero = F.lit(0).cast("decimal(18,12)")
    rw = r.select(F.col("mask").alias("mw"), F.col("cr").alias("cr_w"))
    ro = r.select(F.col("mask").alias("mo"), F.col("cr").alias("cr_o"))
    contrib = (
        pairs.join(
            F.broadcast(rw),
            pairs.mask_w == rw.mw,
            "left",
        )
        .join(F.broadcast(ro), pairs.mask == ro.mo, "left")
        .select(
            "channel",
            "nch",
            (
                F.factorial(F.bit_count(F.col("mask")).cast("int"))
                * F.factorial(F.col("nch") - 1 - F.bit_count(F.col("mask")).cast("int"))
            )
            .cast("long")
            .alias("w"),
            (
                F.coalesce(F.col("cr_w"), zero) - F.coalesce(F.col("cr_o"), zero)
            ).alias("marg"),
        )
    )
    phi = contrib.groupBy("channel", "nch").agg(
        (
            F.sum(F.col("w") * F.col("marg")).cast("double")
            / F.factorial(F.col("nch").cast("int")).cast("double")
        ).alias("phi")
    )
    tot = phi.agg(
        F.sum(F.round(F.col("phi"), 12).cast("decimal(28,12)"))
        .cast("double")
        .alias("total")
    )
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round("phi", 6).alias("shapley_value"),
            F.round(
                F.when(
                    F.col("total") != 0, F.col("phi") / F.col("total")
                ).otherwise(0.0),
                6,
            ).alias("credit_share"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (absorbing chain, log-step squaring)
# ---------------------------------------------------------------------------

# Channel universe is a PARAMETER of the operator (the removal chains are
# enumerated per channel); pinned to the synthetic event vocabulary here.
_MKV_CHANNELS = ("click", "error", "signup", "view")
_MKV_SQUARINGS = 6  # P^(2^6) = P^64 — the declared K-step absorption horizon


def _mkv_edges_sql() -> str:
    """Shared journey->edge CTE prefix (DuckDB dialect)."""
    return """
pe AS (
  SELECT user_id, ts, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
fp AS MATERIALIZED (
  SELECT user_id, ts AS pts, event_id AS pid FROM pe WHERE rn = 1
),
chev AS MATERIALIZED (
  SELECT e.user_id, e.event_type AS ch, e.ts, e.event_id
  FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
  WHERE e.event_type <> 'purchase'
    AND (fp.user_id IS NULL OR e.ts < fp.pts
         OR (e.ts = fp.pts AND e.event_id < fp.pid))
),
seqd AS MATERIALIZED (
  SELECT user_id, ch,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS nc,
         lead(ch) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM chev
),
term AS MATERIALIZED (
  SELECT u.user_id,
         CASE WHEN fp.user_id IS NULL THEN 'drop' ELSE 'conv' END AS t
  FROM (SELECT DISTINCT user_id FROM events) u
  LEFT JOIN fp ON u.user_id = fp.user_id
),
edges AS (
  SELECT 'start' AS from_type, ch AS to_type FROM seqd WHERE rn = 1
  UNION ALL
  SELECT ch, nxt FROM seqd WHERE nxt IS NOT NULL
  UNION ALL
  SELECT s.ch, t.t FROM seqd s JOIN term t ON s.user_id = t.user_id
  WHERE s.rn = s.nc
  UNION ALL
  SELECT 'start', t.t
  FROM term t
  LEFT JOIN (SELECT DISTINCT user_id FROM chev) c ON t.user_id = c.user_id
  WHERE c.user_id IS NULL
),
tc AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS c
  FROM edges GROUP BY from_type, to_type
),
rt AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
       FROM tc GROUP BY from_type),
m_full AS MATERIALIZED (
  SELECT tc.from_type, tc.to_type,
         CAST(round(CAST(tc.c AS DOUBLE) / rt.row_total, 12)
              AS DECIMAL(18,12)) AS p
  FROM tc JOIN rt ON tc.from_type = rt.from_type
  UNION ALL SELECT 'conv', 'conv', CAST(1 AS DECIMAL(18,12))
  UNION ALL SELECT 'drop', 'drop', CAST(1 AS DECIMAL(18,12))
)"""


def _mkv_chain_sql(nm: str, base_sql: str) -> str:
    """CTEs squaring matrix ``nm`` _MKV_SQUARINGS times (DuckDB)."""
    parts = [f"{nm}_1 AS MATERIALIZED ({base_sql})"]
    k = 1
    for _ in range(_MKV_SQUARINGS):
        parts.append(f"""
{nm}_{2 * k} AS MATERIALIZED (
  SELECT a.from_type, b.to_type,
         CAST(round(sum(a.p * b.p), 12) AS DECIMAL(18,12)) AS p
  FROM {nm}_{k} a JOIN {nm}_{k} b ON a.to_type = b.from_type
  GROUP BY a.from_type, b.to_type
)""")
        k *= 2
    return ",\n".join(parts), f"{nm}_{k}"


def _mkv_oracle() -> str:
    chains = []
    final = {}
    sql, last = _mkv_chain_sql("mq_full", "SELECT * FROM m_full")
    chains.append(sql)
    final["full"] = last
    for c in _MKV_CHANNELS:
        base = f"""
  SELECT from_type,
         CASE WHEN to_type = '{c}' THEN 'drop' ELSE to_type END AS to_type,
         CAST(sum(p) AS DECIMAL(18,12)) AS p
  FROM m_full WHERE from_type <> '{c}'
  GROUP BY from_type, CASE WHEN to_type = '{c}' THEN 'drop' ELSE to_type END
"""
        sql, last = _mkv_chain_sql(f"mq_{c}", base)
        chains.append(sql)
        final[c] = last
    pconv = ",\n".join(
        f"""
p_{name} AS (
  SELECT COALESCE(
    (SELECT CAST(p AS DOUBLE) FROM {last}
     WHERE from_type = 'start' AND to_type = 'conv'), 0.0) AS p
)"""
        for name, last in final.items()
    )
    re_rows = "\nUNION ALL\n".join(
        f"""SELECT '{c}' AS channel,
       (SELECT p FROM p_full) AS p_full,
       (SELECT p FROM p_{c}) AS p_removed"""
        for c in _MKV_CHANNELS
    )
    return f"""
WITH {_mkv_edges_sql()},
{",".join(chains)},
{pconv},
base AS ({re_rows}),
re AS (
  SELECT channel, p_full, p_removed,
         greatest(CAST(0 AS DECIMAL(18,12)),
                  CAST(round(CASE WHEN p_full > 0
                                  THEN 1.0 - p_removed / p_full
                                  ELSE 0.0 END, 12)
                       AS DECIMAL(18,12))) AS eff
  FROM base
),
tot AS (SELECT CAST(sum(eff) AS DECIMAL(28,12)) AS total FROM re)
SELECT re.channel,
       round(re.p_full, 6) AS p_conv_full,
       round(re.p_removed, 6) AS p_conv_removed,
       round(CAST(re.eff AS DOUBLE), 6) AS removal_effect,
       round(CASE WHEN t.total <> 0
                  THEN CAST(re.eff AS DOUBLE) / CAST(t.total AS DOUBLE)
                  ELSE 0.0 END, 6) AS credit_share
FROM re CROSS JOIN tot t
ORDER BY re.channel
"""


@query(
    "q_attribution_markov",
    oracle=_mkv_oracle(),
    tags=("sequence", "attribution", "markov", "iterative-unrolled"),
)
def q_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016): model
    user journeys as a first-order absorbing Markov chain (states =
    start, channels, conv, drop), compute the conversion probability
    P(conv | start), then for each channel recompute it with that
    channel REMOVED (its inbound edges rerouted to drop); the credit
    is the normalized removal effect 1 - P_removed/P_full — the
    counterfactual "how much conversion do we lose without this
    channel" that last-touch/linear/Shapley (all exposure-based)
    cannot answer.

    Absorption probabilities are computed by LOG-STEP MATRIX SQUARING:
    P -> P^2 -> ... -> P^64 (conv/drop made absorbing via unit
    self-loops); the declared statistic is the 64-step absorption
    probability, which at these leak rates is the fixed point to well
    past the 6 output decimals. The input-sized work — journey
    windowing and transition counting — is ONE user-keyed shuffle in
    Spark; the resulting <=7x7 matrix is MODEL-sized, so it is
    collected once and powered in exact driver-side DECIMAL
    arithmetic (the kmeans-centroid precedent — a Spark squaring
    lineage would copy the upstream subtree 2^6 times per chain).
    The DuckDB oracle runs the identical squarings as MATERIALIZED
    CTEs; entries are DECIMAL(18,12) with one half-up round per
    squaring, so all three implementations agree bit-for-bit on the
    chain algebra."""
    e = _t(spark, sf_dir, "events")
    pe = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.row_number()
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("rn"),
    )
    fp = pe.filter(F.col("rn") == 1).select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid")
    )
    chev = (
        e.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(
            F.col("pts").isNull()
            | (F.col("ts") < F.col("pts"))
            | ((F.col("ts") == F.col("pts")) & (F.col("event_id") < F.col("pid")))
        )
        .select("user_id", F.col("event_type").alias("ch"), "ts", "event_id")
    )
    w_u = W.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = chev.select(
        "user_id",
        "ch",
        F.row_number().over(w_u).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("nc"),
        F.lead("ch").over(w_u).alias("nxt"),
    )
    term = (
        e.select("user_id")
        .distinct()
        .join(fp.select("user_id", F.lit("conv").alias("t0")), "user_id", "left")
        .select("user_id", F.coalesce(F.col("t0"), F.lit("drop")).alias("t"))
    )
    edges = (
        seqd.filter(F.col("rn") == 1)
        .select(F.lit("start").alias("from_type"), F.col("ch").alias("to_type"))
        .unionByName(
            seqd.filter(F.col("nxt").isNotNull()).select(
                F.col("ch").alias("from_type"), F.col("nxt").alias("to_type")
            )
        )
        .unionByName(
            seqd.filter(F.col("rn") == F.col("nc"))
            .join(term, "user_id")
            .select(F.col("ch").alias("from_type"), F.col("t").alias("to_type"))
        )
        .unionByName(
            term.join(seqd.select("user_id").distinct(), "user_id", "left_anti")
            .select(F.lit("start").alias("from_type"), F.col("t").alias("to_type"))
        )
    )
    tc = edges.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    rt = tc.groupBy("from_type").agg(F.sum("c").cast("long").alias("row_total"))
    one = F.lit(1).cast("decimal(18,12)")
    m_full = (
        tc.join(rt, "from_type")
        .select(
            "from_type",
            "to_type",
            F.round(F.col("c").cast("double") / F.col("row_total"), 12)
            .cast("decimal(18,12)")
            .alias("p"),
        )
        .unionByName(
            spark.createDataFrame(
                [("conv", "conv"), ("drop", "drop")], "from_type string, to_type string"
            ).select("from_type", "to_type", one.alias("p"))
        )
    )

    # Model-sized chain algebra lives in operators/markov.py (the
    # kmeans-centroid precedent: collect the <=7x7 matrix once, power
    # it in exact driver-side DECIMAL).
    from cdc_via_flink_spark.operators.markov import removal_effect_attribution

    return removal_effect_attribution(
        spark, m_full, _MKV_CHANNELS, _MKV_SQUARINGS
    )


# ---------------------------------------------------------------------------
# Time-decay attribution
# ---------------------------------------------------------------------------

_DECAY_HALFLIFE_S = 2 * 24 * 3600  # 2-day half-life


@query(
    "q_attribution_time_decay",
    oracle=f"""
WITH p AS (
  SELECT user_id, event_id AS pid,
         CAST(floor(epoch(ts)) AS BIGINT) AS pes
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_type AS channel,
         CAST(floor(epoch(ts)) AS BIGINT) AS tes
  FROM events WHERE event_type <> 'purchase'
),
tw AS (
  SELECT p.pid, t.channel,
         CAST(round(power(0.5, CAST(p.pes - t.tes AS DOUBLE)
                               / {_DECAY_HALFLIFE_S}), 12)
              AS DECIMAL(28,12)) AS dw
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.tes < p.pes AND p.pes - t.tes <= {_ATTR_WINDOW_S}
),
n AS (SELECT pid, CAST(sum(dw) AS DECIMAL(28,12)) AS w_tot
      FROM tw GROUP BY pid),
credit AS (
  SELECT tw.channel,
         sum(CAST(round(CAST(tw.dw AS DOUBLE) / CAST(n.w_tot AS DOUBLE), 12)
                  AS DECIMAL(28,12))) AS credit
  FROM tw JOIN n ON tw.pid = n.pid
  GROUP BY tw.channel
  UNION ALL
  SELECT 'direct' AS channel,
         CAST(count(*) AS DECIMAL(28,12)) AS credit
  FROM p WHERE NOT EXISTS (SELECT 1 FROM tw WHERE tw.pid = p.pid)
),
tot AS (SELECT CAST(sum(credit) AS DOUBLE) AS total FROM credit)
SELECT c.channel, round(CAST(c.credit AS DOUBLE), 6) AS credit,
       round(CAST(c.credit AS DOUBLE) / t.total, 6) AS share
FROM credit c CROSS JOIN tot t
ORDER BY c.channel
""",
    tags=("sequence", "attribution", "time-decay"),
)
def q_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY MULTI-TOUCH ATTRIBUTION — each touch in the 7-day
    window earns credit 0.5^(age/half-life) (2-day half-life),
    normalized per purchase; the recency-weighted middle ground
    between last-touch (all credit to the newest) and linear (equal
    split), completing the rule family the Shapley/Markov queries
    benchmark against. Same single-shuffle shape as
    q_attribution_linear (user-keyed range join bounded by per-user
    activity); decay weights and per-purchase normalized credits are
    rounded to 12 dp and folded as DECIMAL(28,12), so channel totals
    are association-order independent; untouched purchases credit
    'direct' wholly."""
    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("pid"),
        F.unix_timestamp("ts").alias("pes"),
    )
    t = e.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.unix_timestamp("ts").alias("tes"),
    )
    tw = (
        p.join(t, "user_id")
        .filter(
            (F.col("tes") < F.col("pes"))
            & (F.col("pes") - F.col("tes") <= _ATTR_WINDOW_S)
        )
        .select(
            "pid",
            "channel",
            F.round(
                F.pow(
                    F.lit(0.5),
                    (F.col("pes") - F.col("tes")).cast("double")
                    / _DECAY_HALFLIFE_S,
                ),
                12,
            )
            .cast("decimal(28,12)")
            .alias("dw"),
        )
    )
    n = tw.groupBy("pid").agg(F.sum("dw").cast("decimal(28,12)").alias("w_tot"))
    touched = (
        tw.join(F.broadcast(n), "pid")
        .groupBy("channel")
        .agg(
            F.sum(
                F.round(
                    F.col("dw").cast("double") / F.col("w_tot").cast("double"),
                    12,
                ).cast("decimal(28,12)")
            ).alias("credit")
        )
    )
    direct = (
        p.join(tw.select("pid").distinct(), "pid", "left_anti")
        .agg(F.count(F.lit(1)).cast("decimal(28,12)").alias("credit"))
        .select(F.lit("direct").alias("channel"), "credit")
    )
    credit = touched.unionByName(direct)
    tot = credit.agg(F.sum("credit").cast("double").alias("total"))
    return (
        credit.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("credit").cast("double"), 6).alias("credit"),
            F.round(F.col("credit").cast("double") / F.col("total"), 6).alias(
                "share"
            ),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Log-rank test: do two segments share a survival curve?
# ---------------------------------------------------------------------------


@query(
    "q_survival_logrank",
    oracle=f"""
WITH r AS (
  SELECT o.o_custkey, c.c_mktsegment AS seg, o.o_orderdate,
         row_number() OVER (PARTITION BY o.o_custkey
                            ORDER BY o.o_orderdate, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
dur AS (
  SELECT f.seg,
         CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS ev,
         least(CAST(floor(date_diff('day', f.o_orderdate,
                 COALESCE(s.o_orderdate, horizon.h)) / 7) AS BIGINT),
               {_KM_MAX_WEEK}) AS wk
  FROM (SELECT * FROM r WHERE rn = 1) f
  LEFT JOIN (SELECT * FROM r WHERE rn = 2) s ON f.o_custkey = s.o_custkey
  CROSS JOIN horizon
),
g AS (
  SELECT wk,
         CAST(count(*) FILTER (seg = 'BUILDING') AS BIGINT) AS c1,
         CAST(coalesce(sum(ev) FILTER (seg = 'BUILDING'), 0) AS BIGINT) AS d1,
         CAST(count(*) FILTER (seg = 'MACHINERY') AS BIGINT) AS c2,
         CAST(coalesce(sum(ev) FILTER (seg = 'MACHINERY'), 0) AS BIGINT) AS d2
  FROM dur GROUP BY wk
),
risk AS (
  SELECT wk, d1, d2,
         CAST(sum(c1) OVER (ORDER BY wk DESC) AS BIGINT) AS n1,
         CAST(sum(c2) OVER (ORDER BY wk DESC) AS BIGINT) AS n2
  FROM g
),
terms AS (
  SELECT wk, d1,
         CAST(round(CAST(d1 + d2 AS DOUBLE) * n1 / (n1 + n2), 12)
              AS DECIMAL(28,12)) AS e1,
         CAST(round(CASE WHEN n1 + n2 > 1
              THEN CAST(d1 + d2 AS DOUBLE)
                   * (CAST(n1 AS DOUBLE) / (n1 + n2))
                   * (1.0 - CAST(n1 AS DOUBLE) / (n1 + n2))
                   * (n1 + n2 - d1 - d2) / (n1 + n2 - 1)
              ELSE 0.0 END, 12) AS DECIMAL(28,12)) AS v
  FROM risk WHERE n1 > 0 AND n2 > 0
),
agg AS (
  SELECT CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e1) AS DECIMAL(28,12)) AS e1,
         CAST(sum(v) AS DECIMAL(28,12)) AS v
  FROM terms
)
SELECT o1,
       round(CAST(e1 AS DOUBLE), 6) AS e1,
       round((o1 - CAST(e1 AS DOUBLE)) * (o1 - CAST(e1 AS DOUBLE))
             / CAST(v AS DOUBLE), 6) AS chi2
FROM agg
""",
    tags=("sequence", "survival", "logrank"),
)
def q_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-RANK TEST (Mantel-Cox): do BUILDING and MACHINERY
    customers share a time-to-repeat-purchase curve? Completes the
    survival family (q_survival_km estimates, q_nelson_aalen sums
    hazards, this TESTS): per week, the observed group-1 events are
    compared to the hypergeometric expectation d_t*n1_t/n_t with
    variance d_t*(n1/n)(1-n1/n)(n-d)/(n-1); chi2 = (O-E)^2 / V with
    1 df.

    Scale/parity: the KM shape — one customer-keyed window, then all
    test arithmetic on the <=53-week grid; per-week expectations and
    variances are single double expressions ROUNDED to 12 dp and
    folded as DECIMAL, so the sums are association-order independent
    and bit-equal across engines."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    r = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "o_custkey",
            F.col("c_mktsegment").alias("seg"),
            "o_orderdate",
            F.row_number()
            .over(
                W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
            )
            .alias("rn"),
        )
    )
    f = r.filter(F.col("rn") == 1).select(
        "o_custkey", "seg", F.col("o_orderdate").alias("d1d")
    )
    s = r.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("d2d")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    dur = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            "seg",
            F.when(F.col("d2d").isNotNull(), 1).otherwise(0).alias("ev"),
            F.least(
                F.floor(
                    F.datediff(F.coalesce(F.col("d2d"), F.col("h")), F.col("d1d"))
                    / 7
                ).cast("long"),
                F.lit(_KM_MAX_WEEK).cast("long"),
            ).alias("wk"),
        )
    )
    is1 = F.col("seg") == "BUILDING"
    g = dur.groupBy("wk").agg(
        F.count(F.when(is1, 1)).cast("long").alias("c1"),
        F.sum(F.when(is1, F.col("ev")).otherwise(0)).cast("long").alias("d1"),
        F.count(F.when(~is1, 1)).cast("long").alias("c2"),
        F.sum(F.when(~is1, F.col("ev")).otherwise(0)).cast("long").alias("d2"),
    )
    risk = g.select(
        "wk",
        "d1",
        "d2",
        F.sum("c1").over(W.orderBy(F.col("wk").desc())).cast("long").alias("n1"),
        F.sum("c2").over(W.orderBy(F.col("wk").desc())).cast("long").alias("n2"),
    )
    n = F.col("n1") + F.col("n2")
    d = F.col("d1") + F.col("d2")
    p1 = F.col("n1").cast("double") / n
    terms = risk.filter((F.col("n1") > 0) & (F.col("n2") > 0)).select(
        "d1",
        F.round(d.cast("double") * F.col("n1") / n, 12)
        .cast("decimal(28,12)")
        .alias("e1"),
        F.round(
            F.when(
                n > 1,
                d.cast("double") * p1 * (1.0 - p1) * (n - d) / (n - 1),
            ).otherwise(0.0),
            12,
        )
        .cast("decimal(28,12)")
        .alias("v"),
    )
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1").cast("decimal(28,12)").alias("e1"),
        F.sum("v").cast("decimal(28,12)").alias("v"),
    )
    return agg.select(
        "o1",
        F.round(F.col("e1").cast("double"), 6).alias("e1"),
        F.round(
            (F.col("o1") - F.col("e1").cast("double"))
            * (F.col("o1") - F.col("e1").cast("double"))
            / F.col("v").cast("double"),
            6,
        ).alias("chi2"),
    )


@query(
    "q_markov_entropy_rate",
    oracle=f"""
WITH t AS ({_SQL_TRANS}),
r AS (SELECT from_type, CAST(sum(c) AS BIGINT) AS row_total
      FROM t GROUP BY from_type),
m AS MATERIALIZED (
  SELECT t.from_type, t.to_type,
         CAST(round(CAST(t.c AS DOUBLE) / r.row_total, 12)
              AS DECIMAL(18,12)) AS p
  FROM t JOIN r ON t.from_type = r.from_type
),
states AS (SELECT from_type AS state FROM r),
n AS (SELECT count(*) AS ns FROM states),
pi0 AS (
  SELECT state,
         CAST(round(1.0 / (SELECT ns FROM n), 12) AS DECIMAL(18,12)) AS pi
  FROM states
),{",".join(_stationary_oracle_iters())},
rowent AS (
  SELECT from_type,
         CAST(sum(CAST(round(-CAST(p AS DOUBLE)
                             * log2(CAST(p AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DECIMAL(28,12)) AS h
  FROM m WHERE p > 0 GROUP BY from_type
),
ent AS (
  SELECT CAST(sum(CAST(round(CAST(s.pi AS DOUBLE) * CAST(e.h AS DOUBLE), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS hr
  FROM pi{_K_ITER} s JOIN rowent e ON e.from_type = s.state
)
SELECT round(hr, 6) AS entropy_rate_bits,
       round(power(2.0, hr), 6) AS perplexity
FROM ent
""",
    tags=("sequence", "markov", "entropy", "iterative-unrolled"),
)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENTROPY RATE of the user-event Markov chain — H = -sum_s pi_s
    sum_t P(s,t) log2 P(s,t), the bits-per-event predictability
    number (and its perplexity 2^H: the effective branching factor a
    next-event model must beat). Composes the declared chain builders
    end to end: q_markov_transitions' matrix and
    q_markov_stationary's 16-iteration DECIMAL-exact pi feed one
    state-space-sized weighted sum. H near log2(|states|) says the
    stream is near-uniform (little sequence signal for
    next-event-prediction features); H near 0 says deterministic
    funnels.

    Scale/parity: one user-keyed lead() window is the only
    input-sized work; everything else runs on the <=25-row matrix.
    Per-row -p*log2(p) terms and pi-weighted products are rounded to
    12 dp and DECIMAL-folded (the ln/exp shared-double-chain policy),
    so both engines agree bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    r = t.groupBy("from_type").agg(F.sum("c").cast("long").alias("row_total"))
    m = t.join(r, "from_type").select(
        "from_type",
        "to_type",
        F.round(F.col("c").cast("double") / F.col("row_total"), 12)
        .cast(_DP)
        .alias("p"),
    )
    states = r.select(F.col("from_type").alias("state"))
    n = states.agg(F.count(F.lit(1)).alias("ns"))
    pi = states.crossJoin(F.broadcast(n)).select(
        "state",
        F.round(F.lit(1.0) / F.col("ns"), 12).cast(_DP).alias("pi"),
    )
    for _ in range(_K_ITER):
        pi = (
            pi.join(m, pi.state == m.from_type)
            .groupBy(F.col("to_type").alias("state"))
            .agg(
                F.round(F.sum(F.col("pi") * F.col("p")), 12)
                .cast(_DP)
                .alias("pi")
            )
        )
    pd_ = F.col("p").cast("double")
    rowent = (
        m.filter(F.col("p") > 0)
        .groupBy("from_type")
        .agg(
            F.sum(
                F.round(-pd_ * F.log2(pd_), 12).cast("decimal(28,12)")
            )
            .cast("decimal(28,12)")
            .alias("h")
        )
    )
    ent = (
        pi.join(rowent, pi.state == rowent.from_type)
        .agg(
            F.sum(
                F.round(
                    F.col("pi").cast("double") * F.col("h").cast("double"), 12
                ).cast("decimal(28,12)")
            )
            .cast("double")
            .alias("hr")
        )
    )
    return ent.select(
        F.round("hr", 6).alias("entropy_rate_bits"),
        F.round(F.pow(F.lit(2.0), F.col("hr")), 6).alias("perplexity"),
    )


@query(
    "q_survival_km_ci",
    oracle=f"""
WITH r AS (
  SELECT o_custkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
horizon AS (SELECT max(o_orderdate) AS h FROM orders),
dur AS (
  SELECT f.o_custkey,
         CASE WHEN s.o_orderdate IS NOT NULL THEN 1 ELSE 0 END AS ev,
         least(CAST(floor(date_diff('day', f.o_orderdate,
                 COALESCE(s.o_orderdate, horizon.h)) / 7) AS BIGINT),
               {_KM_MAX_WEEK}) AS wk
  FROM (SELECT * FROM r WHERE rn = 1) f
  LEFT JOIN (SELECT * FROM r WHERE rn = 2) s ON f.o_custkey = s.o_custkey
  CROSS JOIN horizon
),
g AS (
  SELECT wk, CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(ev) AS BIGINT) AS d_events
  FROM dur GROUP BY wk
),
risk AS (
  SELECT wk, d_events,
         CAST(sum(n_total) OVER (ORDER BY wk DESC) AS BIGINT) AS n_risk
  FROM g
),
fac AS (
  SELECT wk, n_risk, d_events,
         CAST(round(1.0 - CAST(d_events AS DOUBLE) / n_risk, 12) AS DOUBLE)
           AS f,
         CAST(round(CASE WHEN n_risk > d_events
              THEN CAST(d_events AS DOUBLE)
                   / (CAST(n_risk AS DOUBLE) * (n_risk - d_events))
              ELSE 0.0 END, 12) AS DECIMAL(28,12)) AS gw
  FROM risk
),
km AS (
  SELECT wk, n_risk, d_events,
         CASE WHEN min(f) OVER (ORDER BY wk) = 0 THEN 0.0
              ELSE exp(sum(ln(CASE WHEN f > 0 THEN f ELSE 1.0 END))
                       OVER (ORDER BY wk)) END AS s,
         CAST(sum(gw) OVER (ORDER BY wk) AS DOUBLE) AS gsum
  FROM fac
)
SELECT wk, n_risk, d_events,
       round(s, 6) AS survival,
       round(s * sqrt(gsum), 6) AS se_greenwood,
       round(greatest(s - 1.959964 * s * sqrt(gsum), 0.0), 6) AS ci_lo,
       round(least(s + 1.959964 * s * sqrt(gsum), 1.0), 6) AS ci_hi
FROM km
ORDER BY wk
""",
    tags=("sequence", "survival", "greenwood"),
)
def q_survival_km_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN-MEIER WITH GREENWOOD CONFIDENCE BANDS — the uncertainty
    the point-estimate curve (q_survival_km) cannot convey:
    Var[S(t)] = S(t)^2 * sum_{j<=t} d_j / (n_j (n_j - d_j)), with
    plain 95% bands clamped to [0, 1] (the z constant inlined
    identically in both engines). The band width is what decides
    whether two cohort curves are distinguishable before reaching for
    q_survival_logrank.

    Same shape/parity as the KM pair: one customer-keyed window, all
    cumulative work on the <=53-week grid, Greenwood increments
    rounded to 12 dp and DECIMAL-folded, the S(t) ln/exp chain over
    identical doubles."""
    o = _t(spark, sf_dir, "orders")
    r = o.select(
        "o_custkey",
        "o_orderdate",
        F.row_number()
        .over(W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("rn"),
    )
    f = r.filter(F.col("rn") == 1).select(
        "o_custkey", F.col("o_orderdate").alias("d1")
    )
    s = r.filter(F.col("rn") == 2).select(
        "o_custkey", F.col("o_orderdate").alias("d2")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    dur = (
        f.join(s, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("d2").isNotNull(), 1).otherwise(0).alias("ev"),
            F.least(
                F.floor(
                    F.datediff(F.coalesce(F.col("d2"), F.col("h")), F.col("d1"))
                    / 7
                ).cast("long"),
                F.lit(_KM_MAX_WEEK).cast("long"),
            ).alias("wk"),
        )
    )
    g = dur.groupBy("wk").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum("ev").cast("long").alias("d_events"),
    )
    risk = g.select(
        "wk",
        "d_events",
        F.sum("n_total").over(W.orderBy(F.col("wk").desc())).cast("long").alias(
            "n_risk"
        ),
    )
    fac = risk.select(
        "wk",
        "n_risk",
        "d_events",
        F.round(
            1.0 - F.col("d_events").cast("double") / F.col("n_risk"), 12
        ).alias("f"),
        F.round(
            F.when(
                F.col("n_risk") > F.col("d_events"),
                F.col("d_events").cast("double")
                / (
                    F.col("n_risk").cast("double")
                    * (F.col("n_risk") - F.col("d_events"))
                ),
            ).otherwise(0.0),
            12,
        )
        .cast("decimal(28,12)")
        .alias("gw"),
    )
    km = fac.select(
        "wk",
        "n_risk",
        "d_events",
        F.when(F.min("f").over(W.orderBy("wk")) == 0, F.lit(0.0))
        .otherwise(
            F.exp(
                F.sum(
                    F.log(F.when(F.col("f") > 0, F.col("f")).otherwise(1.0))
                ).over(W.orderBy("wk"))
            )
        )
        .alias("s"),
        F.sum("gw").over(W.orderBy("wk")).cast("double").alias("gsum"),
    )
    se = F.col("s") * F.sqrt(F.col("gsum"))
    z = F.lit(1.959964)
    return km.select(
        "wk",
        "n_risk",
        "d_events",
        F.round("s", 6).alias("survival"),
        F.round(se, 6).alias("se_greenwood"),
        F.round(F.greatest(F.col("s") - z * se, F.lit(0.0)), 6).alias("ci_lo"),
        F.round(F.least(F.col("s") + z * se, F.lit(1.0)), 6).alias("ci_hi"),
    ).orderBy("wk")


_LTV_MAX_AGE = 11  # cohort ages reported (months since first order)


@query(
    "q_cohort_ltv_curve",
    oracle=f"""
WITH f AS (
  SELECT o_custkey,
         min(date_trunc('month', o_orderdate)) AS cohort
  FROM orders GROUP BY o_custkey
),
x AS (
  SELECT f.cohort,
         (CAST(year(o.o_orderdate) AS BIGINT) * 12
          + CAST(month(o.o_orderdate) AS BIGINT))
         - (CAST(year(f.cohort) AS BIGINT) * 12
            + CAST(month(f.cohort) AS BIGINT)) AS age,
         CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
  FROM orders o JOIN f ON f.o_custkey = o.o_custkey
),
sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cust FROM f
       GROUP BY cohort),
g AS (
  SELECT cohort, age, CAST(sum(rev) AS DECIMAL(28,2)) AS rev
  FROM x WHERE age <= {_LTV_MAX_AGE} GROUP BY cohort, age
),
c AS (
  SELECT g.cohort, g.age, sz.n_cust,
         CAST(sum(g.rev) OVER (PARTITION BY g.cohort ORDER BY g.age)
              AS DOUBLE) AS cum_rev
  FROM g JOIN sz ON sz.cohort = g.cohort
)
SELECT CAST(cohort AS DATE) AS cohort, age, n_cust,
       round(cum_rev / n_cust, 2) AS ltv_per_cust
FROM c
WHERE year(cohort) = (SELECT year(min(cohort)) FROM f)
ORDER BY cohort, age
""",
    tags=("sequence", "cohort", "ltv"),
)
def q_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVES — cumulative revenue per customer by months
    since first order, one curve per first-year signup cohort: the
    "how much is a new customer worth by month m" table that
    q_cohort_retention (activity share) cannot price; flattening
    curves say payback stalls, fanning curves say later cohorts
    monetize differently.

    Scale shape: first-order cohorts are one customer-keyed
    aggregate; the fact join carries the cohort to each order
    map-side-derivable age (integer month lattice — no date diff
    rounding ambiguity); the cumulative window runs per cohort over
    the bounded <=12-row age grid. Revenue folds as exact DECIMAL;
    the single divide per cell is double."""
    o = _t(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("month", F.col("o_orderdate"))).alias("cohort")
    )
    mo = lambda c: F.year(c).cast("long") * 12 + F.month(c).cast("long")  # noqa: E731
    x = o.join(f, "o_custkey").select(
        "cohort",
        (mo(F.col("o_orderdate")) - mo(F.col("cohort"))).alias("age"),
        dec(F.col("o_totalprice")).alias("rev"),
    )
    sz = f.groupBy("cohort").agg(F.count(F.lit(1)).cast("long").alias("n_cust"))
    g = (
        x.filter(F.col("age") <= _LTV_MAX_AGE)
        .groupBy("cohort", "age")
        .agg(F.sum("rev").cast("decimal(28,2)").alias("rev"))
    )
    c = g.join(F.broadcast(sz), "cohort").select(
        "cohort",
        "age",
        "n_cust",
        F.sum("rev")
        .over(W.partitionBy("cohort").orderBy("age"))
        .cast("double")
        .alias("cum_rev"),
    )
    y0 = f.agg(F.year(F.min("cohort")).alias("y0"))
    return (
        c.crossJoin(F.broadcast(y0))
        .filter(F.year("cohort") == F.col("y0"))
        .select(
            F.col("cohort").cast("date").alias("cohort"),
            "age",
            "n_cust",
            F.round(F.col("cum_rev") / F.col("n_cust"), 2).alias("ltv_per_cust"),
        )
        .orderBy("cohort", "age")
    )


@query(
    "q_cep_pattern_match",
    oracle="""
WITH ev AS (
  SELECT user_id,
         CASE event_type WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
              WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
              ELSE 'e' END AS ch,
         ts, event_id
  FROM events
),
seqs AS (
  SELECT user_id,
         string_agg(ch, '' ORDER BY ts, event_id) AS s
  FROM ev GROUP BY user_id
)
SELECT user_id,
       CAST(length(s) AS BIGINT) AS seq_len,
       CAST(length(coalesce(regexp_extract(s, 's[cv]*p'), '')) AS BIGINT)
           AS funnel_len,
       CAST(len(regexp_extract_all(s, 'vp')) AS BIGINT) AS vp_hits,
       (regexp_extract(s, 's[^e]*p') IS NOT NULL
        AND regexp_extract(s, 's[^e]*p') <> '') AS clean_funnel
FROM seqs
""",
    tags=("A1", "A5", "cep", "sequence", "pattern"),
)
def q_cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP / MATCH_RECOGNIZE-style sequence pattern matching — the
    flagship Flink-SQL capability (the reference's ecosystem), which
    Spark lacks as a primitive, re-expressed Spark-first via the
    ClickHouse sequenceMatch idiom: per key, the ORDERED event-type
    sequence collapses to a compact symbol string (one keyed
    aggregate; per-user sequences are activity-bounded, <= 99 symbols
    at sf0.1), and patterns run as ordinary JVM-side regexes over the
    strings — leftmost-first greedy semantics are identical in Java
    regex and DuckDB's RE2, which the exact-hash gate verifies rather
    than assumes:

      funnel_len    first match of  s[cv]*p  (signup -> clicks/views
                    -> purchase, nothing else between)
      vp_hits       non-overlapping count of  vp  (purchase
                    immediately after a view)
      clean_funnel  s[^e]*p  (a signup->purchase journey with NO
                    error anywhere between)

    Scale shape: one hash aggregate keyed by user (collect_list of
    (ts, id, ch) structs, array_sort, transform+join — all built-in,
    no UDF), then pure per-row regex projection; nothing shuffles
    twice and the regex work is embarrassingly parallel. The symbol
    string per key is the CEP state machine's input tape — the same
    trick productionizes at 100 TB because the per-key tape is
    bounded by per-entity activity, not corpus size."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "purchase", "p")
        .otherwise("e")
        .alias("ch"),
        "ts_ms",
        "event_id",
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts_ms", "event_id", "ch"))
                ),
                lambda x: x.getField("ch"),
            ),
            "",
        ).alias("s")
    )
    return seqs.select(
        "user_id",
        F.length("s").cast("long").alias("seq_len"),
        F.length(F.regexp_extract(F.col("s"), "s[cv]*p", 0))
        .cast("long")
        .alias("funnel_len"),
        F.regexp_count(F.col("s"), F.lit("vp")).cast("long").alias("vp_hits"),
        (F.regexp_extract(F.col("s"), "s[^e]*p", 0) != "").alias(
            "clean_funnel"
        ),
    )
