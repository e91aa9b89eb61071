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


def _stationary_oracle() -> str:
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
