"""Collection-type scalar library (SURVEY.md P9 array/map rows) plus
approximate aggregates (A3) and the snapshot-at-T as-of variant (J5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.operators.reconstruct import latest_state
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


@query(
    "q_array_fns",
    oracle="""
WITH w AS (
  SELECT p_partkey, string_split(lower(p_name), ' ') AS ww FROM part
)
SELECT p_partkey,
       len(ww) AS n_words,
       array_to_string(ww[1:3], ' ') AS first3,
       list_contains(ww, 'green') AS has_green,
       array_to_string(list_transform(ww[1:3], x -> upper(x)), ',') AS upper3,
       array_to_string(list_sort(ww), ',') AS sorted_words
FROM w WHERE p_partkey % 11 = 0
""",
    tags=("P9", "array"),
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar library: split/size/slice/array_contains/transform/
    array_sort — all Catalyst higher-order functions, no UDFs."""
    p = load_table(spark, sf_dir, "part")
    w = p.filter(F.col("p_partkey") % 11 == 0).select(
        "p_partkey", F.split(F.lower("p_name"), " ").alias("ww")
    )
    return w.select(
        "p_partkey",
        F.size("ww").cast("long").alias("n_words"),
        F.array_join(F.slice("ww", 1, 3), " ").alias("first3"),
        F.array_contains("ww", "green").alias("has_green"),
        F.array_join(
            F.transform(F.slice("ww", 1, 3), lambda x: F.upper(x)), ","
        ).alias("upper3"),
        F.array_join(F.array_sort("ww"), ",").alias("sorted_words"),
    )


@query(
    "q_map_fns",
    oracle="""
SELECT p_partkey,
       array_to_string(map_keys(MAP(['brand','type'], [p_brand, p_type])), ',')
         AS mkeys,
       array_to_string(map_values(MAP(['brand','type'], [p_brand, p_type])), '|')
         AS mvals,
       CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS BIGINT)
         AS msize
FROM part WHERE p_partkey % 13 = 0
""",
    tags=("P9", "map"),
)
def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map scalar library: construction, map_keys/map_values/size."""
    p = load_table(spark, sf_dir, "part")
    m = F.map_from_arrays(
        F.array(F.lit("brand"), F.lit("type")),
        F.array(F.col("p_brand"), F.col("p_type")),
    )
    return p.filter(F.col("p_partkey") % 13 == 0).select(
        "p_partkey",
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.array_join(F.map_values(m), "|").alias("mvals"),
        F.size(F.map_keys(m)).cast("long").alias("msize"),
    )


@query(
    "q_approx_distinct",
    oracle=None,  # HLL sketches are engine-specific; rows-only check.
    tags=("A3", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the at-scale cardinality idiom (sketches merge map-side; no
    shuffle of distinct values). No oracle: sketch estimates are
    engine-specific by design; tests assert the error bound instead."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    # self-validating: the error bound is asserted IN the result, so a
    # rows-only driver check still carries correctness signal
    rel_err = F.round(
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        / F.col("exact_parts").cast("double"),
        6,
    )
    return agg.select(
        "l_returnflag",
        "approx_parts",
        "exact_parts",
        rel_err.alias("rel_err"),
        (rel_err <= 0.1).alias("within_bound"),  # rsd=0.02, ~5σ margin
    )


@query(
    "cdc_snapshot_at_t",
    oracle="""
WITH ch AS (
  SELECT 'txn-' || CAST(user_id AS VARCHAR) AS txn_id,
         event_id AS seq,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'click' THEN 'u'
              WHEN 'view' THEN 'r' ELSE 'd' END AS op,
         epoch_ms(ts) AS ts_ms, props AS after
  FROM events WHERE event_type <> 'purchase'
    AND epoch_ms(ts) <= 1705363200000
),
r AS (
  SELECT txn_id, op, ts_ms, after, seq,
         row_number() OVER (PARTITION BY txn_id
                            ORDER BY ts_ms DESC, seq DESC) AS rn,
         count(*) OVER (PARTITION BY txn_id) AS n_changes
  FROM ch
)
SELECT txn_id, op AS last_op, ts_ms AS last_ts_ms, after AS last_after,
       n_changes
FROM r WHERE rn = 1
""",
    tags=("J5", "asof", "snapshot"),
)
def cdc_snapshot_at_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot 'as of T' (J5): replay cut at a fixed cutoff
    timestamp, then latest row image per key — time travel over a
    change stream. Cutoff filter pushes to the scan."""
    cutoff_ms = 1705363200000  # 2024-01-16 00:00:00 UTC
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts_ms") <= cutoff_ms)
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "click", "u")
        .when(F.col("event_type") == "view", "r")
        .otherwise("d")
    )
    ch = ev.filter(F.col("event_type") != "purchase").select(
        F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("txn_id"),
        F.col("event_id").alias("seq"),
        op.alias("op"),
        F.col("ts_ms"),
        F.col("props").alias("after"),
    )
    return latest_state(ch)


@query(
    "q_approx_percentile",
    oracle=None,  # quantile sketches are engine-specific; rows-only +
    # bound test (tests/test_approx.py) like q_approx_distinct.
    tags=("A3", "approx", "percentile"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) next to the exact
    interpolated percentile — the at-scale quantile idiom: sketches
    merge map-side, so quantiles cost one pass and no sort, vs the
    exact form's per-group sort. accuracy=10000 ⇒ ε=1e-4 rank error."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_percentile(F.col("o_totalprice"), F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
        F.percentile(F.col("o_totalprice"), F.lit(0.5)).alias("exact_p50"),
        F.count(F.lit(1)).alias("n"),
    )
    # self-validating error column: ε=1e-4 rank error is <1 rank at
    # test sizes, but approx_percentile returns an ELEMENT while the
    # exact form interpolates — at small n the value gap between
    # adjacent elements dominates, so the in-query bound is 5%
    rel_err = F.round(
        F.abs(F.col("approx_p50") - F.col("exact_p50")) / F.col("exact_p50"), 6
    )
    return agg.select(
        "o_orderpriority",
        "approx_p50",
        "exact_p50",
        "n",
        rel_err.alias("rel_err"),
        (rel_err <= 0.05).alias("within_bound"),
    )


@query(
    "q_higher_order_fns",
    oracle="""
WITH per_order AS (
  SELECT l_orderkey, list(CAST(l_quantity AS BIGINT) ORDER BY l_linenumber) AS qtys
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(list_filter(qtys, q -> q >= 25)) AS n_large,
       CASE WHEN len(list_filter(qtys, q -> q < 0)) = 0 THEN 1 ELSE 0 END
           AS all_nonneg,
       CAST(list_sum(qtys) AS BIGINT) AS total_qty,
       len(flatten([qtys, qtys])) AS doubled_len,
       len(range(1, len(qtys) + 1)) AS seq_len
FROM per_order WHERE l_orderkey % 31 = 0
""",
    tags=("P9", "higher-order"),
)
def q_higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (P9 widening): filter / forall /
    aggregate / flatten / sequence over per-order quantity arrays —
    all JVM lambda expressions (no Python), the idiom for nested-data
    pipelines at scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 31 == 0)
    per_order = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("l_linenumber", F.col("l_quantity").cast("long").alias("q")))
            ),
            lambda s: s.getField("q"),
        ).alias("qtys")
    )
    qtys = F.col("qtys")
    return per_order.select(
        "l_orderkey",
        F.size(F.filter(qtys, lambda q: q >= 25)).cast("long").alias("n_large"),
        F.when(F.forall(qtys, lambda q: q >= 0), 1).otherwise(0).alias("all_nonneg"),
        F.aggregate(qtys, F.lit(0).cast("long"), lambda acc, q: acc + q).alias(
            "total_qty"
        ),
        F.size(F.flatten(F.array(qtys, qtys))).cast("long").alias("doubled_len"),
        F.size(F.sequence(F.lit(1), F.size(qtys))).cast("long").alias("seq_len"),
    )


@query(
    "q_hll_sketch_rollup",
    oracle=None,  # DataSketches HLL state is engine-specific; rows-only
    # + invariant tests (tests/test_approx.py::test_hll_*).
    tags=("A3", "approx", "sketch", "rollup"),
)
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable cardinality sketches (Apache DataSketches HLL): build
    one user_id sketch per day, then re-aggregate the 30 daily
    sketches into the monthly estimate with hll_union_agg — WITHOUT
    touching the raw events again. This is the at-scale rollup
    contract: daily sketches persist as bytes (~1 KB each), any
    period's cardinality is a union over sketches, and the union is
    associative/commutative so it distributes over any partitioning.
    (approx_count_distinct can't do this — its sketch is consumed
    inside one aggregation; q_approx_distinct covers that idiom.)"""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_day = daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("period"),
        F.hll_sketch_estimate("sk").alias("est_users"),
        "exact_users",
        "n_events",
    )
    # month row: estimate from the UNION of daily sketches (the rollup
    # contract under test); exact from one whole-period distinct, kept
    # purely as the in-query validation column.
    month = daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
        F.sum("n_events").alias("n_events"),
    ).crossJoin(
        F.broadcast(ev.agg(F.countDistinct("user_id").alias("exact_users")))
    ).select(F.lit("ALL").alias("period"), "est_users", "exact_users", "n_events")
    out = per_day.unionByName(month)
    # lgK=12 default ⇒ rsd ≈ 1.6%; assert a generous 15% bound in-query
    rel_err = F.round(
        F.abs(F.col("est_users") - F.col("exact_users"))
        / F.col("exact_users").cast("double"),
        6,
    )
    return out.select(
        "period",
        "est_users",
        "exact_users",
        "n_events",
        rel_err.alias("rel_err"),
        (rel_err <= 0.15).alias("within_bound"),
    )


@query(
    "q_quantile_sketch_rollup",
    oracle=None,  # sketch state is engine-specific; rows-only +
    # in-query self-validation (the q_hll_sketch_rollup pattern)
    tags=("A3", "approx", "sketch", "quantile", "rollup"),
)
def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE quantile summaries — the t-digest/KLL contract on
    plain DataFrame ops: each day reduces its values to m=64 strided
    order statistics (value + weight = n_day/m), any period's quantile
    is then estimated from the UNION of daily summaries without
    re-touching raw events. That union is associative/commutative, so
    it distributes over any partitioning — the property
    `approx_percentile` lacks (its sketch dies inside one aggregation;
    q_approx_percentile covers that idiom).

    Scale shape: the per-day reduce is one keyed aggregation; the
    merge sorts days×m ≈ 2k weighted points, INDEPENDENT of event
    count — at 100 TB the summaries are KBs while raw data is TBs.
    The single-task merge sort is bounded by the point count, not the
    data. Self-validation: est vs exact `percentile` per quantile with
    a 10% rel-err bound asserted in-query (strided rank error ≤
    1/(2m) ≈ 0.8% of rank space)."""
    from pyspark.sql import Window as W

    m = 64
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.col("value").cast("double").alias("x"),
    ).filter(F.col("x").isNotNull())

    daily = ev.groupBy("day").agg(
        F.sort_array(F.collect_list("x")).alias("xs"),
        F.count(F.lit(1)).alias("n"),
    )
    # m strided order statistics per day, each weighted n/m' — the
    # day's mergeable summary (m' = min(m, n) for short days)
    mm = F.least(F.lit(m), F.col("n"))
    summaries = daily.select(
        "day",
        "n",
        F.transform(
            F.sequence(F.lit(0), mm - 1),
            lambda i: F.element_at(
                "xs",
                (F.floor((i + 0.5) * F.col("n") / mm) + 1).cast("int"),
            ),
        ).alias("sample"),
        (F.col("n").cast("double") / mm).alias("w"),
    )
    pts = summaries.select("day", "w", F.explode("sample").alias("x"))
    tot = pts.agg(
        F.sum("w").alias("tot_w"), F.count(F.lit(1)).alias("n_points")
    )
    cum = (
        pts.withColumn(
            "cum",
            F.sum("w").over(
                W.orderBy("x", "day").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
        .crossJoin(F.broadcast(tot))
    )
    est = cum.agg(
        F.min(F.when(F.col("cum") >= 0.5 * F.col("tot_w"), F.col("x"))).alias(
            "est_p50"
        ),
        F.min(F.when(F.col("cum") >= 0.95 * F.col("tot_w"), F.col("x"))).alias(
            "est_p95"
        ),
        F.max("n_points").alias("n_points"),
    )
    exact = ev.agg(
        F.percentile("x", F.lit(0.5)).alias("exact_p50"),
        F.percentile("x", F.lit(0.95)).alias("exact_p95"),
    )
    both = est.crossJoin(F.broadcast(exact))
    rows = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("p50").alias("quantile"),
                    F.col("est_p50").alias("est"),
                    F.col("exact_p50").alias("exact"),
                    F.col("n_points"),
                ),
                F.struct(
                    F.lit("p95").alias("quantile"),
                    F.col("est_p95").alias("est"),
                    F.col("exact_p95").alias("exact"),
                    F.col("n_points"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    rel_err = F.round(
        F.abs(F.col("est") - F.col("exact")) / F.col("exact"), 6
    )
    return rows.select(
        "quantile",
        F.round("est", 6).alias("est"),
        F.round("exact", 6).alias("exact"),
        "n_points",
        rel_err.alias("rel_err"),
        (rel_err <= 0.10).alias("within_bound"),
    )
