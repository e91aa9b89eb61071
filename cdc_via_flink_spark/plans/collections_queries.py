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


def approx_distinct_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debug/test variant of q_approx_distinct carrying the raw HLL
    estimate and rel_err (engine-specific, so NOT declared — tests
    assert the error bound on these columns)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
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
    "q_approx_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag
""",
    tags=("A3", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the at-scale cardinality idiom (sketches merge map-side; no
    shuffle of distinct values). The raw sketch estimate is
    engine-specific, so the DECLARED output is fully deterministic:
    group key + exact count (oracle-computable) + `within_bound`
    (Spark asserts the HLL estimate against the exact count in-query;
    the oracle emits TRUE). A bound violation flips the boolean and
    hash-mismatches — the estimate is still correctness-gated.
    Full estimate columns: approx_distinct_full (tests/test_approx.py)."""
    return approx_distinct_full(spark, sf_dir).select(
        "l_returnflag", "exact_parts", "within_bound"
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


def approx_percentile_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debug/test variant of q_approx_percentile carrying the raw GK
    estimate (engine-specific; NOT declared). The exact reference is
    the DISCRETE median — the element at rank ceil(0.5*n), SQL-standard
    percentile_disc semantics — which both engines reproduce bit-exactly
    (no float interpolation)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.approx_percentile(F.col("o_totalprice"), F.lit(0.5), F.lit(10000)).alias(
            "approx_p50"
        ),
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("exact_p50"),
        F.count(F.lit(1)).alias("n"),
    )
    # self-validating error column: ε=1e-4 rank error is <1 rank at
    # test sizes, but the sketch returns an ELEMENT whose value gap
    # from the discrete median dominates at small n ⇒ 5% bound
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
    "q_approx_percentile",
    # Oracle pins the SQL-standard percentile_disc rank (smallest value
    # with cume_dist >= q, i.e. rank ceil(q*n)) via an explicit window
    # rather than DuckDB's quantile_disc, whose floor((n-1)q) indexing
    # can differ by one rank for some n.
    oracle="""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM orders
)
SELECT o_orderpriority, o_totalprice AS exact_p50, n, TRUE AS within_bound
FROM ranked WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
""",
    tags=("A3", "approx", "percentile"),
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) vs the exact
    discrete median — the at-scale quantile idiom: sketches merge
    map-side, one pass, no per-group sort. DECLARED output is fully
    deterministic: group key + exact discrete median (an element of
    the data, bit-reproducible in DuckDB) + `within_bound` (Spark
    asserts the GK estimate against the exact value in-query; oracle
    emits TRUE). Estimate columns: approx_percentile_full."""
    return approx_percentile_full(spark, sf_dir).select(
        "o_orderpriority", "exact_p50", "n", "within_bound"
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


def hll_sketch_rollup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    "q_hll_sketch_rollup",
    oracle="""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS period,
       count(DISTINCT user_id) AS exact_users,
       count(*) AS n_events,
       TRUE AS within_bound
FROM events GROUP BY 1
UNION ALL
SELECT 'ALL' AS period, count(DISTINCT user_id), count(*), TRUE
FROM events
""",
    tags=("A3", "approx", "sketch", "rollup"),
)
def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared, fully-deterministic projection of the HLL rollup
    (hll_sketch_rollup_full has the estimates and the full design
    docstring): period + exact distinct (oracle-computable) +
    `within_bound`, where Spark checks the UNIONED-sketch estimate
    against the exact count in-query and the oracle emits TRUE. A
    sketch regression flips the boolean and hash-mismatches — the
    sketch pipeline stays correctness-gated while every declared
    column is DuckDB-derivable."""
    return hll_sketch_rollup_full(spark, sf_dir).select(
        "period", "exact_users", "n_events", "within_bound"
    )


def quantile_sketch_rollup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # exact reference = DISCRETE percentile (element at rank ceil(q*n),
    # SQL-standard percentile_disc) — bit-reproducible cross-engine,
    # unlike interpolated percentiles whose float arithmetic can differ
    # in the last ULP between engines.
    exact = ev.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").alias("exact_p50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY x)").alias("exact_p95"),
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
    # exact is an ELEMENT of the data — left unrounded so the declared
    # projection matches the oracle's raw value bit-for-bit
    return rows.select(
        "quantile",
        F.round("est", 6).alias("est"),
        "exact",
        "n_points",
        rel_err.alias("rel_err"),
        (rel_err <= 0.10).alias("within_bound"),
    )


@query(
    "q_quantile_sketch_rollup",
    # Explicit ceil(q*n) window rank (SQL-standard percentile_disc
    # semantics) instead of DuckDB quantile_disc, whose floor((n-1)q)
    # indexing can differ by one rank for some n. n_points counts the
    # merged summary size: sum over days of min(64, n_day).
    oracle="""
WITH v AS (
  SELECT CAST(value AS DOUBLE) AS x, date_trunc('day', ts) AS day
  FROM events WHERE value IS NOT NULL
),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x) AS rn, count(*) OVER () AS n
  FROM v
),
np AS (
  SELECT CAST(sum(least(64, n)) AS BIGINT) AS n_points
  FROM (SELECT count(*) AS n FROM v GROUP BY day)
),
q AS (
  SELECT 'p50' AS quantile, x AS exact FROM ranked
  WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
  UNION ALL
  SELECT 'p95', x FROM ranked
  WHERE rn = CAST(ceil(0.95 * n) AS BIGINT)
)
SELECT quantile, exact, n_points, TRUE AS within_bound
FROM q CROSS JOIN np
""",
    tags=("A3", "approx", "sketch", "quantile", "rollup"),
)
def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared, fully-deterministic projection of the mergeable
    quantile rollup (quantile_sketch_rollup_full has the estimates and
    the full design docstring): quantile label + exact discrete
    percentile (an element of the data, oracle-computable) + summary
    point count + `within_bound` (Spark asserts the merged-summary
    estimate against the exact value in-query; oracle emits TRUE)."""
    return quantile_sketch_rollup_full(spark, sf_dir).select(
        "quantile", "exact", "n_points", "within_bound"
    )


def freq_sketch_rollup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE frequent-items summaries (Misra-Gries family,
    completing the classic sketch trio next to the HLL distinct and
    KLL-style quantile rollups above): token frequencies over the
    documents corpus — a genuinely Zipf-skewed stream, the workload
    heavy-hitter sketches exist for.

    Per shard (doc_id mod 32 here; a partition/day in deployment) the
    corpus reduces to a TRUNCATE-AND-BOUND summary: the shard's exact
    (word, count) pairs cut to the top m=32 by count, plus one error
    scalar err_s = the largest DROPPED count (0 when nothing drops).
    Summaries merge by unioning kept rows and summing: for any word,
      est = sum of kept counts  <=  true  <=  est + slack,
    slack = sum of err_s over exactly the shards where the word was
    NOT kept (a dropped word's in-shard count is <= that shard's max
    dropped count; kept shards contribute no error). The union is
    associative/commutative, so it distributes over any partitioning
    — and any word whose true count exceeds total error is GUARANTEED
    to surface (the Misra-Gries property).

    Scale shape: each shard's summary is m+1 rows regardless of shard
    size, so the merge handles shards*33 rows while the raw corpus is
    TBs; the top-m cut is one window row_number per shard (map-side
    partial counts first). The exact side below exists only to
    VALIDATE the bound in-query (the within_bound contract of the
    sketch family) — production reads the summaries alone.
    """
    from pyspark.sql import Window as W

    from cdc_via_flink_spark.functions.text import tokens

    m = 32
    d = load_table(spark, sf_dir, "documents").select(
        F.pmod(F.col("doc_id"), F.lit(32)).alias("shard"),
        tokens(F.col("text")).alias("tk"),
    )
    tok = d.select("shard", F.explode("tk").alias("w"))
    counts = tok.groupBy("shard", "w").agg(F.count(F.lit(1)).alias("c"))
    rk = F.row_number().over(
        W.partitionBy("shard").orderBy(F.col("c").desc(), F.col("w"))
    )
    ranked = counts.withColumn("rk", rk)
    kept = ranked.filter(F.col("rk") <= m).select("shard", "w", "c")
    shard_err = (
        ranked.groupBy("shard")
        .agg(F.max(F.when(F.col("rk") > m, F.col("c"))).alias("err"))
        .select("shard", F.coalesce("err", F.lit(0)).alias("err"))
    )
    total_err = shard_err.agg(F.sum("err").alias("total_err"))
    # per-word merge: est + the error mass of shards that KEPT it
    # (slack = total_err - present_err covers every other shard)
    merged = (
        kept.join(shard_err, "shard")
        .groupBy("w")
        .agg(
            F.sum("c").alias("est"),
            F.sum("err").alias("present_err"),
        )
    )
    exact = tok.groupBy("w").agg(F.count(F.lit(1)).alias("exact_n"))
    # distributed top-k (TakeOrderedAndProject: per-partition heads +
    # one k-row merge), NOT a global row_number window — that would
    # sort the whole vocabulary on one task; the full (count, word)
    # ordering makes the cut deterministic at ties
    top = exact.orderBy(F.col("exact_n").desc(), F.col("w")).limit(10)
    out = (
        top.join(merged, "w", "left")
        .crossJoin(F.broadcast(total_err))
        .select(
            "w",
            "exact_n",
            F.coalesce("est", F.lit(0)).alias("est"),
            (
                F.col("total_err") - F.coalesce("present_err", F.lit(0))
            ).alias("slack"),
        )
    )
    return out.withColumn(
        "within_bound",
        (F.col("est") <= F.col("exact_n"))
        & (F.col("exact_n") <= F.col("est") + F.col("slack")),
    )


@query(
    "q_freq_sketch_rollup",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS w FROM documents
),
exact AS (
  SELECT w, count(*) AS exact_n FROM tok GROUP BY w
),
top AS (
  SELECT w, exact_n,
         row_number() OVER (ORDER BY exact_n DESC, w) AS rk
  FROM exact
)
SELECT w, exact_n, TRUE AS within_bound FROM top WHERE rk <= 10
""",
    tags=("A3", "approx", "sketch", "heavy-hitters", "rollup"),
)
def q_freq_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared, fully-deterministic projection of the mergeable
    frequent-items rollup (freq_sketch_rollup_full has the summaries
    and the design docstring): the corpus's top-10 words by EXACT
    count (oracle-computable, ties broken by word) + `within_bound`,
    where Spark asserts the merged Misra-Gries bound
    est <= exact <= est + slack for each in-query and the oracle
    emits TRUE — a broken truncation, merge, or error ledger flips
    the boolean and hash-mismatches."""
    return freq_sketch_rollup_full(spark, sf_dir).select(
        "w", "exact_n", "within_bound"
    )


# --- count-min sketch (point estimates, bit-for-bit oracle) ---

CMS_D = 4  # hash rows
CMS_W = 1024  # buckets per row
_CMS_J_BASE = 2000  # coefficient offset: disjoint from minhash (0..)
# and bloom (1000..) families
CMS_TOP = 10


def _cms_oracle() -> str:
    from cdc_via_flink_spark.functions.hashing import P, a_j, b_j

    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    tint = "CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT)"

    def bucket(j: int) -> str:
        return (
            f"(({a_j(_CMS_J_BASE + j)} * (({tint}) % {P}) + "
            f"{b_j(_CMS_J_BASE + j)}) % {P}) % {CMS_W}"
        )

    rows = "\n  UNION ALL\n".join(
        f"  SELECT {j} AS j, {bucket(j)} AS bucket, w FROM tok" for j in range(CMS_D)
    )
    est_rows = "\n  UNION ALL\n".join(
        f"  SELECT w, {j} AS j, {bucket(j)} AS bucket FROM exact"
        for j in range(CMS_D)
    )
    return f"""
WITH tok AS (
  SELECT unnest(string_split({norm}, ' ')) AS w FROM documents
),
hashed AS (
{rows}
),
counters AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY j, bucket
),
exact AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_n FROM tok GROUP BY w),
probes AS (
{est_rows}
),
est AS (
  SELECT p.w, min(c.cnt) AS cms_est
  FROM probes p JOIN counters c ON p.j = c.j AND p.bucket = c.bucket
  GROUP BY p.w
),
top AS (
  SELECT e.w, e.exact_n, s.cms_est,
         row_number() OVER (ORDER BY e.exact_n DESC, e.w) AS rk
  FROM exact e JOIN est s ON e.w = s.w
)
SELECT w, exact_n, cms_est, cms_est - exact_n AS overcount
FROM top WHERE rk <= {CMS_TOP}
"""


@query(
    "q_cms_point_est",
    oracle=_cms_oracle(),
    tags=("A3", "approx", "sketch", "count-min"),
)
def q_cms_point_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH point estimates (Cormode & Muthukrishnan 2005
    — the sketch family's frequency member, next to HLL/KLL/
    Misra-Gries): a d=4 × w=1024 counter grid over the corpus's
    words, then the min-over-rows estimate for the top-10 exact
    words, with the per-term overcount (est − exact ≥ 0 ALWAYS — the
    one-sided CMS guarantee — and the oracle recomputes the grid
    bit-for-bit from the shared universal-hash family, the
    dedup_bloom_gate precedent, so the estimates themselves
    hash-match, not just a bound boolean).

    Scale shape: the grid build is one explode (d rows per token) +
    one groupBy bounded by d·w = 4096 keys REGARDLESS of corpus size
    (map-side combine); estimation joins the broadcast grid d times
    per distinct term. This is the mergeable shard-rollup shape: at
    100 TB each shard builds its own 4096-row grid and the merge is
    elementwise sum (same groupBy)."""
    from cdc_via_flink_spark.functions.hashing import P, a_j, b_j, token_int
    from cdc_via_flink_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("w"))

    def bucket(j: int, w: F.Column) -> F.Column:
        return (
            (F.lit(a_j(_CMS_J_BASE + j)) * (token_int(w) % F.lit(P))
             + F.lit(b_j(_CMS_J_BASE + j))) % F.lit(P)
        ) % F.lit(CMS_W)

    hashed = tok.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), bucket(j, F.col("w")).alias("bucket"))
                for j in range(CMS_D)
            ])
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    counters = hashed.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    exact = tok.groupBy("w").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "w",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("j"), bucket(j, F.col("w")).alias("bucket"))
                for j in range(CMS_D)
            ])
        ).alias("jb"),
    ).select("w", "jb.j", "jb.bucket")
    est = (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("w")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return (
        exact.join(est, "w")
        .select(
            "w", "exact_n", "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
        # TakeOrderedAndProject, not a global row_number over the
        # vocabulary (a single-partition sort of every distinct term
        # would not survive a 100 TB vocab)
        .orderBy(F.col("exact_n").desc(), "w")
        .limit(CMS_TOP)
    )


@query(
    "q_bitmap_distinct_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
""",
    tags=("A3", "bitmap", "exact-distinct"),
)
def q_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT DISTINCT-COUNT VIA BITMAP ROLLUP — the ClickHouse/Doris
    groupBitmap pattern re-expressed in pure Catalyst: daily active
    users computed as bit_or-folded 32-bit bitmap words keyed by
    (day, user_id div 32), then sum(bit_count(word)) per day. The
    oracle states the plain count(DISTINCT).

    Why this shape at 100 TB: count(DISTINCT) shuffles every distinct
    (day, user) pair; the bitmap fold's partial state is ONE long per
    32 users per day per partition, merges are associative+idempotent
    bit_or (map-side combine eats almost everything), and the result
    is still EXACT — the same trick the maintained Bloom gate uses,
    pointed at cardinality instead of membership. 32-bit blocks keep
    every shift in-range for engines that refuse 1<<63 overflow.
    Re-aggregating bitmap words also gives rollups across dims for
    free (OR the words) — the reason OLAP stores persist the bitmap,
    not the count."""
    e = load_table(spark, sf_dir, "events")
    words = (
        e.select(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            (F.col("user_id") / 32).cast("long").alias("blk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "blk")
        .agg(F.bit_or("bit").alias("word"))
    )
    return (
        words.groupBy("day")
        .agg(F.sum(F.bit_count("word")).cast("long").alias("n_users"))
    )


@query(
    "q_bitmap_retention",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
)
SELECT a.day AS day,
       CAST(count(*) AS BIGINT) AS retained
FROM du a JOIN du b
  ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day
""",
    tags=("A3", "bitmap", "retention"),
)
def q_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAY-OVER-DAY RETENTION VIA BITMAP INTERSECTION — the second
    half of the groupBitmap pattern (q_bitmap_distinct_rollup builds
    the words; this query shows why OLAP stores PERSIST them): users
    active on both day d and d+1 counted as
    sum(bit_count(word_d & word_{d+1})) over the (day, block) word
    table. The oracle states the plain distinct self-join.

    Scale shape: the join runs over bitmap WORDS — |days|·|users|/32
    rows — instead of distinct (day, user) pairs, and the AND+popcount
    is pure integer arithmetic. The same word table answers ANY
    set-algebra question (churn = d AND NOT d+1, resurrection,
    N-day windows) with no re-scan of events — the reuse argument
    that makes the bitmap the materialization of choice at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    words = (
        e.select(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            (F.col("user_id") / 32).cast("long").alias("blk"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))"
            ).alias("bit"),
        )
        .groupBy("day", "blk")
        .agg(F.bit_or("bit").alias("word"))
    )
    nxt = words.select(
        F.date_sub(F.col("day"), 1).alias("day"),
        "blk",
        F.col("word").alias("word_next"),
    )
    return (
        words.join(nxt, ["day", "blk"])
        .groupBy("day")
        .agg(
            F.sum(F.bit_count(F.col("word").bitwiseAND(F.col("word_next"))))
            .cast("long")
            .alias("retained")
        )
        .filter(F.col("retained") > 0)
    )


# ---------------------------------------------------------------------------
# KMV bottom-k sketch, batch face (the declared-query twin of the
# ninth maintained-index adapter)
# ---------------------------------------------------------------------------


def _bottomk_oracle() -> str:
    from cdc_via_flink_spark.streaming.kmv_maintenance import (
        KMV_K,
        estimate_sql,
        kh_sql,
    )

    return f"""
WITH hs AS (
  SELECT DISTINCT {kh_sql("user_id")} AS h, user_id FROM events
),
dh AS (
  SELECT h, min(user_id) AS user_id FROM hs GROUP BY h
),
r AS (
  SELECT h, user_id, row_number() OVER (ORDER BY h) AS rn FROM dh
),
topk AS (SELECT * FROM r WHERE rn <= {KMV_K}),
st AS (
  SELECT max(h) AS kth, CAST(count(*) AS BIGINT) AS n_state FROM topk
)
SELECT CAST(t.rn AS BIGINT) AS rn, CAST(t.h AS BIGINT) AS h,
       CAST(t.user_id AS BIGINT) AS user_id,
       {estimate_sql("st.kth", "st.n_state")} AS est_distinct
FROM topk t CROSS JOIN st
ORDER BY rn
"""


@query(
    "q_bottomk_sample",
    oracle=_bottomk_oracle(),
    tags=("A3", "kmv", "sample", "sketch"),
)
def q_bottomk_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV BOTTOM-k SKETCH, batch face — the declared-query twin of
    stream_kmv_sample's maintained index: the k=64 smallest hash
    values over the distinct user ids, which are simultaneously (a) a
    uniform sample of the distinct users and (b) the
    (k−1)·M/h_(k) distinct-count estimator (Bar-Yossef et al. 2002).
    The sketch family's third member next to q_hll_sketch_rollup
    (estimate only) and q_bitmap_distinct_rollup (exact, state grows).

    Scale shape: one distinct over the hash lattice, then
    orderBy+limit — TakeOrderedAndProject, each map task forwards at
    most k rows; the estimate rides a 1-row cross join. The bijective
    lattice makes the order statistics exact in both engines (ids
    colliding mod the lattice collapse identically — the documented
    stand-in-for-xxhash64 contract)."""
    from cdc_via_flink_spark.streaming.kmv_maintenance import (
        KMV_K,
        _kh,
        estimate_expr,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    dh = (
        ev.select(
            _kh(F.col("user_id")).cast("long").alias("h"),
            F.col("user_id").cast("long").alias("user_id"),
        )
        .groupBy("h")
        .agg(F.min("user_id").alias("user_id"))
    )
    from pyspark.sql import Window as W

    topk = dh.orderBy("h").limit(KMV_K)
    st = topk.agg(
        F.max("h").alias("kth"), F.count(F.lit(1)).cast("long").alias("n_state")
    )
    w = W.orderBy("h")
    return (
        topk.crossJoin(F.broadcast(st))
        .select(
            F.row_number().over(w).cast("long").alias("rn"),
            "h",
            "user_id",
            estimate_expr(F.col("kth"), F.col("n_state")).alias("est_distinct"),
        )
        .orderBy("rn")
    )
