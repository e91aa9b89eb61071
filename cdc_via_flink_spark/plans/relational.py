"""Relational core queries (SURVEY.md M1): the [gap] operator rows
J3/J4, A3/A4, A6/A7, P9 — stock Spark DataFrame/SQL plans, each with a
DuckDB oracle.

Plan-shape notes (checked via .explain, see tests/test_plans.py):
- dimension joins broadcast (region/nation always; supplier/customer
  under the 10 MB AQE threshold at test SF — at 100 TB the fact-fact
  joins go sort-merge on the join key, which is the right plan);
- filters/projections push into the parquet scans;
- aggregations run partial→final (no extra shuffle beyond the groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.plans.parity import (
    SQL_REVENUE,
    davg,
    dec,
    dsum,
    revenue_col,
    sql_davg,
    sql_dsum,
)
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# A3: hash aggregation, partial+final, multiple aggregates (TPC-H Q1 shape)
# --------------------------------------------------------------------------
@query(
    "q_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS sum_disc_price,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    tags=("A3", "agg"),
    bench=True,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: partial→final hash agg over two
    group keys; shipdate filter pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(revenue_col()).cast("double").alias("sum_disc_price"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# A6: sort / limit / top-k with deterministic tie-break
# --------------------------------------------------------------------------
@query(
    "q_topk_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
    tags=("A6", "sort"),
)
def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark runs TakeOrderedAndProject (no full sort)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


# --------------------------------------------------------------------------
# J3: multi-way equi join with broadcast dims (TPC-H Q5 shape)
# --------------------------------------------------------------------------
@query(
    "q_revenue_by_nation",
    oracle=f"""
SELECT n.n_name AS nation, r.r_name AS region,
       CAST(sum({SQL_REVENUE}) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY n.n_name, r.r_name
""",
    tags=("J3", "A3", "join"),
    bench=True,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join (lineitem⋈orders, sort-merge at scale) plus three
    broadcast dimension joins; Catalyst reorders, AQE handles skew."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(revenue_col()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# J3: left outer join with null-side aggregation
# --------------------------------------------------------------------------
@query(
    "q_customer_order_counts",
    oracle="""
SELECT c.c_mktsegment, c.c_custkey, count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spend
FROM customer c
LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment, c.c_custkey
""",
    tags=("J3", "join", "left"),
)
def q_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join keeps order-less customers; count(o_orderkey) counts
    only matches (null-skipping), sums coalesce to 0."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec(F.col("o_totalprice"))), F.lit(0))
            .cast("double")
            .alias("total_spend"),
        )
    )


# --------------------------------------------------------------------------
# J3: semi / anti joins
# --------------------------------------------------------------------------
@query(
    "q_semi_join_customers",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
GROUP BY c_mktsegment
""",
    tags=("J3", "semi"),
)
def q_semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi join — no row multiplication, no dedup pass."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "q_anti_join_customers",
    oracle="""
SELECT c_mktsegment, count(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment
""",
    tags=("J3", "anti"),
)
def q_anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti join (customers with no recent order —
    date-filtered so the result is non-degenerate at every SF)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# J3: full outer join of two aggregates
# --------------------------------------------------------------------------
@query(
    "q_full_outer_nation_presence",
    oracle="""
WITH cu AS (SELECT c_nationkey AS nk, count(*) AS n_customers
            FROM customer GROUP BY c_nationkey),
su AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
       FROM supplier GROUP BY s_nationkey)
SELECT coalesce(cu.nk, su.nk) AS nationkey,
       coalesce(cu.n_customers, 0) AS n_customers,
       coalesce(su.n_suppliers, 0) AS n_suppliers
FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
""",
    tags=("J3", "full_outer"),
)
def q_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of customer-count vs supplier-count per nation —
    nations present on only one side survive with zeros."""
    cu = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    su = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cu.join(su, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


# --------------------------------------------------------------------------
# J4: theta (non-equi) join — broadcast nested loop
# --------------------------------------------------------------------------
@query(
    "q_theta_size_brackets",
    oracle="""
WITH brackets AS (
  SELECT r_regionkey AS bracket, r_regionkey * 10 AS lo, r_regionkey * 10 + 20 AS hi
  FROM region
)
SELECT b.bracket, count(*) AS n_parts,
       CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM part p JOIN brackets b ON p.p_size >= b.lo AND p.p_size < b.hi
GROUP BY b.bracket
""",
    tags=("J4", "theta"),
)
def q_theta_size_brackets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range-predicate join (no equi key) → BroadcastNestedLoopJoin
    with the tiny side broadcast; overlapping brackets multiply rows."""
    p = _t(spark, sf_dir, "part")
    b = _t(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("bracket"),
        (F.col("r_regionkey") * 10).alias("lo"),
        (F.col("r_regionkey") * 10 + 20).alias("hi"),
    )
    return (
        p.join(F.broadcast(b), (p.p_size >= b.lo) & (p.p_size < b.hi))
        .groupBy("bracket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum(F.col("p_retailprice")).alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# A4: rollup / cube / grouping sets (portable COALESCE-key encoding)
# --------------------------------------------------------------------------
@query(
    "q_rollup_revenue",
    oracle=f"""
SELECT coalesce(r.r_name, 'ALL') AS region,
       CASE WHEN r.r_name IS NULL THEN 'ALL' ELSE coalesce(n.n_name, 'ALL') END AS nation,
       CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
       count(*) AS n
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
    tags=("A4", "rollup"),
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP region→nation with COALESCE-encoded subtotal keys (same
    encoding both engines, avoiding GROUPING_ID bit-order differences)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    rolled = j.rollup("r_name", "n_name").agg(
        dsum(F.col("c_acctbal")).alias("sum_acctbal"),
        F.count(F.lit(1)).alias("n"),
    )
    return rolled.select(
        F.coalesce("r_name", F.lit("ALL")).alias("region"),
        F.when(F.col("r_name").isNull(), "ALL")
        .otherwise(F.coalesce("n_name", F.lit("ALL")))
        .alias("nation"),
        "sum_acctbal",
        "n",
    )


@query(
    "q_cube_order_stats",
    oracle="""
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
    tags=("A4", "cube"),
)
def q_cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status×priority (no NULLs in either key, so COALESCE
    encoding is unambiguous)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "sum_price",
        )
    )


@query(
    "q_grouping_sets",
    oracle="""
SELECT coalesce(l_returnflag, 'ALL') AS rflag,
       coalesce(l_linestatus, 'ALL') AS lstatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    tags=("A4", "grouping_sets"),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL over the parquet path (no
    temp-view state)."""
    path = f"{sf_dir}/lineitem.parquet"
    return spark.sql(
        f"""
SELECT coalesce(l_returnflag, 'ALL') AS rflag,
       coalesce(l_linestatus, 'ALL') AS lstatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM parquet.`{path}`
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""
    )


# --------------------------------------------------------------------------
# A7: set operations
# --------------------------------------------------------------------------
@query(
    "q_set_ops_nations",
    oracle="""
WITH cu AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
su AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'union' AS op, count(*) AS n FROM (SELECT nk FROM cu UNION SELECT nk FROM su)
UNION ALL
SELECT 'intersect', count(*) FROM (SELECT nk FROM cu INTERSECT SELECT nk FROM su)
UNION ALL
SELECT 'except', count(*) FROM (SELECT nk FROM cu EXCEPT SELECT nk FROM su)
""",
    tags=("A7", "setops"),
)
def q_set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union/intersect/except cardinalities of customer vs supplier
    nation sets."""
    cu = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    su = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    u = cu.union(su).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    i = cu.intersect(su).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = cu.exceptAll(su.distinct()).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("except").alias("op"), "n"
    )
    return u.unionByName(i).unionByName(e)


# --------------------------------------------------------------------------
# A3: distinct aggregation
# --------------------------------------------------------------------------
@query(
    "q_distinct_parts_per_flag",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    tags=("A3", "distinct"),
)
def q_distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Catalyst expands)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# P9: scalar function library — strings
# --------------------------------------------------------------------------
@query(
    "q_scalar_strings",
    oracle="""
SELECT p_partkey,
       lower(p_brand) AS brand_lc,
       upper(substring(p_type, 1, 5)) AS type_prefix,
       length(p_name) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       replace(p_name, ' ', '_') AS name_us,
       regexp_extract(p_type, '([A-Z]+)', 1) AS first_word,
       CAST(strpos(p_name, 'a') AS INTEGER) AS a_pos
FROM part WHERE p_partkey % 10 = 0
""",
    tags=("P9", "strings"),
)
def q_scalar_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library: lower/upper/substring/length/concat_ws/
    replace/regexp_extract/instr — all JVM-codegen'd, no UDFs."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 10 == 0).select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lc"),
        F.upper(F.substring("p_type", 1, 5)).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_us"),
        F.regexp_extract("p_type", "([A-Z]+)", 1).alias("first_word"),
        F.instr(F.col("p_name"), "a").alias("a_pos"),
    )


# --------------------------------------------------------------------------
# P9: scalar function library — dates
# --------------------------------------------------------------------------
@query(
    "q_scalar_dates",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       count(*) AS n_orders,
       CAST(min(date_diff('day', o_orderdate, TIMESTAMP '1999-01-01')) AS INTEGER) AS min_days_to_1999
FROM orders
GROUP BY 1, 2, 3
""",
    tags=("P9", "dates"),
)
def q_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar library: year/month/date_trunc/date_format/datediff."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(
                F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_1999"),
        )
        .groupBy("yr", "mo", "month_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("days_to_1999").alias("min_days_to_1999"),
        )
    )


# --------------------------------------------------------------------------
# P9: scalar function library — math + conditionals
# --------------------------------------------------------------------------
@query(
    "q_scalar_math",
    oracle="""
SELECT p_partkey,
       CAST(abs(p_size - 25) AS INTEGER) AS size_dev,
       CAST(ceil(p_retailprice / 100) AS BIGINT) AS price_century,
       CAST(floor(p_retailprice / 100) AS BIGINT) AS price_century_f,
       CAST(round(CAST(p_retailprice AS DECIMAL(18,2)) % 7, 2) AS DOUBLE)
           AS price_mod7,
       CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid'
            ELSE 'large' END AS size_class,
       CAST(p_size * p_size AS INTEGER) AS size_sq
FROM part WHERE p_partkey % 7 = 0
""",
    tags=("P9", "math"),
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar library: abs/ceil/floor/mod/case-when. The modulo
    runs on DECIMAL so both engines agree exactly."""
    p = _t(spark, sf_dir, "part")
    return p.filter(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.ceil(F.col("p_retailprice") / 100).alias("price_century"),
        F.floor(F.col("p_retailprice") / 100).alias("price_century_f"),
        F.round(dec(F.col("p_retailprice")) % 7, 2).cast("double").alias("price_mod7"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "mid")
        .otherwise("large")
        .alias("size_class"),
        (F.col("p_size") * F.col("p_size")).alias("size_sq"),
    )


# --------------------------------------------------------------------------
# P5/X4: JSON extraction
# --------------------------------------------------------------------------
@query(
    "q_json_props",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n,
       CAST(sum(CAST("value" AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
""",
    tags=("P5", "json"),
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the semi-structured props column (the
    reference's opaque-JSON passthrough, queried on demand)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# A3+A6: having + order via subquery (IN-subquery form)
# --------------------------------------------------------------------------
@query(
    "q_in_subquery_hot_parts",
    oracle="""
SELECT p.p_brand, count(*) AS n_hot_parts
FROM part p
WHERE p.p_partkey IN (
  SELECT l_partkey FROM lineitem
  GROUP BY l_partkey HAVING count(*) >= 5
)
GROUP BY p.p_brand
""",
    tags=("J3", "subquery"),
)
def q_in_subquery_hot_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (decorrelated by Catalyst to a semi join) over a
    HAVING-filtered aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    hot = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 5)
        .select("l_partkey")
    )
    return (
        p.join(hot, p.p_partkey == hot.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_hot_parts"))
    )


@query(
    "q_scalar_dates_extended",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       quarter(o_orderdate) AS qtr,
       dayofweek(o_orderdate) + 1 AS dow,
       weekofyear(o_orderdate) AS iso_week
FROM orders WHERE o_orderkey % 37 = 0
""",
    tags=("P9", "dates"),
)
def q_scalar_dates_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date/calendar functions (P9 widening): add_months
    (day-clamping semantics match DuckDB's +INTERVAL), last_day,
    quarter, day-of-week (normalized to DuckDB's 0=Sunday +1), ISO
    week number."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 37 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months(d, 3).alias("plus3m"),
        F.last_day(d).alias("month_end"),
        F.quarter(d).cast("long").alias("qtr"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.weekofyear(d).cast("long").alias("iso_week"),
    )


@query(
    "q_price_quantity_corr",
    oracle="""
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                  * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) + 0.0
           AS corr_pq,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0 AS slope_q_on_p
FROM m
""",
    tags=("A3", "stats"),
)
def q_price_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation + regression slope from explicit
    DECIMAL moment sums (n, Σx, Σy, Σxy, Σx², Σy²) with the closed
    form evaluated in double at the end. Spark's corr()/covar_samp()
    stream doubles in partition order — nondeterministic in the last
    bits across partitionings; moment sums in decimal are exact and
    merge associatively, which is both the oracle-parity story and the
    right way to compute distributed statistics at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("decimal(18,2)")
    y = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return m.select(
        "l_returnflag",
        "n",
        (
            F.round(
                (n * sxy - sx * sy)
                / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
                6,
            )
            + 0.0
        ).alias("corr_pq"),
        (F.round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) + 0.0).alias(
            "slope_q_on_p"
        ),
    )


# --------------------------------------------------------------------------
# Spark-4 VARIANT: binary semi-structured encoding (parse once, access
# many — the modern form of the reference's opaque-JSON passthrough)
# --------------------------------------------------------------------------
@query(
    "q_variant_props",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS k_mod,
       count(*) AS n,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
WHERE event_type = 'click'
GROUP BY k_mod
""",
    tags=("P5", "variant", "semi-structured"),
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured payloads: parse_json
    once into the binary variant encoding, then typed variant_get
    accesses — versus get_json_object (q_json_props), which re-parses
    the string per extraction. At 100 TB, parse-once-access-many is
    the difference between one and N JSON parses per row; variant is
    also the natural storage type for the reference's opaque
    before/after images (DebeziumChangeEvent.java:8-9)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "long")
    return (
        v.select(k.alias("k"))
        .groupBy((F.col("k") % 5).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_constraint_checks",
    oracle="""
WITH dirty_orders AS (
  SELECT o_orderkey, o_custkey FROM orders
  UNION ALL
  SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 997 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, -1 AS o_custkey
  FROM orders WHERE o_orderkey % 499 = 0
  UNION ALL
  SELECT o_orderkey + 200000000, CAST(NULL AS BIGINT)
  FROM orders WHERE o_orderkey % 503 = 0
),
dirty_li AS (
  SELECT l_quantity FROM lineitem
  UNION ALL
  SELECT 999.0 AS l_quantity FROM lineitem WHERE l_orderkey % 991 = 0
),
dirty_ev AS (
  SELECT event_type FROM events
  UNION ALL
  SELECT 'bogus' AS event_type FROM events WHERE event_id % 101 = 0
),
o_agg AS (
  SELECT count(*) AS n,
         count(*) - count(DISTINCT o_orderkey) AS dups,
         count(*) - count(o_custkey) AS nulls
  FROM dirty_orders
),
fk AS (
  SELECT count(*) AS viol FROM dirty_orders d
  LEFT JOIN customer c ON d.o_custkey = c.c_custkey
  WHERE d.o_custkey IS NOT NULL AND c.c_custkey IS NULL
),
li AS (
  SELECT count(*) AS n,
         count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS viol
  FROM dirty_li
),
ev AS (
  SELECT count(*) AS n,
         count(CASE WHEN event_type NOT IN
               ('purchase','signup','click','error','view') THEN 1 END) AS viol
  FROM dirty_ev
),
docs AS (
  SELECT count(*) AS n,
         count(CASE WHEN n_chars <> len(text) THEN 1 END) AS viol
  FROM documents
)
SELECT * FROM (
  SELECT 'orders.pk_unique' AS constraint, o_agg.n AS n_checked,
         CAST(o_agg.dups AS BIGINT) AS n_violations, o_agg.dups = 0 AS passed
  FROM o_agg
  UNION ALL
  SELECT 'orders.custkey_not_null', o_agg.n, CAST(o_agg.nulls AS BIGINT),
         o_agg.nulls = 0 FROM o_agg
  UNION ALL
  SELECT 'orders.fk_customer', o_agg.n, CAST(fk.viol AS BIGINT), fk.viol = 0
  FROM o_agg CROSS JOIN fk
  UNION ALL
  SELECT 'lineitem.qty_in_1_50', li.n, CAST(li.viol AS BIGINT), li.viol = 0
  FROM li
  UNION ALL
  SELECT 'events.type_accepted', ev.n, CAST(ev.viol AS BIGINT), ev.viol = 0
  FROM ev
  UNION ALL
  SELECT 'documents.n_chars_consistent', docs.n, CAST(docs.viol AS BIGINT),
         docs.viol = 0 FROM docs
)
""",
    tags=("quality", "constraints", "deequ"),
)
def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality CONSTRAINT battery (the Deequ / dbt-tests shape):
    primary-key uniqueness, NOT NULL, referential integrity, accepted
    value ranges/sets, and derived-column consistency — one row per
    constraint with checked/violation counts. The fixture is clean, so
    violations are INJECTED deterministically (duplicate pk rows,
    orphan and null foreign keys, out-of-range quantities, unknown
    enum values) and the checker must report their exact counts —
    a checker that only ever prints zeros proves nothing.

    Scale shape: per-table checks FUSE into one aggregate pass over
    that table (count/countDistinct/conditional counts in a single
    agg); only referential integrity needs a join, and its dimension
    side broadcasts. Six constraints cost four table passes + one
    broadcast join, not six scans each."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    dirty_orders = (
        o.unionByName(o.filter(F.col("o_orderkey") % 997 == 0))
        .unionByName(
            o.filter(F.col("o_orderkey") % 499 == 0).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                F.lit(-1).cast("long").alias("o_custkey"),
            )
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 503 == 0).select(
                (F.col("o_orderkey") + 200_000_000).alias("o_orderkey"),
                F.lit(None).cast("long").alias("o_custkey"),
            )
        )
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    dirty_li = li.select("l_quantity").unionByName(
        li.filter(F.col("l_orderkey") % 991 == 0).select(
            F.lit(999.0).alias("l_quantity")
        )
    )
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dirty_ev = ev.select("event_type").unionByName(
        ev.filter(F.col("event_id") % 101 == 0).select(
            F.lit("bogus").alias("event_type")
        )
    )
    docs = load_table(spark, sf_dir, "documents").select("n_chars", "text")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    o_agg = dirty_orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dups"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("nulls"),
    )
    fk = (
        dirty_orders.filter(F.col("o_custkey").isNotNull())
        .join(F.broadcast(cust), dirty_orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("viol"))
    )
    li_agg = dirty_li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("viol"),
    )
    ev_agg = dirty_ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(
            F.when(
                ~F.col("event_type").isin(
                    "purchase", "signup", "click", "error", "view"
                ),
                1,
            )
        ).alias("viol"),
    )
    d_agg = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("n_chars") != F.length("text"), 1)).alias("viol"),
    )

    def row(name, n_col, v_col, src):
        return src.select(
            F.lit(name).alias("constraint"),
            F.col(n_col).alias("n_checked"),
            F.col(v_col).cast("long").alias("n_violations"),
            (F.col(v_col) == 0).alias("passed"),
        )

    return (
        row("orders.pk_unique", "n", "dups", o_agg)
        .unionByName(row("orders.custkey_not_null", "n", "nulls", o_agg))
        .unionByName(
            o_agg.crossJoin(fk).select(
                F.lit("orders.fk_customer").alias("constraint"),
                F.col("n").alias("n_checked"),
                F.col("viol").cast("long").alias("n_violations"),
                (F.col("viol") == 0).alias("passed"),
            )
        )
        .unionByName(row("lineitem.qty_in_1_50", "n", "viol", li_agg))
        .unionByName(row("events.type_accepted", "n", "viol", ev_agg))
        .unionByName(row("documents.n_chars_consistent", "n", "viol", d_agg))
    )


@query(
    "q_merge_into",
    oracle="""
WITH src AS (
  SELECT c_custkey AS key,
         CAST(c_acctbal AS DOUBLE) + 100.0 AS new_bal,
         (c_custkey % 11 = 0) AS is_delete
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + 1000000 AS key,
         CAST(500.0 AS DOUBLE) AS new_bal,
         FALSE AS is_delete
  FROM customer WHERE c_custkey % 13 = 0
),
merged AS (
  SELECT COALESCE(t.c_custkey, s.key) AS key,
         CASE WHEN s.key IS NULL THEN t.c_mktsegment
              WHEN t.c_custkey IS NULL THEN 'NEW'
              ELSE t.c_mktsegment END AS seg,
         CASE WHEN s.key IS NULL THEN CAST(t.c_acctbal AS DOUBLE)
              ELSE s.new_bal END AS bal,
         COALESCE(s.is_delete, FALSE) AS del
  FROM customer t FULL JOIN src s ON t.c_custkey = s.key
)
SELECT seg,
       count(*) AS n_rows,
       CAST(CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE)
         AS sum_bal
FROM merged WHERE NOT del
GROUP BY seg
""",
    tags=("merge", "lakehouse", "upsert"),
)
def q_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames — the lakehouse
    three-way merge (WHEN MATCHED AND del THEN DELETE / WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED THEN INSERT) expressed as ONE
    full-outer join + conditional projection, no table format
    required: the batch form of the streaming upsert sink. The source
    change set is derived deterministically from the target (updates
    for keys %7, deletes %11 among them, inserts at shifted keys %13)
    so both engines merge identical inputs; declared output =
    per-segment row counts and decimal-exact balance sums of the
    POST-MERGE table — any wrong action (lost delete, double insert,
    missed update) shifts a count or a sum.

    Scale: one shuffle on the merge key (or zero with co-bucketed
    target/source); at 100 TB this is exactly the join Delta/Iceberg
    MERGE plans, minus their transaction log."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    upd = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("key"),
        (F.col("c_acctbal").cast("double") + 100.0).alias("new_bal"),
        (F.col("c_custkey") % 11 == 0).alias("is_delete"),
    )
    ins = c.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1_000_000).alias("key"),
        F.lit(500.0).alias("new_bal"),
        F.lit(False).alias("is_delete"),
    )
    src = upd.unionByName(ins)
    merged = c.join(src, c.c_custkey == src.key, "full_outer").select(
        F.coalesce(F.col("c_custkey"), F.col("key")).alias("mkey"),
        F.when(F.col("key").isNull(), F.col("c_mktsegment"))
        .when(F.col("c_custkey").isNull(), F.lit("NEW"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.when(F.col("key").isNull(), F.col("c_acctbal").cast("double"))
        .otherwise(F.col("new_bal"))
        .alias("bal"),
        F.coalesce(F.col("is_delete"), F.lit(False)).alias("del"),
    )
    return (
        merged.filter(~F.col("del"))
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("bal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
    )


@query(
    "q_chi2_independence",
    oracle="""
WITH obs AS (
  SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow, count(*) AS o
  FROM events GROUP BY event_type, dow
),
m AS (
  SELECT event_type, dow, o,
         CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS row_tot,
         CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS col_tot,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM obs
),
t AS (
  SELECT event_type, dow,
         CAST(round(
           (o - CAST(row_tot AS DOUBLE) * col_tot / n)
           * (o - CAST(row_tot AS DOUBLE) * col_tot / n)
           / (CAST(row_tot AS DOUBLE) * col_tot / n), 6)
           AS DECIMAL(28,6)) AS term,
         row_tot, col_tot, n
  FROM m
)
SELECT CAST((SELECT count(DISTINCT event_type) FROM obs) AS BIGINT)
         AS n_types,
       CAST((SELECT count(DISTINCT dow) FROM obs) AS BIGINT) AS n_dows,
       CAST(((SELECT count(DISTINCT event_type) FROM obs) - 1)
            * ((SELECT count(DISTINCT dow) FROM obs) - 1) AS BIGINT) AS dof,
       CAST(max(n) AS BIGINT) AS n,
       CAST(CAST(sum(term) AS DOUBLE) AS DOUBLE) AS chi2
FROM t
""",
    tags=("stats", "profiling", "chi2"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE statistic between event type and
    weekday — the categorical-association profile a feature-selection
    or drift-monitoring pass computes: contingency counts, margins as
    windows over the cell table (no re-scan), expected frequencies,
    and the statistic as a decimal-exact sum of 6-dp-rounded cell
    terms (each term is identical IEEE double arithmetic in both
    engines; the rounding+decimal makes the SUM order-free). One scan,
    one cell aggregate, window margins, one final fold."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    m = obs.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).cast("long").alias("row_tot"),
        F.sum("o").over(W.partitionBy("dow")).cast("long").alias("col_tot"),
        F.sum("o").over(W.partitionBy(F.lit(1))).cast("long").alias("n"),
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    term = F.round((F.col("o") - exp) * (F.col("o") - exp) / exp, 6).cast(
        "decimal(28,6)"
    )
    t = m.select("event_type", "dow", term.alias("term"), "n")
    types = obs.agg(F.countDistinct("event_type").alias("n_types"))
    dows = obs.agg(F.countDistinct("dow").alias("n_dows"))
    return (
        t.agg(
            F.max("n").cast("long").alias("n"),
            F.sum("term").cast("double").alias("chi2"),
        )
        .crossJoin(F.broadcast(types))
        .crossJoin(F.broadcast(dows))
        .select(
            F.col("n_types").cast("long").alias("n_types"),
            F.col("n_dows").cast("long").alias("n_dows"),
            ((F.col("n_types") - 1) * (F.col("n_dows") - 1))
            .cast("long")
            .alias("dof"),
            "n",
            "chi2",
        )
    )


@query(
    "q_rfm_segmentation",
    oracle="""
WITH g AS (SELECT max(o_orderdate) AS mxd FROM orders),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', max(o_orderdate), g.mxd) AS recency_days,
         count(*) AS frequency,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
  FROM orders CROSS JOIN g
  GROUP BY o_custkey, g.mxd
),
scored AS (
  SELECT o_custkey,
         CAST(ntile(5) OVER (ORDER BY recency_days, o_custkey) AS BIGINT) AS r,
         CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS BIGINT) AS f,
         CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS BIGINT) AS m,
         monetary
  FROM per_cust
)
SELECT r * 100 + f * 10 + m AS rfm_code,
       count(*) AS n_customers,
       CAST(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE) AS DOUBLE)
         AS total_monetary
FROM scored GROUP BY rfm_code
""",
    tags=("analytics", "rfm", "A5"),
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM CUSTOMER SEGMENTATION — the canonical marketing-analytics
    scoring: per customer recency (days since last order, horizon =
    data-derived max date), frequency (order count) and monetary
    (decimal-exact spend), each quintiled with ntile (custkey
    tie-break so bucket edges are deterministic cross-engine), folded
    into the three-digit RFM code and summarized per segment. Three
    global ntile sorts share one driver-free plan; at 100 TB swap
    ntile for precomputed quantile cuts (q_winsorize's pattern) to
    avoid the global sorts."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    g = o.agg(F.max("o_orderdate").alias("mxd"))
    per_cust = (
        o.crossJoin(F.broadcast(g))
        .groupBy("o_custkey", "mxd")
        .agg(
            F.datediff(F.col("mxd"), F.max("o_orderdate")).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    scored = per_cust.select(
        "o_custkey",
        F.ntile(5)
        .over(W.orderBy("recency_days", "o_custkey"))
        .cast("long")
        .alias("r"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").desc(), F.col("o_custkey")))
        .cast("long")
        .alias("f"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary").desc(), F.col("o_custkey")))
        .cast("long")
        .alias("m"),
        "monetary",
    )
    return (
        scored.select(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("rfm_code"),
            "monetary",
        )
        .groupBy("rfm_code")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("monetary").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_monetary"),
        )
    )


@query(
    "q_status_transitions",
    oracle="""
WITH s AS (
  SELECT o_custkey, o_orderstatus,
         lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey)
           AS prev_status
  FROM orders
),
t AS (
  SELECT prev_status AS from_status, o_orderstatus AS to_status, count(*) AS n
  FROM s WHERE prev_status IS NOT NULL
  GROUP BY prev_status, o_orderstatus
),
tot AS (SELECT from_status, CAST(sum(n) AS BIGINT) AS row_tot FROM t
        GROUP BY from_status)
SELECT t.from_status, t.to_status, t.n,
       round(CAST(t.n AS DOUBLE) / tot.row_tot, 6) AS p
FROM t JOIN tot ON t.from_status = tot.from_status
""",
    tags=("analytics", "sequence", "markov", "A5"),
)
def q_status_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-STATUS TRANSITION MATRIX — first-order Markov estimate
    over each customer's order sequence (by order date, key
    tie-break): consecutive-status pairs counted and row-normalized
    into transition probabilities — the sequence-mining profile behind
    churn and lifecycle models. One keyed window (lag) on the custkey
    shuffle, one small pair aggregate, row totals joined back from the
    pair table itself (never re-scanning orders)."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    s = o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
    t = (
        s.filter(F.col("prev_status").isNotNull())
        .groupBy(
            F.col("prev_status").alias("from_status"),
            F.col("o_orderstatus").alias("to_status"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = t.groupBy("from_status").agg(F.sum("n").cast("long").alias("row_tot"))
    return t.join(F.broadcast(tot), "from_status").select(
        "from_status",
        "to_status",
        "n",
        F.round(F.col("n").cast("double") / F.col("row_tot"), 6).alias("p"),
    )


@query(
    "q_basket_affinity",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
n AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
item AS (SELECT pk, count(*) AS c FROM li GROUP BY pk),
pair AS (
  SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS c_ab
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
scored AS (
  SELECT p.pk_a, p.pk_b, p.c_ab,
         round(CAST(p.c_ab AS DOUBLE) / ia.c, 6) AS confidence_a_to_b,
         round(CAST(p.c_ab AS DOUBLE) * n.n_orders / (ia.c * ib.c), 6) AS lift
  FROM pair p
  JOIN item ia ON ia.pk = p.pk_a
  JOIN item ib ON ib.pk = p.pk_b
  CROSS JOIN n
  WHERE p.c_ab >= 3
),
r AS (
  SELECT *, row_number() OVER (ORDER BY lift DESC, pk_a, pk_b) AS rn
  FROM scored
)
SELECT pk_a, pk_b, c_ab, confidence_a_to_b, lift, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 20
""",
    tags=("analytics", "market-basket", "J3"),
)
def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MARKET-BASKET AFFINITY — association-rule mining core: for
    co-ordered part pairs with minimum support, confidence P(b|a) and
    lift P(ab)/(P(a)P(b)), top-20 by lift. The pair space is the
    order-blocked self-join (bounded by basket size — the same
    blocking argument as dedup); item counts broadcast back onto the
    pair table; the top-k rides WindowGroupLimit. At 100 TB this is
    one keyed self-join + dimension-sized joins, never an all-pairs
    product over the catalog."""
    from pyspark.sql import Window as W

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.agg(F.countDistinct("ok").cast("long").alias("n_orders"))
    item = li.groupBy("pk").agg(F.count(F.lit(1)).alias("c"))
    a = li.select("ok", F.col("pk").alias("pk_a"))
    b = li.select("ok", F.col("pk").alias("pk_b"))
    pair = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = item.select(F.col("pk").alias("pk_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("pk").alias("pk_b"), F.col("c").alias("c_b"))
    scored = (
        pair.join(F.broadcast(ia), "pk_a")
        .join(F.broadcast(ib), "pk_b")
        .crossJoin(F.broadcast(n))
        .select(
            "pk_a",
            "pk_b",
            "c_ab",
            F.round(F.col("c_ab").cast("double") / F.col("c_a"), 6).alias(
                "confidence_a_to_b"
            ),
            F.round(
                F.col("c_ab").cast("double")
                * F.col("n_orders")
                / (F.col("c_a") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )
    w = W.orderBy(F.col("lift").desc(), "pk_a", "pk_b")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 20)
        .select("pk_a", "pk_b", "c_ab", "confidence_a_to_b", "lift", "rn")
    )


@query(
    "q_weekday_seasonality",
    oracle="""
WITH d AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(dayofweek(ts) AS BIGINT) + 1 AS dow,
         CAST("value" AS DECIMAL(18,2)) AS v
  FROM events WHERE event_type = 'purchase'
),
daily AS (
  SELECT day, dow, CAST(sum(v) AS DOUBLE) AS rev FROM d GROUP BY day, dow
),
o AS (
  SELECT CAST(CAST(sum(CAST(round(rev, 6) AS DECIMAL(28,6))) AS DOUBLE)
              / count(*) AS DOUBLE) AS grand_mean
  FROM daily
)
SELECT dow,
       count(*) AS n_days,
       CAST(CAST(sum(CAST(round(rev, 6) AS DECIMAL(28,6))) AS DOUBLE)
            / count(*) AS DOUBLE) AS day_mean,
       round(CAST(CAST(sum(CAST(round(rev, 6) AS DECIMAL(28,6))) AS DOUBLE)
             / count(*) AS DOUBLE) / o.grand_mean, 6) AS seasonal_index
FROM daily CROSS JOIN o
GROUP BY dow, o.grand_mean
""",
    tags=("analytics", "seasonality", "timeseries"),
)
def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEKDAY SEASONALITY INDICES — the multiplicative decomposition
    step of classical time-series analysis: daily purchase revenue
    rolled up, each weekday's mean divided by the grand daily mean
    (index > 1 = above-trend day). Decimal-exact means both levels;
    the single grand-mean row broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.dayofweek("ts").cast("long").alias("dow"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev")
        )
    )
    dmean = F.sum(F.round("rev", 6).cast("decimal(28,6)")).cast(
        "double"
    ) / F.count(F.lit(1))
    o = daily.agg(dmean.alias("grand_mean"))
    return (
        daily.crossJoin(F.broadcast(o))
        .groupBy("dow", "grand_mean")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            dmean.alias("day_mean"),
        )
        .select(
            "dow",
            "n_days",
            "day_mean",
            F.round(F.col("day_mean") / F.col("grand_mean"), 6).alias(
                "seasonal_index"
            ),
        )
    )


@query(
    "q_pareto_abc",
    oracle="""
WITH p AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                       AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS rev
  FROM lineitem GROUP BY l_partkey
),
r AS (
  SELECT l_partkey, CAST(rev AS DOUBLE) AS rev,
         CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS DOUBLE) AS cum_rev,
         CAST(sum(rev) OVER () AS DOUBLE) AS tot,
         row_number() OVER (ORDER BY rev DESC, l_partkey) AS rn,
         count(*) OVER () AS n_parts
  FROM p
),
c AS (
  SELECT *,
         CASE WHEN cum_rev / tot <= 0.8 THEN 'A'
              WHEN cum_rev / tot <= 0.95 THEN 'B'
              ELSE 'C' END AS abc
  FROM r
)
SELECT abc,
       count(*) AS n_parts,
       round(CAST(count(*) AS DOUBLE) / max(n_parts), 6) AS part_share,
       round(CAST(CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)
             / max(tot), 6) AS revenue_share
FROM c GROUP BY abc
""",
    tags=("analytics", "pareto", "A5"),
)
def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARETO / ABC ANALYSIS — the 80-20 concentration profile: parts
    ranked by revenue, cumulative share via a running decimal-exact
    sum, classed A (first 80% of revenue), B (to 95%), C (tail);
    output = part and revenue share per class. The classic inventory/
    catalog concentration report, and the shape (global rank + running
    sum) matches q_winsorize's documented approx-cut swap at scale."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("decimal(28,4)")
        .alias("rev_d")
    )
    w = W.orderBy(F.col("rev_d").desc(), F.col("l_partkey"))
    r = p.select(
        "l_partkey",
        F.col("rev_d").cast("double").alias("rev"),
        F.sum("rev_d")
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("cum_rev"),
        F.sum("rev_d").over(W.partitionBy(F.lit(1))).cast("double").alias("tot"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("n_parts"),
    )
    abc = (
        F.when(F.col("cum_rev") / F.col("tot") <= 0.8, "A")
        .when(F.col("cum_rev") / F.col("tot") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        r.withColumn("abc", abc)
        .groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.max("n_parts"), 6
            ).alias("part_share"),
            F.round(
                F.sum(F.col("rev").cast("decimal(18,4)")).cast("double")
                / F.max("tot"),
                6,
            ).alias("revenue_share"),
        )
    )


@query(
    "q_new_vs_returning",
    oracle="""
WITH p AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST("value" AS DECIMAL(18,2)) AS v
  FROM events WHERE event_type = 'purchase'
),
f AS (SELECT user_id, min(day) AS first_day FROM p GROUP BY user_id)
SELECT strftime(p.day, '%Y-%m-%d') AS day,
       CAST(count(DISTINCT CASE WHEN p.day = f.first_day
                                THEN p.user_id END) AS BIGINT) AS new_buyers,
       CAST(count(DISTINCT CASE WHEN p.day > f.first_day
                                THEN p.user_id END) AS BIGINT)
         AS returning_buyers,
       CAST(sum(CASE WHEN p.day = f.first_day THEN v END) AS DOUBLE)
         AS new_revenue,
       CAST(COALESCE(sum(CASE WHEN p.day > f.first_day THEN v END), 0)
            AS DOUBLE) AS returning_revenue
FROM p JOIN f ON p.user_id = f.user_id
GROUP BY p.day
""",
    tags=("analytics", "cohort", "growth"),
)
def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEW vs RETURNING buyer split per day — the growth-accounting
    daily report: each purchase classed by whether it falls on its
    user's FIRST purchase day (window-free: the first-day table is one
    keyed aggregate joined back), with distinct-buyer counts and
    decimal-exact revenue on both sides. First-day table is
    user-cardinality — broadcastable at dimension scale, co-partitioned
    join beyond."""
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    f = p.groupBy("user_id").agg(F.min("day").alias("first_day"))
    is_new = F.col("day") == F.col("first_day")
    return (
        p.join(F.broadcast(f), "user_id")
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            F.countDistinct(F.when(is_new, F.col("user_id"))).alias("new_buyers"),
            F.countDistinct(F.when(~is_new, F.col("user_id"))).alias(
                "returning_buyers"
            ),
            F.sum(F.when(is_new, F.col("v"))).cast("double").alias("new_revenue"),
            F.coalesce(F.sum(F.when(~is_new, F.col("v"))), F.lit(0))
            .cast("double")
            .alias("returning_revenue"),
        )
    )


@query(
    "q_price_elasticity",
    oracle="""
WITH x AS (
  SELECT p.p_brand,
         CAST(round(ln(CAST(l.l_extendedprice / l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS lx,
         CAST(round(ln(CAST(l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS ly,
         CAST(round(ln(CAST(l.l_extendedprice / l.l_quantity AS DOUBLE))
                    * ln(CAST(l.l_extendedprice / l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS lxx,
         CAST(round(ln(CAST(l.l_extendedprice / l.l_quantity AS DOUBLE))
                    * ln(CAST(l.l_quantity AS DOUBLE)), 9)
              AS DECIMAL(28,9)) AS lxy
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
s AS (
  SELECT p_brand, count(*) AS n,
         CAST(sum(lx) AS DOUBLE) AS sx, CAST(sum(ly) AS DOUBLE) AS sy,
         CAST(sum(lxx) AS DOUBLE) AS sxx, CAST(sum(lxy) AS DOUBLE) AS sxy
  FROM x GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
FROM s WHERE n >= 30
""",
    tags=("analytics", "regression", "elasticity"),
)
def q_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED closed-form regression — log-log price elasticity of
    demand per brand (slope of ln quantity on ln unit price): the
    text_zipf_fit machinery generalized to per-group fits, each
    brand's five moment sums decimal-exact and the slope one closed
    fold — regression over a 100 TB fact table as a single aggregate
    pass, no per-group iteration or driver loop. Brands under 30
    observations are suppressed (unstable fits)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
    lx = F.log((F.col("l_extendedprice") / F.col("l_quantity")).cast("double"))
    ly = F.log(F.col("l_quantity").cast("double"))
    dec = "decimal(28,9)"
    x = j.select(
        "p_brand",
        F.round(lx, 9).cast(dec).alias("lx"),
        F.round(ly, 9).cast(dec).alias("ly"),
        F.round(lx * lx, 9).cast(dec).alias("lxx"),
        F.round(lx * ly, 9).cast(dec).alias("lxy"),
    )
    s = x.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").cast("double").alias("sx"),
        F.sum("ly").cast("double").alias("sy"),
        F.sum("lxx").cast("double").alias("sxx"),
        F.sum("lxy").cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.filter(F.col("n") >= 30).select(
        "p_brand",
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("elasticity"),
    )


@query(
    "q_gini_spend",
    oracle="""
WITH s AS (
  SELECT o_custkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
           AS spend
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT spend,
         row_number() OVER (ORDER BY spend, o_custkey) AS i,
         count(*) OVER () AS n
  FROM s
),
t AS (
  SELECT max(n) AS n,
         CAST(sum(spend) AS DOUBLE) AS tot,
         CAST(sum(CAST(i AS DECIMAL(28,2)) * spend) AS DOUBLE) AS iws
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_customers,
       round(tot, 2) AS total_spend,
       round(2.0 * iws / (n * tot) - (n + 1.0) / n, 6) AS gini
FROM t
""",
    tags=("analytics", "gini", "concentration"),
)
def q_gini_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of customer spend — the scalar inequality
    measure next to q_pareto_abc's class view: rank-weighted sorted
    sums (G = 2·Σ i·x_i / (n·Σx) − (n+1)/n), all sums decimal-exact
    over a single rank window, the final formula one double fold.
    Whale-dominated revenue (high Gini) changes sampling and CAC
    decisions — and at 100 TB the rank window swaps for quantile-cut
    binning exactly as documented in q_winsorize."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    s = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .alias("spend")
    )
    r = s.select(
        "spend",
        F.row_number().over(W.orderBy("spend", "o_custkey")).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1))).alias("n"),
    )
    t = r.agg(
        F.max("n").alias("n"),
        F.sum("spend").cast("double").alias("tot"),
        F.sum(F.col("i").cast("decimal(28,2)") * F.col("spend"))
        .cast("double")
        .alias("iws"),
    )
    return t.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round("tot", 2).alias("total_spend"),
        F.round(
            2.0 * F.col("iws") / (F.col("n") * F.col("tot"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


@query(
    "q_benford_screen",
    oracle="""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
              AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 1
),
c AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT c.digit, c.n,
       round(CAST(c.n AS DOUBLE) / t.tot, 6) AS observed,
       round(ln(1.0 + 1.0 / c.digit) / ln(10.0), 6) AS benford,
       round(abs(CAST(c.n AS DOUBLE) / t.tot
                 - ln(1.0 + 1.0 / c.digit) / ln(10.0)), 6) AS abs_dev
FROM c CROSS JOIN t
""",
    tags=("analytics", "forensics", "benford"),
)
def q_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENFORD'S-LAW FIRST-DIGIT SCREEN — the classic forensic test
    for fabricated numeric data: observed leading-digit frequencies of
    order totals against the log10(1 + 1/d) expectation, with absolute
    deviations (auditors threshold these). The digit comes from the
    DECIMAL(18,2) string rendering so both engines extract the same
    leading character; one aggregation, total broadcast back."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").cast("long").alias("tot"))
    import math

    ln10 = float(math.log(10.0))
    benford = F.log(1.0 + 1.0 / F.col("digit")) / F.lit(ln10)
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("observed"),
        F.round(benford, 6).alias("benford"),
        F.round(
            F.abs(F.col("n").cast("double") / F.col("tot") - benford), 6
        ).alias("abs_dev"),
    )


@query(
    "q_skyline_pareto",
    oracle="""
WITH a AS (
  SELECT o_custkey,
         CAST(max(o_totalprice) AS DECIMAL(18,2)) AS max_order,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
SELECT b.o_custkey AS c_custkey,
       CAST(b.max_order AS DOUBLE) AS max_order,
       b.n_orders
FROM a b
WHERE NOT EXISTS (
  SELECT 1 FROM a d
  WHERE d.max_order >= b.max_order AND d.n_orders >= b.n_orders
    AND (d.max_order > b.max_order OR d.n_orders > b.n_orders)
)
""",
    tags=("analytics", "skyline", "A5"),
)
def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto frontier) over customers maximizing (largest
    single order, order count) — the big-ticket vs frequent-buyer
    trade-off: a customer survives iff no other customer is
    >= on both dimensions and > on one. The oracle states the O(n^2)
    NOT EXISTS dominance SPEC; the Spark plan is the distributed 2-D
    algorithm — never a self-join:

    1. per-max_order LEVELS (groupBy -> max count at that level);
    2. levels are range-bucketed by value and each bucket computes its
       local descending prefix-max of counts (window PARTITIONED BY
       bucket — parallel);
    3. only the per-bucket maxima (one row per bucket) pass through
       the single global prefix window — tiny by construction;
    4. run_before = max(local prefix, higher-buckets prefix) = the
       best count among all STRICTLY higher spends; a row is skyline
       iff its count equals its level max and beats run_before. The one
    single-partition window in the plan runs over the BUCKET MAXIMA
    (one row per range bucket), never over levels or customers.

    Total cost: the customer agg shuffle + a levels groupBy + one
    bucket-partitioned window — O(n log n) work with no pairwise
    stage, which is the property that survives 100x (the textbook
    NOT EXISTS form is quadratic). Dimensions are decimal/long exact
    (plans/parity.py policy) so the frontier is engine- and
    partitioning-independent; >2 dimensions would swap step 2-4 for
    the local-skyline-then-merge recipe (skyline is
    union-decomposable: skyline(A + B) = skyline(skyline(A) +
    skyline(B)))."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    a = o.groupBy("o_custkey").agg(
        F.max(F.col("o_totalprice")).cast("decimal(18,2)").alias("max_order"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    levels = a.groupBy("max_order").agg(F.max("n_orders").alias("lvl_max"))
    levels = levels.withColumn(
        "bucket", F.floor(F.col("max_order") / 50000).cast("long")
    )
    w_local = (
        W.partitionBy("bucket")
        .orderBy(F.col("max_order").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    levels = levels.withColumn("local_before", F.max("lvl_max").over(w_local))
    bmax = levels.groupBy("bucket").agg(F.max("lvl_max").alias("bmax"))
    w_glob = (
        W.orderBy(F.col("bucket").desc()).rowsBetween(W.unboundedPreceding, -1)
    )
    bmax = bmax.withColumn("higher_before", F.max("bmax").over(w_glob)).drop("bmax")
    lv = levels.join(F.broadcast(bmax), "bucket").select(
        "max_order",
        "lvl_max",
        F.greatest(
            F.coalesce(F.col("local_before"), F.lit(-1).cast("long")),
            F.coalesce(F.col("higher_before"), F.lit(-1).cast("long")),
        ).alias("run_before"),
    )
    return (
        a.join(lv, "max_order")
        .filter(
            (F.col("n_orders") == F.col("lvl_max"))
            & (F.col("n_orders") > F.col("run_before"))
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("max_order").cast("double").alias("max_order"),
            "n_orders",
        )
    )


@query(
    "q_k_anonymity_audit",
    oracle="""
WITH qi AS (
  SELECT c_custkey,
         c_nationkey,
         c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band
  FROM customer
),
grp AS (
  SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS grp_size
  FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
),
ks AS (SELECT CAST(unnest([2, 5, 10]) AS BIGINT) AS k)
SELECT k.k,
       CAST(count(CASE WHEN g.grp_size < k.k THEN 1 END) AS BIGINT)
         AS groups_below_k,
       CAST(COALESCE(sum(CASE WHEN g.grp_size < k.k THEN g.grp_size END), 0)
            AS BIGINT) AS customers_exposed,
       CAST(min(g.grp_size) AS BIGINT) AS k_anonymity_level,
       CAST(count(*) AS BIGINT) AS n_groups
FROM ks k CROSS JOIN grp g
GROUP BY k.k
""",
    tags=("A3", "privacy", "k-anonymity"),
)
def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-ANONYMITY AUDIT (Sweeney 2002 — the privacy screen a dataset
    release runs next to the PII scrub): group customers by the
    quasi-identifier tuple (nation, market segment, $1000 account-
    balance band) and report, for k in {2, 5, 10}, how many QI groups
    fall below k and how many individuals those groups expose —
    plus the dataset's actual k-anonymity level (the min group size).
    A group of size < k means its members are re-identifiable by
    joining public attributes.

    Scale shape: one groupBy over the QI tuple (map-side combine),
    then a 3-row broadcast cross join with the k thresholds folded in
    a second small aggregate — group count is bounded by the QI
    domain, not the row count."""
    c = load_table(spark, sf_dir, "customer")
    grp = (
        c.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(F.count(F.lit(1)).alias("grp_size"))
    )
    ks = spark.range(0).sparkSession.createDataFrame([(2,), (5,), (10,)], "k long")
    return (
        F.broadcast(ks)
        .crossJoin(grp)
        .groupBy("k")
        .agg(
            F.count(F.when(F.col("grp_size") < F.col("k"), 1)).alias(
                "groups_below_k"
            ),
            F.coalesce(
                F.sum(F.when(F.col("grp_size") < F.col("k"), F.col("grp_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("customers_exposed"),
            F.min("grp_size").alias("k_anonymity_level"),
            F.count(F.lit(1)).alias("n_groups"),
        )
        .select(
            "k", "groups_below_k", "customers_exposed",
            "k_anonymity_level", "n_groups",
        )
    )


@query(
    "q_l_diversity",
    oracle="""
WITH qi AS (
  SELECT c_custkey,
         c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
),
grp AS (
  SELECT c_nationkey, bal_band,
         count(*) AS grp_size,
         count(DISTINCT c_mktsegment) AS l_div
  FROM qi GROUP BY c_nationkey, bal_band
),
ls AS (SELECT CAST(unnest([2, 3, 5]) AS BIGINT) AS l)
SELECT l.l,
       CAST(count(CASE WHEN g.l_div < l.l THEN 1 END) AS BIGINT)
         AS groups_below_l,
       CAST(COALESCE(sum(CASE WHEN g.l_div < l.l THEN g.grp_size END), 0)
            AS BIGINT) AS customers_exposed,
       CAST(min(g.l_div) AS BIGINT) AS l_diversity_level,
       CAST(count(*) AS BIGINT) AS n_groups
FROM ls l CROSS JOIN grp g
GROUP BY l.l
""",
    tags=("A3", "privacy", "l-diversity"),
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L-DIVERSITY AUDIT (Machanavajjhala et al. 2007 — the screen
    k-anonymity alone cannot provide): a QI group can satisfy k yet
    leak the sensitive attribute outright if every member shares the
    same value. Group customers by the quasi-identifier tuple
    (nation, $1000 balance band) and, treating the market segment as
    the sensitive attribute, report for l in {2, 3, 5} how many
    groups carry fewer than l distinct sensitive values and how many
    individuals those homogeneous groups expose — plus the dataset's
    actual l-diversity level (the min distinct-count).

    Scale shape: one groupBy over the QI tuple computing
    count + count(DISTINCT sensitive) together (Spark plans the
    distinct via a partial expand, still a single shuffle keyed on
    the QI), then the 3-row broadcast threshold cross join — the same
    bounded second aggregate as q_k_anonymity_audit."""
    c = load_table(spark, sf_dir, "customer")
    grp = (
        c.select(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
            "c_mktsegment",
        )
        .groupBy("c_nationkey", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("grp_size"),
            F.countDistinct("c_mktsegment").alias("l_div"),
        )
    )
    ls = spark.createDataFrame([(2,), (3,), (5,)], "l long")
    return (
        F.broadcast(ls)
        .crossJoin(grp)
        .groupBy("l")
        .agg(
            F.count(F.when(F.col("l_div") < F.col("l"), 1)).alias(
                "groups_below_l"
            ),
            F.coalesce(
                F.sum(F.when(F.col("l_div") < F.col("l"), F.col("grp_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("customers_exposed"),
            F.min("l_div").alias("l_diversity_level"),
            F.count(F.lit(1)).alias("n_groups"),
        )
        .select(
            "l", "groups_below_l", "customers_exposed",
            "l_diversity_level", "n_groups",
        )
    )


@query(
    "q_join_size_by_counts",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS join_rows,
       CAST(count(DISTINCT l.l_orderkey) AS BIGINT) AS matched_keys
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
""",
    tags=("A3", "cardinality-estimation", "join-size"),
)
def q_join_size_by_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-SIZE COMPUTATION WITHOUT THE JOIN — the cost-based
    optimizer's cardinality identity |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k)
    evaluated exactly: per-key counts on each side, a join of the two
    AGGREGATES (one row per key, never the fact rows), and a decimal
    sum of the products. The oracle executes the real join and
    counts; the plan here touches |keys| rows post-aggregation
    instead of |A|·selectivity output rows.

    Why it matters at 100 TB: this is how an engine sizes a shuffle
    before paying for it (skew detection runs the same per-key count
    sketch) — and the identity doubles as a cheap join-result
    validation: if the materialized pipeline's row count disagrees
    with this number, a key exploded or a filter leaked."""
    l_cnt = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("nl"))
    )
    o_cnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("no"))
    )
    return l_cnt.join(o_cnt, "k").agg(
        F.sum(F.col("nl") * F.col("no")).cast("long").alias("join_rows"),
        F.count(F.lit(1)).cast("long").alias("matched_keys"),
    )


@query(
    "q_xyz_variability",
    oracle="""
WITH md AS (
  SELECT l_partkey AS pk,
         strftime(date_trunc('month', l_shipdate), '%Y-%m') AS month,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem GROUP BY 1, 2
),
mom AS (
  SELECT pk, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(qty) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(CAST(qty AS DOUBLE) * CAST(qty AS DOUBLE), 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM md GROUP BY pk HAVING count(*) >= 3
),
cv AS (
  SELECT pk,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) / (s1 / n) AS cv
  FROM mom
),
cls AS (
  SELECT p.p_brand,
         CASE WHEN c.cv < 0.5 THEN 'X'
              WHEN c.cv < 1.0 THEN 'Y' ELSE 'Z' END AS xyz
  FROM cv c JOIN part p ON p.p_partkey = c.pk
)
SELECT p_brand, xyz, CAST(count(*) AS BIGINT) AS n_parts
FROM cls GROUP BY p_brand, xyz
""",
    tags=("A3", "inventory", "xyz-analysis"),
)
def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ DEMAND-VARIABILITY CLASSIFICATION — the companion axis to
    q_pareto_abc (ABC ranks by value; XYZ ranks by predictability):
    per part, the coefficient of variation of observed monthly demand
    (≥3 active months), classed X (steady, cv<0.5) / Y (variable) /
    Z (erratic, cv≥1), rolled up to parts-per-class per brand — the
    planning matrix an inventory or capacity forecast keys on.

    Parity: monthly quantities fold as exact DECIMALs; squares round
    to 4 dp into a DECIMAL(38,4) fold, and the variance/CV identity
    runs as one shared double chain (the q_neyman_allocation recipe).
    Scale shape: two input-sized keyed aggregates (part×month, then
    part), a broadcastable part-dim join, and a brand×3 output
    groupBy — no windows, nothing quadratic."""
    li = load_table(spark, sf_dir, "lineitem")
    md = li.groupBy(
        F.col("l_partkey").alias("pk"),
        F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM").alias(
            "month"
        ),
    ).agg(F.sum(dec(F.col("l_quantity"))).alias("qty"))
    mom = (
        md.groupBy("pk")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("qty").cast("double").alias("s1"),
            F.sum(
                F.round(
                    F.col("qty").cast("double") * F.col("qty").cast("double"), 4
                ).cast("decimal(38,4)")
            )
            .cast("double")
            .alias("s2"),
        )
        .filter(F.col("n") >= 3)
    )
    cv = mom.select(
        "pk",
        (
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
                / (F.col("n") - 1)
            )
            / (F.col("s1") / F.col("n"))
        ).alias("cv"),
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), "p_brand"
    )
    cls = cv.join(p, "pk").select(
        "p_brand",
        F.when(F.col("cv") < 0.5, "X")
        .when(F.col("cv") < 1.0, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return cls.groupBy("p_brand", "xyz").agg(
        F.count(F.lit(1)).alias("n_parts")
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_matrix_oracle() -> str:
    cells = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            cells.append(f"""
  SELECT '{a}' AS col_a, '{b}' AS col_b,
         round((s.n * s.p_{a}_{b} - s.s_{a} * s.s_{b})
               / (sqrt(s.n * s.q_{a} - s.s_{a} * s.s_{a})
                  * sqrt(s.n * s.q_{b} - s.s_{b} * s.s_{b})), 9) AS pearson_r
  FROM s""")
    sums = ["CAST(count(*) AS DOUBLE) AS n"]
    for a in _CORR_COLS:
        sums.append(
            f"CAST(sum(CAST({a} AS DECIMAL(18,2))) AS DOUBLE) AS s_{a}"
        )
        sums.append(
            f"CAST(sum(CAST(round({a} * {a}, 4) AS DECIMAL(38,4))) AS DOUBLE)"
            f" AS q_{a}"
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            sums.append(
                f"CAST(sum(CAST(round({a} * {b}, 4) AS DECIMAL(38,4))) "
                f"AS DOUBLE) AS p_{a}_{b}"
            )
    return (
        "WITH s AS (SELECT " + ", ".join(sums) + " FROM lineitem)"
        + " SELECT * FROM (" + " UNION ALL ".join(cells) + ") t"
    )


@query(
    "q_corr_matrix",
    oracle=_corr_matrix_oracle(),
    tags=("A3", "statistics", "correlation-matrix"),
)
def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-PASS PEARSON CORRELATION MATRIX over four lineitem
    measures — the feature-drift screen a training pipeline runs per
    snapshot: all C(4,2)=6 pairwise correlations computed from a
    SINGLE scan that folds every moment (n, Σx, Σx², Σxy) in one
    aggregate, then expands the 1-row moment vector into the matrix
    cells. The alternative — six corr() calls — costs six scans.

    Parity: every moment folds as an exact DECIMAL (products rounded
    to 4 dp first — identical doubles in both engines), and the
    Pearson identity runs as one shared double chain rounded to 9 dp.
    Scale shape: ONE input-sized aggregate with map-side combine; the
    matrix expansion is 6 rows from a broadcast scalar — the
    q_column_profile single-scan discipline applied to second
    moments."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a in _CORR_COLS:
        aggs.append(F.sum(F.col(a).cast("decimal(18,2)")).cast("double").alias(f"s_{a}"))
        aggs.append(
            F.sum(F.round(F.col(a) * F.col(a), 4).cast("decimal(38,4)"))
            .cast("double")
            .alias(f"q_{a}")
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            aggs.append(
                F.sum(F.round(F.col(a) * F.col(b), 4).cast("decimal(38,4)"))
                .cast("double")
                .alias(f"p_{a}_{b}")
            )
    s = li.agg(*aggs)
    cells = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1:]:
            cells.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(
                        (
                            F.col("n") * F.col(f"p_{a}_{b}")
                            - F.col(f"s_{a}") * F.col(f"s_{b}")
                        )
                        / (
                            F.sqrt(
                                F.col("n") * F.col(f"q_{a}")
                                - F.col(f"s_{a}") * F.col(f"s_{a}")
                            )
                            * F.sqrt(
                                F.col("n") * F.col(f"q_{b}")
                                - F.col(f"s_{b}") * F.col(f"s_{b}")
                            )
                        ),
                        9,
                    ).alias("pearson_r"),
                )
            )
    # explode the 1-row moment vector into matrix cells — ONE lineage,
    # one physical scan (a union of per-cell selects would re-derive
    # the aggregate six times)
    return s.select(F.explode(F.array(*cells)).alias("c")).select("c.*")


@query(
    "q_t_closeness",
    oracle="""
WITH qi AS (
  SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         c_mktsegment
  FROM customer
),
gdist AS (
  SELECT c_mktsegment,
         CAST(count(*) AS DOUBLE)
           / (SELECT count(*) FROM qi) AS p_glob
  FROM qi GROUP BY c_mktsegment
),
grp AS (
  SELECT c_nationkey, bal_band, c_mktsegment, count(*) AS n
  FROM qi GROUP BY c_nationkey, bal_band, c_mktsegment
),
gsz AS (
  SELECT c_nationkey, bal_band, CAST(sum(n) AS BIGINT) AS grp_size
  FROM grp GROUP BY c_nationkey, bal_band
),
tv AS (
  SELECT s.c_nationkey, s.bal_band, s.grp_size,
         round(0.5 * CAST(sum(CAST(round(
             abs(CAST(COALESCE(g.n, 0) AS DOUBLE) / s.grp_size - gl.p_glob),
             9) AS DECIMAL(28,9))) AS DOUBLE), 6) AS tv_dist
  FROM gsz s
  CROSS JOIN gdist gl
  LEFT JOIN grp g ON g.c_nationkey = s.c_nationkey
                 AND g.bal_band = s.bal_band
                 AND g.c_mktsegment = gl.c_mktsegment
  GROUP BY s.c_nationkey, s.bal_band, s.grp_size
),
ts AS (SELECT CAST(unnest([0.2, 0.3, 0.5]) AS DOUBLE) AS t)
SELECT t.t,
       CAST(count(CASE WHEN v.tv_dist > t.t THEN 1 END) AS BIGINT)
         AS groups_above_t,
       CAST(COALESCE(sum(CASE WHEN v.tv_dist > t.t THEN v.grp_size END), 0)
            AS BIGINT) AS customers_exposed,
       round(max(v.tv_dist), 6) AS t_closeness_level,
       CAST(count(*) AS BIGINT) AS n_groups
FROM ts t CROSS JOIN tv v
GROUP BY t.t
""",
    tags=("A3", "privacy", "t-closeness"),
)
def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T-CLOSENESS AUDIT (Li, Li & Venkatasubramanian 2007 —
    completing the k/l/t privacy triptych next to q_k_anonymity_audit
    and q_l_diversity): l-diversity still leaks when a group's
    sensitive-value DISTRIBUTION skews far from the population (a
    group with 99% one segment passes l=2 yet tells an attacker
    plenty). Per QI group (nation, $1000 balance band), the total-
    variation distance between its market-segment distribution and
    the global one; report, for t in {0.2, 0.3, 0.5}, groups above t
    and the individuals they expose, plus the dataset's actual
    t-closeness level (the max distance).

    Parity: per-segment absolute deviations round to 9 dp and fold as
    DECIMAL (order-independent across the 5-segment sum); group and
    global fractions are single shared double divides. Scale shape:
    one QI×sensitive groupBy, a 5-row broadcast global distribution,
    a group-keyed fold, then the 3-row threshold cross join — the
    same bounded two-aggregate audit shape as its k/l siblings."""
    c = load_table(spark, sf_dir, "customer")
    qi = c.select(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
        "c_mktsegment",
    )
    # global distribution WITHOUT a driver-side count: segment counts
    # cross-joined with the broadcast 1-row total (the declared-query
    # no-collect policy, enforced by test_no_driver_collects_...)
    seg_cnt = qi.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("seg_n"))
    tot = qi.agg(F.count(F.lit(1)).cast("double").alias("n_tot"))
    glob = seg_cnt.crossJoin(F.broadcast(tot)).select(
        "c_mktsegment",
        (F.col("seg_n").cast("double") / F.col("n_tot")).alias("p_glob"),
    )
    grp = qi.groupBy("c_nationkey", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    gsz = grp.groupBy("c_nationkey", "bal_band").agg(
        F.sum("n").cast("long").alias("grp_size")
    )
    tv = (
        gsz.crossJoin(F.broadcast(glob))
        .join(grp, ["c_nationkey", "bal_band", "c_mktsegment"], "left")
        .select(
            "c_nationkey",
            "bal_band",
            "grp_size",
            F.round(
                F.abs(
                    F.coalesce(F.col("n"), F.lit(0)).cast("double")
                    / F.col("grp_size")
                    - F.col("p_glob")
                ),
                9,
            )
            .cast("decimal(28,9)")
            .alias("dev"),
        )
        .groupBy("c_nationkey", "bal_band", "grp_size")
        .agg(
            F.round(F.lit(0.5) * F.sum("dev").cast("double"), 6).alias("tv_dist")
        )
    )
    ts = spark.createDataFrame([(0.2,), (0.3,), (0.5,)], "t double")
    return (
        F.broadcast(ts)
        .crossJoin(tv)
        .groupBy("t")
        .agg(
            F.count(F.when(F.col("tv_dist") > F.col("t"), 1)).alias(
                "groups_above_t"
            ),
            F.coalesce(
                F.sum(F.when(F.col("tv_dist") > F.col("t"), F.col("grp_size"))),
                F.lit(0),
            )
            .cast("long")
            .alias("customers_exposed"),
            F.round(F.max("tv_dist"), 6).alias("t_closeness_level"),
            F.count(F.lit(1)).alias("n_groups"),
        )
        .select(
            "t", "groups_above_t", "customers_exposed",
            "t_closeness_level", "n_groups",
        )
    )


@query(
    "q_itemcf_topk",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
item AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY pk),
pair AS (
  SELECT a.pk AS pk_a, b.pk AS pk_b, CAST(count(*) AS BIGINT) AS c_ab
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
  HAVING count(*) >= 3
),
scored AS (
  SELECT p.pk_a, p.pk_b, p.c_ab,
         round(CAST(p.c_ab AS DOUBLE)
               / (sqrt(CAST(ia.c AS DOUBLE)) * sqrt(CAST(ib.c AS DOUBLE))),
               6) AS cosine
  FROM pair p
  JOIN item ia ON ia.pk = p.pk_a JOIN item ib ON ib.pk = p.pk_b
),
sym AS (
  SELECT pk_a AS item, pk_b AS neighbor, c_ab, cosine FROM scored
  UNION ALL
  SELECT pk_b AS item, pk_a AS neighbor, c_ab, cosine FROM scored
),
r AS (
  SELECT item, neighbor, c_ab, cosine,
         row_number() OVER (PARTITION BY item
                            ORDER BY cosine DESC, neighbor) AS rn
  FROM sym
)
SELECT item, neighbor, c_ab, cosine, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3
ORDER BY item, rn
""",
    tags=("analytics", "recommender", "item-cf"),
)
def q_itemcf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITEM-ITEM COLLABORATIVE FILTERING — cosine similarity on the
    order co-occurrence matrix (c_ab / √(c_a·c_b)), top-3 neighbors
    per item: the classic Amazon-style "bought together" recommender
    next to q_basket_affinity's lift view. The pair space is the
    order-blocked self-join (basket-size-bounded); item counts ride
    broadcasts; the per-item top-k is a WindowGroupLimit-bounded rank
    over the min-support-filtered pair table, never the catalog²."""
    from pyspark.sql import Window as W

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    item = li.groupBy("pk").agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = li.select("ok", F.col("pk").alias("pk_a"))
    b = li.select("ok", F.col("pk").alias("pk_b"))
    pair = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = item.select(F.col("pk").alias("pk_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("pk").alias("pk_b"), F.col("c").alias("c_b"))
    scored = (
        pair.join(F.broadcast(ia), "pk_a")
        .join(F.broadcast(ib), "pk_b")
        .select(
            "pk_a",
            "pk_b",
            "c_ab",
            F.round(
                F.col("c_ab").cast("double")
                / (
                    F.sqrt(F.col("c_a").cast("double"))
                    * F.sqrt(F.col("c_b").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )
    sym = scored.select(
        F.col("pk_a").alias("item"),
        F.col("pk_b").alias("neighbor"),
        "c_ab",
        "cosine",
    ).unionByName(
        scored.select(
            F.col("pk_b").alias("item"),
            F.col("pk_a").alias("neighbor"),
            "c_ab",
            "cosine",
        )
    )
    w = W.partitionBy("item").orderBy(F.col("cosine").desc(), "neighbor")
    return (
        sym.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .orderBy("item", "rn")
    )
