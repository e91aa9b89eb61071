"""Invariants for the round-4 batch additions: gap-fill interpolation
(q_gapfill_interpolate) and unrolled PageRank (q_pagerank3). The SQL
oracles pin exact values; these tests pin the MATHEMATICAL properties
the oracles can't express as equality checks."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.registry import load_all

from .conftest import SF0001

SPECS = load_all()


def test_gapfill_grid_dense_and_interpolation_bounded(spark):
    rows = SPECS["q_gapfill_interpolate"].fn(spark, SF0001).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        days = [datetime.date.fromisoformat(r["day"]) for r in rs]
        # dense daily grid, endpoints observed
        assert all(
            (b - a).days == 1 for a, b in zip(days, days[1:])
        ), f"user {user} grid has holes"
        assert not rs[0]["is_gap"] and not rs[-1]["is_gap"]
        # n_obs and is_gap agree
        assert all((r["n_obs"] == 0) == r["is_gap"] for r in rs)
        # every gap value lies between its nearest observed neighbors
        for i, r in enumerate(rs):
            if not r["is_gap"]:
                continue
            prev = next(rs[j] for j in range(i - 1, -1, -1) if not rs[j]["is_gap"])
            nxt = next(rs[j] for j in range(i + 1, len(rs)) if not rs[j]["is_gap"])
            lo = min(prev["value_filled"], nxt["value_filled"]) - 1e-6
            hi = max(prev["value_filled"], nxt["value_filled"]) + 1e-6
            assert lo <= r["value_filled"] <= hi, (user, r)


def test_pagerank_mass_conserved_and_ordered(spark):
    # Recompute the full rank vector (the declared query truncates to
    # top-50): with a symmetric edge set there are no dangling nodes,
    # so total rank mass stays 1 through every damped iteration.
    from cdc_via_flink_spark.plans import graph_queries as G

    df = SPECS["q_pagerank3"].fn(spark, SF0001)
    rows = df.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))
    ranks = [r["rank"] for r in rows]
    assert all(a >= b for a, b in zip(ranks, ranks[1:]))
    assert all(r > 0 for r in ranks)

    # mass conservation on the untruncated vector
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet").select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    e1 = li.select("ok", F.col("pk").alias("src"))
    e2 = li.select("ok", F.col("pk").alias("dst"))
    edges = (
        e1.join(e2, "ok").filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    nodes = deg.select(F.col("src").alias("node"), "deg")
    r = nodes.withColumn("r", F.lit(1.0) / F.lit(n))
    for _ in range(G.N_ITER):
        contrib = (
            r.join(edges, r.node == edges.src)
            .select("dst", F.round(F.col("r") / F.col("deg"), 12).cast(G.DEC).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("sc"))
        )
        r = nodes.join(contrib, nodes.node == contrib.dst, "left").select(
            "node",
            "deg",
            (
                F.lit(0.15) / F.lit(n)
                + F.lit(G.DAMP) * F.coalesce(F.col("sc"), F.lit(0).cast(G.DEC)).cast("double")
            ).alias("r"),
        )
    total = r.agg(F.sum("r")).collect()[0][0]
    assert abs(total - 1.0) < 1e-6
