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


def _edges_py():
    """Undirected part co-occurrence edge set at sf0.001, as Python
    adjacency (independent of the Spark plan under test)."""
    import collections
    import duckdb

    pairs = duckdb.connect().execute(
        f"""SELECT DISTINCT a.l_partkey, b.l_partkey
            FROM '{SF0001}/lineitem.parquet' a
            JOIN '{SF0001}/lineitem.parquet' b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey <> b.l_partkey"""
    ).fetchall()
    adj = collections.defaultdict(set)
    for s, d in pairs:
        adj[s].add(d)
    return adj


def test_label_propagation_matches_python_reference(spark):
    """q_label_propagation == an independently-written synchronous
    LPA (most-frequent neighbor label, min tie-break, 3 rounds) —
    guards the argmax two-aggregation encoding against a shared
    Spark/oracle algebra bug (the q_spearman_corr lesson)."""
    import collections

    adj = _edges_py()
    lbl = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, nbrs in adj.items():
            cnt = collections.Counter(lbl[u] for u in nbrs)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lbl = new
    sizes = collections.Counter(lbl.values())
    want = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    rows = sorted(
        SPECS["q_label_propagation"].fn(spark, SF0001).collect(),
        key=lambda r: r["rn"],
    )
    got = [(r["community"], r["n_members"]) for r in rows]
    assert got == want, (got, want)


def test_kcore_peel_matches_python_and_converges(spark):
    """q_kcore_peel rounds == an independently-written peel; the
    convergence probe row must equal round 4's survivor count (the
    fixture converges inside the unroll budget, making the docstring
    claim checkable)."""
    adj = _edges_py()
    alive = set(adj)
    per_round = []
    for _ in range(4):
        deg = {
            v: sum(1 for u in adj[v] if u in alive) for v in alive
        }
        alive = {v for v in alive if deg[v] >= 3}
        n_edges = (
            sum(
                1
                for v in alive
                for u in adj[v]
                if u in alive
            )
            // 2
        )
        per_round.append((len(alive), n_edges))
    rows = sorted(
        SPECS["q_kcore_peel"].fn(spark, SF0001).collect(),
        key=lambda r: r["round"],
    )
    got = [(r["nodes_alive"], r["edges_alive"]) for r in rows[:4]]
    assert got == per_round, (got, per_round)
    assert rows[4]["edges_alive"] == -1
    assert rows[4]["nodes_alive"] == rows[3]["nodes_alive"], rows
