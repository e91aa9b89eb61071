"""Plan-shape pins for the r10f/g stats family + the r11 quantile-
regression rewrite (VERDICT r10 #7): each test pins the ONE property
the docstring's 100 TB claim rests on, the same mechanical style as
tests/test_r10e_plan_pins.py."""

from __future__ import annotations

import re

from cdc_via_flink_spark.plans.registry import load_all

SPECS = load_all()
SF001 = "/root/testdata/sf0.01"


def _plan(spark, name, mode="simple"):
    df = SPECS[name].fn(spark, SF001)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _single_partition_children(plan: str) -> list[str]:
    """The plan-tree line directly below each `Exchange SinglePartition`
    — i.e. WHAT is being funneled to one partition."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln and i + 1 < len(lines):
            out.append(lines[i + 1])
    return out


def test_quantile_regression_single_shuffle_histogram(spark):
    """q_quantile_regression (r11 rewrite): the slope grid is a
    LITERAL explode (no BroadcastNestedLoopJoin — measured 4x
    slower), the two-level histogram leaves exactly ONE data shuffle
    (hashpartitioning by slope, shared by the in-bucket window and
    the pinball aggregate), and the 21-row argmin rides
    TakeOrderedAndProject."""
    plan = _plan(spark, "q_quantile_regression")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Generate explode" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "TakeOrderedAndProject(limit=1" in plan, plan


def test_attribution_shapley_lattice_broadcast(spark):
    """q_attribution_shapley: the 2^n coalition lattice joins the
    per-mask conversion stats via BROADCAST hash joins on mask (the
    lattice is model-sized); nothing sort-merges, and every
    single-partition funnel consumes the distinct channel list or a
    1-row grand aggregate — never user-grain data."""
    plan = _plan(spark, "q_attribution_shapley")
    assert "SortMergeJoin" not in plan, plan
    assert re.search(r"BroadcastHashJoin \[mask", plan), plan
    kids = _single_partition_children(plan)
    ok = ("HashAggregate(keys=[channel", "HashAggregate(keys=[]")
    assert kids and all(any(p in k for p in ok) for k in kids), kids


def test_survival_km_week_grain_windows(spark):
    """q_survival_km: the unpartitioned KM windows consume the
    WEEK-GRAIN aggregate (<= 53 rows), never raw orders — the
    single-partition exchange sits directly above keys=[wk]; the
    per-customer first-purchase rides WindowGroupLimit."""
    plan = _plan(spark, "q_survival_km")
    kids = _single_partition_children(plan)
    ok = ("HashAggregate(keys=[wk", "HashAggregate(keys=[]")
    assert kids and all(any(p in k for p in ok) for k in kids), kids
    assert any("HashAggregate(keys=[wk" in k for k in kids), kids
    assert "WindowGroupLimit" in plan, plan
    assert "windowspecdefinition(o_custkey" in plan, plan


def test_nelson_aalen_week_grain_windows(spark):
    """q_nelson_aalen: same keyed-window discipline — every
    single-partition funnel consumes the week-grain aggregate."""
    plan = _plan(spark, "q_nelson_aalen")
    kids = _single_partition_children(plan)
    ok = ("HashAggregate(keys=[wk", "HashAggregate(keys=[]")
    assert kids and all(any(p in k for p in ok) for k in kids), kids
    assert any("HashAggregate(keys=[wk" in k for k in kids), kids
    assert "WindowGroupLimit" in plan, plan


def test_survival_logrank_one_week_aggregate(spark):
    """q_survival_logrank: BOTH segments' event/at-risk counts fold in
    ONE wk-keyed aggregate pass (CASE WHEN seg inside the functions),
    so the Greenwood-style windows again ride the week grid."""
    plan = _plan(spark, "q_survival_logrank")
    kids = _single_partition_children(plan)
    ok = ("HashAggregate(keys=[wk", "HashAggregate(keys=[]")
    assert kids and all(any(p in k for p in ok) for k in kids), kids
    assert any("HashAggregate(keys=[wk" in k for k in kids), kids
    # one partial+final pair over wk, with the segment contrast inside
    assert plan.count("HashAggregate(keys=[wk") == 2, plan
    assert "CASE WHEN (seg" in plan, plan


def test_gmm_em_grand_aggregates_and_param_broadcast(spark):
    """q_gmm_em_1d: every E/M step is a grand aggregate (each
    single-partition exchange sits above a keys=[] PARTIAL aggregate
    — map-side combine, 1 row per task) and the fitted parameters
    flow back as an Identity broadcast, never a shuffle join."""
    plan = _plan(spark, "q_gmm_em_1d")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange IdentityBroadcastMode" in plan, plan
    kids = _single_partition_children(plan)
    assert kids and all("HashAggregate(keys=[]" in k for k in kids), kids


def test_kcore_peel_edges_materialized_once(spark):
    """q_kcore_peel: the peeling rounds consume the ONCE-materialized
    edge snapshot (Scan ExistingRDD) — zero parquet re-scans in the
    final plan (the r10f fix: iterate on the node-sized alive set,
    not on a re-filtered edge list)."""
    plan = _plan(spark, "q_kcore_peel")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FileScan parquet") == 0, plan
    assert "Scan ExistingRDD" in plan, plan


def test_mmr_rerank_pool_snapshot(spark):
    """sim_mmr_rerank: the greedy selection plan is built entirely on
    the snapshotted 100-row candidate pool — no corpus FileScan, no
    join of any kind survives into the final plan (the r10f fix that
    took 13.5 s -> 2.4 s)."""
    plan = _plan(spark, "sim_mmr_rerank")
    assert plan.count("FileScan parquet") == 0, plan
    assert "Join" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan
