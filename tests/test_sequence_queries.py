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


# ---------------------------------------------------------------------------
# Round-10 additions: Nelson-Aalen, Shapley, Markov removal effect
# ---------------------------------------------------------------------------


def test_nelson_aalen_vs_km_and_reference(spark):
    """q_nelson_aalen == independently-written Python NA estimator on
    the raw durations, and exp(-H) dominates the KM product-limit
    pointwise (1-h <= e^-h), with equality only at h=0 weeks."""
    import duckdb

    na = {
        r["wk"]: r for r in SPECS["q_nelson_aalen"].fn(spark, SF001).collect()
    }
    km = {r["wk"]: r for r in SPECS["q_survival_km"].fn(spark, SF001).collect()}
    assert set(na) == set(km)
    for wk, r in na.items():
        assert r["n_risk"] == km[wk]["n_risk"]
        assert r["d_events"] == km[wk]["d_events"]
        assert r["s_fleming"] >= km[wk]["survival"] - 1e-9, wk

    # independent reference: durations straight from parquet
    rows = duckdb.connect().execute(
        f"""
        WITH r AS (
          SELECT o_custkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey) rn
          FROM '{SF001}/orders.parquet')
        SELECT f.o_orderdate, s.o_orderdate,
               (SELECT max(o_orderdate) FROM '{SF001}/orders.parquet')
        FROM (SELECT * FROM r WHERE rn=1) f
        LEFT JOIN (SELECT * FROM r WHERE rn=2) s USING (o_custkey)
        """
    ).fetchall()
    durs = []
    for d1, d2, h in rows:
        end = d2 if d2 is not None else h
        durs.append((min((end - d1).days // 7, 52), d2 is not None))
    import math
    from collections import Counter

    n_tot = Counter(w for w, _ in durs)
    d_ev = Counter(w for w, ev in durs if ev)
    h_cum = 0.0
    for wk in sorted(n_tot):
        n_risk = sum(c for w, c in n_tot.items() if w >= wk)
        h_cum += round(d_ev.get(wk, 0) / n_risk, 12)
        assert na[wk]["n_risk"] == n_risk, wk
        assert abs(na[wk]["cum_hazard"] - h_cum) < 1e-6, wk
        assert abs(na[wk]["s_fleming"] - math.exp(-h_cum)) < 1e-6, wk


def test_shapley_matches_bruteforce_reference(spark):
    """q_attribution_shapley == brute-force permutation-averaged
    Shapley (the O(n!) definition, not the subset-lattice form the
    query uses) computed pure-Python from the raw events — plus the
    efficiency axiom sum(phi) == v(full coalition)."""
    import itertools

    import duckdb

    out = {
        r["channel"]: r["shapley_value"]
        for r in SPECS["q_attribution_shapley"].fn(spark, SF001).collect()
    }
    rows = duckdb.connect().execute(
        f"SELECT user_id, event_type FROM '{SF001}/events.parquet'"
    ).fetchall()
    exposure: dict = {}
    converted: set = set()
    for uid, et in rows:
        if et == "purchase":
            converted.add(uid)
        else:
            exposure.setdefault(uid, set()).add(et)
    channels = sorted({c for s in exposure.values() for c in s})
    # coalition worth: conversion rate of users exposed to EXACTLY S
    from collections import Counter

    n_users: Counter = Counter()
    n_conv: Counter = Counter()
    for uid, s in exposure.items():
        key = frozenset(s)
        n_users[key] += 1
        n_conv[key] += uid in converted

    def v(s: frozenset) -> float:
        if s not in n_users:
            return 0.0
        return round(n_conv[s] / n_users[s], 12)

    n = len(channels)
    phi = dict.fromkeys(channels, 0.0)
    for perm in itertools.permutations(channels):
        cur: frozenset = frozenset()
        for c in perm:
            nxt = cur | {c}
            phi[c] += v(nxt) - v(cur)
            cur = nxt
    import math

    fact = math.factorial(n)
    for c in channels:
        assert abs(out[c] - phi[c] / fact) < 1e-6, (c, out[c], phi[c] / fact)
    # efficiency: credits add up to the grand-coalition worth
    assert abs(sum(out.values()) - v(frozenset(channels))) < 1e-5


def test_markov_removal_reference_and_invariants(spark):
    """q_attribution_markov vs an independent pandas-built edge list +
    numpy EXACT absorption solve (I - Q)^-1 R: the declared 64-step
    statistic must sit within 5e-7 of the true fixed point, removal
    can never increase conversion, and credits are efficiency-
    normalized."""
    import numpy as np
    import pandas as pd

    res = {
        r["channel"]: r
        for r in SPECS["q_attribution_markov"].fn(spark, SF001).collect()
    }
    ev = pd.read_parquet(f"{SF001}/events.parquet")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"])

    edges: list = []
    for _, g in ev.groupby("user_id", sort=False):
        types = list(g["event_type"])
        if "purchase" in types:
            cut = types.index("purchase")
            path, term = types[:cut], "conv"
        else:
            path, term = types, "drop"
        states = ["start"] + path + [term]
        edges += list(zip(states, states[1:]))
    df = pd.DataFrame(edges, columns=["a", "b"])
    counts = df.value_counts().reset_index(name="c")

    def absorb(excl: str | None) -> float:
        sub = counts[counts["a"] != excl].copy()
        if excl is not None:
            sub.loc[sub["b"] == excl, "b"] = "drop"
        sub = sub.groupby(["a", "b"], as_index=False)["c"].sum()
        tot = sub.groupby("a")["c"].sum()
        trans = sorted(set(sub["a"]) - {"conv", "drop"})
        idx = {s: i for i, s in enumerate(trans)}
        q = np.zeros((len(trans), len(trans)))
        r = np.zeros(len(trans))
        for _, row in sub.iterrows():
            p = row["c"] / tot[row["a"]]
            if row["b"] in idx:
                q[idx[row["a"]], idx[row["b"]]] = p
            elif row["b"] == "conv":
                r[idx[row["a"]]] = p
        sol = np.linalg.solve(np.eye(len(trans)) - q, r)
        return float(sol[idx["start"]])

    p_full = absorb(None)
    effs = {}
    for c, row in res.items():
        p_rm = absorb(c)
        assert abs(row["p_conv_full"] - p_full) < 5e-7, (c, row, p_full)
        assert abs(row["p_conv_removed"] - p_rm) < 5e-7, (c, row, p_rm)
        assert row["p_conv_removed"] <= row["p_conv_full"] + 1e-9, c
        effs[c] = max(0.0, 1.0 - p_rm / p_full)
    tot_eff = sum(effs.values())
    for c, row in res.items():
        assert abs(row["credit_share"] - effs[c] / tot_eff) < 1e-5, c


def test_entropy_rate_python_reference_and_bounds(spark):
    """q_markov_entropy_rate == python H = -sum pi_s P st log2 P st
    from the declared transition/stationary queries, bounded by
    log2(|states|); perplexity == 2^H."""
    import math

    row = SPECS["q_markov_entropy_rate"].fn(spark, SF001).collect()[0]
    pi = {
        r["state"]: r["pi"]
        for r in SPECS["q_markov_stationary"].fn(spark, SF001).collect()
    }
    t = SPECS["q_markov_transitions"].fn(spark, SF001).collect()
    row_tot: dict = {}
    for r in t:
        row_tot[r["from_type"]] = row_tot.get(r["from_type"], 0) + r["c"]
    h = 0.0
    for r in t:
        p = r["c"] / row_tot[r["from_type"]]
        h += pi[r["from_type"]] * (-p * math.log2(p))
    assert abs(row["entropy_rate_bits"] - h) < 1e-6, (row, h)
    assert 0 < row["entropy_rate_bits"] <= math.log2(len(pi)) + 1e-9
    assert abs(row["perplexity"] - 2 ** row["entropy_rate_bits"]) < 1e-4


def test_km_ci_greenwood_reference(spark):
    """q_survival_km_ci: survival equals q_survival_km exactly; the
    Greenwood SE matches a python recompute; bands bracket the curve
    and stay in [0, 1]."""
    import math

    km = {r["wk"]: r for r in SPECS["q_survival_km"].fn(spark, SF001).collect()}
    ci = {r["wk"]: r for r in SPECS["q_survival_km_ci"].fn(spark, SF001).collect()}
    assert set(km) == set(ci)
    gsum = 0.0
    for wk in sorted(ci):
        r = ci[wk]
        assert abs(r["survival"] - km[wk]["survival"]) < 1e-9, wk
        d, n = r["d_events"], r["n_risk"]
        if n > d:
            gsum += round(d / (n * (n - d)), 12)
        se = r["survival"] * math.sqrt(gsum)
        assert abs(r["se_greenwood"] - se) < 1e-6, wk
        assert 0.0 <= r["ci_lo"] <= r["survival"] <= r["ci_hi"] <= 1.0, wk


def test_cohort_ltv_monotone_and_reference(spark):
    """q_cohort_ltv_curve: per-cohort LTV is non-decreasing in age
    (cumulative revenue can only grow), and a pandas recompute
    matches exactly at the first cohort."""
    import pandas as pd

    rows = SPECS["q_cohort_ltv_curve"].fn(spark, SF001).collect()
    assert rows
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], []).append(r)
    for _cohort, rs in by_cohort.items():
        rs = sorted(rs, key=lambda r: r["age"])
        for a, b in zip(rs, rs[1:]):
            assert b["ltv_per_cust"] >= a["ltv_per_cust"] - 1e-9, (a, b)
            assert b["n_cust"] == a["n_cust"]

    o = pd.read_parquet(f"{SF001}/orders.parquet")
    mo = o["o_orderdate"].values.astype("datetime64[M]")
    o = o.assign(mo=mo)
    first = o.groupby("o_custkey")["mo"].min().rename("cohort")
    j = o.merge(first, on="o_custkey")
    j["age"] = (j["mo"].values.astype("datetime64[M]")
                - j["cohort"].values.astype("datetime64[M]")).astype(int)
    c0 = min(by_cohort)
    sub = j[(j["cohort"].values.astype("datetime64[M]")
             == pd.Timestamp(c0).to_datetime64().astype("datetime64[M]"))]
    n0 = first[first == pd.Timestamp(c0)].count()
    want = round(
        sub[sub["age"] <= 11]["o_totalprice"].round(2).sum() / n0, 2
    )
    last = max(by_cohort[c0], key=lambda r: r["age"])
    assert last["n_cust"] == n0
    assert abs(last["ltv_per_cust"] - want) < 0.05, (last, want)
