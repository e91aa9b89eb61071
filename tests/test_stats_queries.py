"""Plan-shape + constructed-example pins for plans/stats_queries.py.

Value correctness is the driver oracle's job (CORRECTNESS_FULL); these
tests pin the SCALE-CRITICAL plan properties that an oracle match
cannot see — where the single-partition exchanges are allowed to be,
that the bootstrap fan-out partial-aggregates map-side, and that the
hash-lattice weights reproduce Poisson(1) frequencies.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.registry import load_all

SPECS = load_all()
SF001 = "/root/testdata/sf0.01"


def _plan(spark, name, mode="simple"):
    df = SPECS[name].fn(spark, SF001)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_ks_two_level_prefix_sum(spark):
    """q_ks_two_sample: the cumulative CDF must be the two-level form —
    exactly two windows, and the one that sees per-VALUE rows is
    partitioned by bkt (parallel); the unpartitioned window runs only
    over the ~61 bucket totals. The final-scalar and 1-row-total
    aggregates are the only other SinglePartition exchanges (they
    consume partial-agg rows, one per task)."""
    plan = _plan(spark, "q_ks_two_sample")
    assert plan.count("Window [") == 2, plan
    # the local running-count window is keyed by bkt
    assert "windowspecdefinition(bkt" in plan, plan
    # the unpartitioned window consumes the per-bucket aggregate, and
    # the cross joins are 1-row broadcasts, never a pair blow-up
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_psi_single_input_aggregate(spark):
    """q_psi_drift: one input-sized aggregation (bucket×window counts);
    the ten-row tail uses broadcast joins, never a shuffle join or a
    window over raw orders."""
    plan = _plan(spark, "q_psi_drift")
    assert "Window" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_mad_windows_are_segment_keyed(spark):
    """q_mad_outliers: both median-selection windows partition by seg —
    no single-partition exchange (no global sort of customers)."""
    plan = _plan(spark, "q_mad_outliers")
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bootstrap_partial_agg(spark):
    """q_poisson_bootstrap_ci: the B-replicate means must come from a
    partial-aggregating hash agg (map-side combine bounds the shuffle
    at B rows per task, not B×n); single-partition exchanges: the
    64-row replicate rank + the 1-row full-mean scalar, nothing
    input-sized; no Python evaluation anywhere."""
    plan = _plan(spark, "q_poisson_bootstrap_ci")
    assert plan.count("Exchange SinglePartition") == 2, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # partial_ aggregate functions before the exchange = map-side combine
    assert "partial_sum" in plan, plan


def test_bootstrap_weights_match_poisson(spark):
    """The hash-lattice weights must reproduce Poisson(1) frequencies:
    over the sf0.01 orders × 64 replicates lattice, the weight
    distribution stays within 1% absolute of (e^-1, e^-1, e^-1/2,
    e^-1/6) — the property that makes the bootstrap statistically
    valid, independent of the oracle (which would match even a broken
    constant weight)."""
    import math

    from cdc_via_flink_spark.plans import stats_queries as S

    o = spark.read.parquet(f"{SF001}/orders.parquet").select("o_orderkey")
    reps = o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(0), F.lit(S._B - 1))).alias("b"),
    )
    u = (
        ((F.col("o_orderkey") % S._M) * S._MULT + F.col("b") * S._BSTEP) % S._M
    ).cast("double") / S._M
    w = reps.select(
        F.when(u < S._P0, 0)
        .when(u < S._P1, 1)
        .when(u < S._P2, 2)
        .when(u < S._P3, 3)
        .otherwise(4)
        .alias("w")
    )
    dist = {r["w"]: r["n"] for r in w.groupBy("w").agg(F.count("*").alias("n")).collect()}
    total = sum(dist.values())
    e1 = math.exp(-1.0)
    expected = {0: e1, 1: e1, 2: e1 / 2, 3: e1 / 6}
    for k, p in expected.items():
        assert abs(dist[k] / total - p) < 0.01, (k, dist[k] / total, p)


def test_acf_month_grid_only_after_first_agg(spark):
    """q_acf_revenue: the lag self-join runs on the month grid — the
    join keys are month indexes, so every join in the plan is
    broadcast (the grid is ~84 rows); no sort-merge join of raw
    orders against raw orders."""
    plan = _plan(spark, "q_acf_revenue")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan


def test_range_search_filter_before_shuffle(spark):
    """sim_range_search: the radius predicate must run in the scoring
    stage (a Filter on the rounded cosine above the broadcast join),
    never after an exchange — output sizes all downstream work — and
    the scoring join is the broadcast nest of corpus x 5 queries."""
    plan = _plan(spark, "sim_range_search")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # radius predicate present as a filter on the computed cosine
    assert ">= 0.2" in plan, plan


def test_range_search_lsh_equijoin_probes(spark):
    """sim_range_search_lsh: candidates come from a bucket EQUI-join
    against the 45-row probe table (9 probes x 5 queries) — a hash
    join, never a cartesian of corpus x probes."""
    plan = _plan(spark, "sim_range_search_lsh")
    assert "BroadcastHashJoin [bucket" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cdc_chunks_lossless_and_jvm_side(spark):
    """dedup_cdc_chunks: (a) chunking is LOSSLESS — per doc, the
    chunks concatenate back to the original text (boundary algebra
    correct at both ends); (b) the plan stays JVM-side (no Python
    eval) and rows multiply only at the chunk grain (exactly one
    Generate, the chunk explode — never a per-position explode)."""
    from cdc_via_flink_spark.plans import dedup_queries as D

    d = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .filter(F.length("text") >= D._CDC_W)
        .limit(50)
    )
    bounds = F.expr(
        f"""array_sort(array_distinct(concat(
          transform(
            filter(sequence({D._CDC_W}, length(text)),
                   p -> {D._cdc_hash_lambda('text', 'p')} = 0),
            p -> CAST(p AS BIGINT)),
          array(CAST(length(text) AS BIGINT)))))"""
    )
    chunk = F.expr(
        """transform(sequence(1, size(bounds)),
             i -> substr(text,
                         CAST(CASE WHEN i = 1 THEN 1
                              ELSE bounds[i - 2] + 1 END AS INT),
                         CAST(bounds[i - 1]
                              - CASE WHEN i = 1 THEN 0
                                     ELSE bounds[i - 2] END AS INT)))"""
    )
    rows = d.select(
        "text", bounds.alias("bounds")
    ).select("text", F.concat_ws("", chunk).alias("rejoined")).collect()
    assert rows
    for r in rows:
        assert r["rejoined"] == r["text"]

    plan = _plan(spark, "dedup_cdc_chunks")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("Generate explode") == 1, plan


def test_permutation_partial_agg(spark):
    """q_permutation_test: replicate statistics come from one
    partial-aggregating groupBy(b) over the exploded lattice (shuffle
    bounded at B rows per task), no Python eval, no SMJ."""
    plan = _plan(spark, "q_permutation_test")
    assert "partial_sum" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_conformal_coverage_guarantee(spark):
    """The conformal property itself: measured test coverage must be
    >= 0.88 (0.9 nominal minus finite-sample slack) — the semantic
    invariant the hash oracle can't distinguish from a copied
    constant."""
    df = SPECS["q_conformal_interval"].fn(spark, SF001)
    row = df.head()
    assert row["coverage"] >= 0.88, row


def test_bloom_rf_prunes_before_join(spark):
    """q_bloom_runtime_filter: the probe (word equi-join + bool_and
    fold) must sit BELOW the fact-dim join — i.e. the dim relation is
    joined only against bloom-passers. Pin: the plan has the bitmap
    bit_or aggregate, and the customer scan appears with the segment
    filter pushed (dim side read once for build + once for the exact
    join; both dim-sized)."""
    plan = _plan(spark, "q_bloom_runtime_filter", "formatted")
    assert "bit_or" in plan, plan
    # bool_and compiles to min(hit) over booleans (Catalyst rewrite)
    assert "min(hit" in plan, plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan or "EqualTo(c_mktsegment,BUILDING)" in plan, plan


def test_bucketed_join_no_exchange(spark):
    """q_bucketed_join: the bucketed layout must delete the join
    shuffle. At sf0.01 the filtered side broadcasts (also
    zero-shuffle) — so first pin the query plan scans as bucketed
    with no hashpartitioning exchange on the keys; then force the
    big-data path (broadcast off) and pin the SortMergeJoin joining
    the two bucketed scans with NO exchange between join and scan."""
    plan = _plan(spark, "q_bucketed_join")
    assert "Bucketed: true" in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan

    from pyspark.sql import functions as F2

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob = spark.table("bkt_orders_sf0_01").filter(
            F2.col("o_totalprice") > 400000
        )
        lb = spark.table("bkt_lineitem_sf0_01")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        jvm = spark._jvm
        plan2 = j._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan2, plan2
    assert "Exchange" not in plan2, plan2  # the layout IS the shuffle


def test_ivm_merge_is_partial_shaped(spark):
    """q_ivm_aggregate: the served view merges PARTIALS — the merged
    aggregate consumes (n, s) columns, not order rows (base side is a
    parquet scan of the persisted partials)."""
    plan = _plan(spark, "q_ivm_aggregate")
    assert "ivm_base_" in plan, plan  # the persisted-partials scan
    assert "CartesianProduct" not in plan, plan


# ---------------------------------------------------------------------------
# Round-10f rank/inference batch
# ---------------------------------------------------------------------------

SF0001 = "/root/testdata/sf0.001"


def test_kruskal_two_level_rank_windows_and_python_reference(spark):
    """q_kruskal_wallis: ranking must be the two-level prefix form
    (the per-value window is bucket-keyed; the unpartitioned window
    sees only bucket totals), and the tie-corrected H must match an
    independently-written pure-Python Kruskal-Wallis on the small
    fixture (guards against both engines sharing one algebra bug)."""
    plan = _plan(spark, "q_kruskal_wallis")
    assert "windowspecdefinition(bkt" in plan, plan
    assert "CartesianProduct" not in plan, plan

    rows = SPECS["q_kruskal_wallis"].fn(spark, SF0001).collect()
    import duckdb

    con = duckdb.connect()
    data = con.execute(
        f"""SELECT c.c_mktsegment, CAST(o_totalprice AS DOUBLE)
            FROM '{SF0001}/orders.parquet' o
            JOIN '{SF0001}/customer.parquet' c ON o.o_custkey = c.c_custkey"""
    ).fetchall()
    vals = sorted(v for _, v in data)
    # tie-averaged ranks
    import collections

    rank = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank[vals[i]] = (i + 1 + j) / 2
        i = j
    by_seg = collections.defaultdict(list)
    for seg, v in data:
        by_seg[seg].append(rank[v])
    n = len(vals)
    h = 12 / (n * (n + 1)) * sum(
        sum(r) ** 2 / len(r) for r in by_seg.values()
    ) - 3 * (n + 1)
    ties = collections.Counter(vals)
    c = 1 - sum(t**3 - t for t in ties.values()) / (n**3 - n)
    got = rows[0]["h_adj"]
    assert abs(got - h / c) < 1e-4, (got, h / c)


def test_spearman_matches_python_reference(spark):
    """q_spearman_corr == pure-Python tie-averaged Spearman on the
    small fixture."""
    row = SPECS["q_spearman_corr"].fn(spark, SF0001).collect()[0]
    import duckdb

    data = duckdb.connect().execute(
        f"""SELECT CAST(l_quantity AS DOUBLE),
                   CAST(l_extendedprice AS DOUBLE)
            FROM '{SF0001}/lineitem.parquet'"""
    ).fetchall()

    def ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r = [0.0] * len(xs)
        i = 0
        while i < len(xs):
            j = i
            while j < len(xs) and xs[order[j]] == xs[order[i]]:
                j += 1
            for t in range(i, j):
                r[order[t]] = (i + 1 + j) / 2
            i = j
        return r

    rx = ranks([a for a, _ in data])
    ry = ranks([b for _, b in data])
    n = len(data)
    mx = sum(rx) / n
    my = sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert abs(row["spearman_rho"] - num / den) < 1e-6


def test_hodges_lehmann_is_pair_median(spark):
    """q_hodges_lehmann == median of the full pairwise-difference set
    recomputed in Python from the same monthly means."""
    row = SPECS["q_hodges_lehmann"].fn(spark, SF0001).collect()[0]
    import duckdb

    m = duckdb.connect().execute(
        f"""SELECT c.c_mktsegment, strftime(o_orderdate, '%Y-%m'),
                   round(sum(CAST(o_totalprice AS DECIMAL(18,2)))::DOUBLE
                         / count(*), 6)
            FROM '{SF0001}/orders.parquet' o
            JOIN '{SF0001}/customer.parquet' c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
            GROUP BY 1, 2"""
    ).fetchall()
    a = [v for s, _, v in m if s == "BUILDING"]
    b = [v for s, _, v in m if s == "MACHINERY"]
    diffs = sorted(round(x - y, 6) for x in a for y in b)
    np = len(diffs)
    lo, hi = diffs[(np + 1) // 2 - 1], diffs[np // 2]
    assert row["n_pairs"] == np
    assert abs(row["hl_shift"] - (lo + hi) / 2) < 1e-6


def test_fdr_bh_integer_decision_and_partial_agg(spark):
    """q_fdr_bh: the rejected set must equal a Python BH step-up on
    the emitted exact rational p-values (the decision is integer
    arithmetic, so equality is exact); the replicate fan-out must be
    ONE partial-aggregating groupBy(b, pg) — no window touches the
    exploded frame."""
    plan = _plan(spark, "q_fdr_bh")
    assert "keys=[b" in plan, plan
    assert "CartesianProduct" not in plan, plan

    rows = SPECS["q_fdr_bh"].fn(spark, SF0001).collect()
    m = len(rows)
    assert m == 25
    assert all(r["p_denominator"] == 65 for r in rows)
    ps = sorted((r["p_numerator"], r["nationkey"]) for r in rows)
    kstar = 0
    for k, (pn, _) in enumerate(ps, 1):
        if pn * m * 10 <= k * 65:  # p <= k*0.1/m in integers
            kstar = k
    expect = {nk for i, (_, nk) in enumerate(ps, 1) if i <= kstar}
    got = {r["nationkey"] for r in rows if r["rejected"] == 1}
    assert got == expect, (got, expect)
    # adjusted p monotone nondecreasing in BH rank
    by_rank = sorted(rows, key=lambda r: r["bh_rank"])
    adj = [r["p_adj"] for r in by_rank]
    assert adj == sorted(adj), adj


def test_isotonic_matches_pava_and_is_monotone(spark):
    """q_isotonic_calibration: iso_rate must be nondecreasing and
    equal an independently-written sequential PAVA on the same bucket
    histogram (minimax closed form == pool-adjacent-violators)."""
    rows = sorted(
        SPECS["q_isotonic_calibration"].fn(spark, SF0001).collect(),
        key=lambda r: r["bucket"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso), iso
    import duckdb

    g = duckdb.connect().execute(
        f"""SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 9) b,
                   count(*) w,
                   sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                            THEN 1 ELSE 0 END) p
            FROM '{SF0001}/orders.parquet' GROUP BY b ORDER BY b"""
    ).fetchall()
    # sequential PAVA with weighted pools
    pools = [[w, float(p)] for _, w, p in g]
    i = 0
    while i < len(pools) - 1:
        if pools[i][1] / pools[i][0] > pools[i + 1][1] / pools[i + 1][0] + 1e-15:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    fitted = []
    for w, p in pools:
        fitted.extend([p / w] * 1)
    # expand pools back to buckets
    expanded = []
    for w, p in pools:
        rate = p / w
        # pool width in buckets = number of original buckets consumed
        expanded.append((w, rate))
    # rebuild per-bucket fitted rates by walking original weights
    per_bucket = []
    wi = iter(expanded)
    cur_w, cur_rate = next(wi)
    for _, w, _ in g:
        per_bucket.append(cur_rate)
        cur_w -= w
        if cur_w == 0:
            nxt = next(wi, None)
            if nxt:
                cur_w, cur_rate = nxt
    assert len(per_bucket) == len(rows)
    for got, want in zip(iso, per_bucket):
        assert abs(got - want) < 1e-6, (iso, per_bucket)


def test_ols_two_feature_matches_numpy(spark):
    """q_ols_two_feature == numpy least squares on the small fixture
    (independent reference for the Cramer encoding)."""
    import duckdb
    import numpy as np

    row = SPECS["q_ols_two_feature"].fn(spark, SF0001).collect()[0]
    data = duckdb.connect().execute(
        f"""WITH f AS (
              SELECT l_orderkey ok, count(*) x1, sum(l_quantity) x2
              FROM '{SF0001}/lineitem.parquet' GROUP BY ok)
            SELECT f.x1, f.x2, CAST(o.o_totalprice AS DOUBLE)
            FROM f JOIN '{SF0001}/orders.parquet' o ON o.o_orderkey = f.ok"""
    ).fetchall()
    X = np.array([[1.0, float(x1), float(x2)] for x1, x2, _ in data])
    y = np.array([v for _, _, v in data])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert abs(row["beta0"] - beta[0]) < 1e-3, (row, beta)
    assert abs(row["beta1"] - beta[1]) < 1e-4
    assert abs(row["beta2"] - beta[2]) < 1e-5
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(row["r2"] - (1 - ss_res / ss_tot)) < 1e-4


def test_info_gain_single_explode_and_nonnegative(spark):
    """q_gini_split_gain: the features fan out as an explode into a
    (f, v)-keyed aggregate (the tot/hy branches re-reference the same
    aggregate subtree — identical exchanges, deduped by reuse at
    runtime); no cross product anywhere; gains are nonnegative."""
    plan = _plan(spark, "q_gini_split_gain")
    assert "Generate explode" in plan, plan
    assert "keys=[f" in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = SPECS["q_gini_split_gain"].fn(spark, SF0001).collect()
    assert len(rows) == 4
    assert all(r["info_gain"] >= 0 for r in rows), rows


def test_cramers_v_bounds_and_single_explode(spark):
    plan = _plan(spark, "q_cramers_v")
    assert "Generate explode" in plan, plan
    assert "keys=[pr" in plan, plan
    assert "CartesianProduct" not in plan, plan
    rows = SPECS["q_cramers_v"].fn(spark, SF0001).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 <= r["cramers_v"] <= 1.0, r
        assert r["chi2"] >= 0.0


def test_theil_two_level_fold_no_global_window(spark):
    """q_theil_atkinson: no window at all — customer-grain aggregate,
    term pass, nation partials, 25-row total; the plan must be pure
    aggregates + broadcast of the 1-row total."""
    plan = _plan(spark, "q_theil_atkinson")
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "keys=[nk" in plan, plan


def test_kendall_month_grid_broadcast_pairs(spark):
    """q_kendall_tau_b: the quadratic step is a broadcast self-join
    of the month grid (domain-bounded), never a shuffle pair join of
    raw rows."""
    plan = _plan(spark, "q_kendall_tau_b")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # the input-sized work is the one month-grain aggregate
    assert "date_format" in plan, plan


def test_partial_corr_single_pass_no_join(spark):
    """q_partial_corr: nine moments in ONE aggregate over lineitem —
    no join, no window, no second scan."""
    plan = _plan(spark, "q_partial_corr")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_dp_noisy_counts_map_side_noise(spark):
    """q_dp_noisy_counts: one keyed count; the Laplace draw is a
    projection over the 25 group rows (no join, no window, no second
    input scan)."""
    plan = _plan(spark, "q_dp_noisy_counts")
    assert "Join" not in plan, plan
    assert "keys=[c_nationkey" in plan, plan
    # determinism: two runs emit identical noise
    a = sorted(
        (r["nationkey"], r["noisy_count"])
        for r in SPECS["q_dp_noisy_counts"].fn(spark, SF0001).collect()
    )
    b = sorted(
        (r["nationkey"], r["noisy_count"])
        for r in SPECS["q_dp_noisy_counts"].fn(spark, SF0001).collect()
    )
    assert a == b
    # noise is actually applied: no noisy count is an exact integer
    assert all(abs(v - round(v)) > 1e-9 for _, v in a), a


def test_propensity_matching_two_level_fill(spark):
    """q_propensity_att: the in-bucket fills are bkt-keyed windows;
    the only unpartitioned windows consume the ~24-row bucket grid
    (the KS two-level recipe applied to nearest-neighbor matching)."""
    plan = _plan(spark, "q_propensity_att")
    assert "windowspecdefinition(bkt" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_balance_smd_consistent_with_matching(spark):
    """q_treatment_balance_smd shares the matched multiset with
    q_propensity_att (same scan, same caliper): n_matched must agree,
    matching must nearly zero the score SMD (it matched ON score),
    and the variance ratio must move toward 1."""
    bal = {
        r["covariate"]: r
        for r in SPECS["q_treatment_balance_smd"].fn(spark, SF0001).collect()
    }
    att = SPECS["q_propensity_att"].fn(spark, SF0001).collect()[0]
    assert bal["score"]["n_matched"] == att["n_matched"]
    s = bal["score"]
    assert abs(s["smd_after"]) < 0.01, s
    assert abs(s["smd_after"]) < abs(s["smd_before"]) / 5, s
    assert abs(s["var_ratio_after"] - 1.0) < abs(s["var_ratio_before"] - 1.0), s
    # the unmatched covariate must be reported, not silently dropped
    assert "n_orders" in bal


def test_quantile_regression_python_reference(spark):
    """q_quantile_regression == numpy replication of the grid search
    (slopes, exact order-statistic intercept, pinball loss), and the
    fitted line covers ~tau of the data from above."""
    import numpy as np
    import pandas as pd

    row = SPECS["q_quantile_regression"].fn(spark, SF0001).collect()[0]
    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    x = np.round(li["l_quantity"].to_numpy(float), 2)
    y = np.round(li["l_extendedprice"].to_numpy(float), 2)
    n = len(x)
    smax = round(y.sum() / x.sum() * 2, 2)
    k = (9 * n + 9) // 10
    best = None
    for g in range(21):
        s = round(smax * g / 20.0, 2)
        r = y - s * x
        q = np.sort(r)[k - 1]
        pl = np.where(r >= q, 0.9 * (r - q), 0.1 * (q - r)).sum()
        if best is None or pl < best[0]:
            best = (pl, s, q)
    assert abs(row["slope"] - best[1]) < 1e-9, (row, best)
    assert abs(row["intercept"] - best[2]) < 1e-6, (row, best)
    assert abs(row["avg_pinball"] - best[0] / n) < 1e-3, (row, best)
    # coverage: residuals at the fit are below the intercept for
    # exactly ceil(tau*n)/n of rows (exact order statistic)
    r = y - row["slope"] * x
    cov = (r <= row["intercept"] + 1e-9).mean()
    assert abs(cov - k / n) < 0.02, cov


def test_holt_forecast_reference_and_identity(spark):
    """q_holt_forecast == pandas float replication of Holt smoothing
    (tolerance: the engine chain rounds at 12 dp), and forecast(h) ==
    level + h*trend exactly."""
    import pandas as pd

    rows = {r["h"]: r for r in SPECS["q_holt_forecast"].fn(spark, SF0001).collect()}
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    m = (
        o.assign(mo=o["o_orderdate"].values.astype("datetime64[M]"))
        .groupby("mo")["o_totalprice"]
        .sum()
        .sort_index()
        .tail(24)
    )
    ys = [round(v, 2) for v in m.to_numpy(float)]
    level, trend = ys[0], ys[1] - ys[0]
    for y in ys[1:]:
        prev = level
        level = 0.30 * y + 0.70 * (prev + trend)
        trend = 0.10 * (level - prev) + 0.90 * trend
    for h, r in rows.items():
        assert abs(r["forecast"] - (level + h * trend)) < 1e-2 * max(
            1.0, abs(level)
        ), (h, r, level, trend)
        assert abs(r["forecast"] - (r["level"] + h * r["trend"])) < 0.02, r


def test_sprt_matches_sequential_python(spark):
    """q_sprt_monitor == an order-faithful pure-Python sequential
    walk over the raw events (the two-level prefix decomposition must
    equal the plain sequential scan)."""
    import pandas as pd

    row = SPECS["q_sprt_monitor"].fn(spark, SF0001).collect()[0]
    e = pd.read_parquet(f"{SF0001}/events.parquet")[
        ["ts", "event_id", "event_type"]
    ].sort_values(["ts", "event_id"])
    from decimal import Decimal

    inc_s, inc_f = Decimal("0.200670695462"), Decimal("-0.050010420575")
    a = Decimal("2.944438979166")
    llr, n, hit = Decimal(0), 0, None
    for et in e["event_type"]:
        n += 1
        llr += inc_s if et == "purchase" else inc_f
        if llr >= a or llr <= -a:
            hit = ("accept_h1" if llr >= a else "accept_h0", n, float(llr))
            break
    if hit is None:
        assert row["decision"] == "continue" and row["n_at_decision"] == n
    else:
        assert row["decision"] == hit[0]
        assert row["n_at_decision"] == hit[1]
        assert abs(row["llr"] - hit[2]) < 1e-6


def test_mde_power_formula_and_monotonicity(spark):
    """q_mde_power == the two-proportion z formula recomputed from raw
    counts; MDE must shrink as cohort size grows at similar base
    rates."""
    import math

    import pandas as pd

    out = {r["segment"]: r for r in SPECS["q_mde_power"].fn(spark, SF0001).collect()}
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    cnt = o.groupby("o_custkey").size()
    for seg, grp in c.groupby("c_mktsegment"):
        n = len(grp)
        conv = sum(1 for k in grp["c_custkey"] if cnt.get(k, 0) >= 2)
        p = conv / n
        mde = (1.959964 + 0.841621) * math.sqrt(2 * p * (1 - p) / (n / 2))
        assert out[seg]["n_users"] == n
        assert abs(out[seg]["base_rate"] - round(p, 6)) < 1e-9
        assert abs(out[seg]["mde_abs"] - mde) < 1e-5, (seg, out[seg], mde)


def test_pacf_matches_yule_walker_solve(spark):
    """q_pacf_revenue == numpy Yule-Walker solve per order (phi_kk of
    the order-k AR fit) on the query's own ACF values — an
    independent algorithm (matrix solve, not Durbin-Levinson), plus
    pacf(1) == acf(1) identically."""
    import numpy as np

    rows = {r["lag"]: r for r in SPECS["q_pacf_revenue"].fn(spark, SF0001).collect()}
    acf = {r["lag"]: r["acf"] for r in SPECS["q_acf_revenue"].fn(spark, SF0001).collect()}
    for lag in acf:
        assert abs(rows[lag]["acf"] - acf[lag]) < 1e-9
    assert abs(rows[1]["pacf"] - rows[1]["acf"]) < 1e-9
    rho = [1.0] + [rows[k]["acf"] for k in sorted(rows)]
    for k in range(2, len(rho)):
        toe = np.array([[rho[abs(i - j)] for j in range(k)] for i in range(k)])
        phi = np.linalg.solve(toe, np.array(rho[1 : k + 1]))
        assert abs(rows[k]["pacf"] - phi[-1]) < 1e-4, (k, rows[k], phi)


def test_logrank_python_reference(spark):
    """q_survival_logrank == pure-Python Mantel-Cox from raw
    durations (including weeks where one group has no rows — the
    FILTER-sum NULL trap the oracle had to coalesce)."""
    from collections import Counter

    import pandas as pd

    row = SPECS["q_survival_logrank"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    seg = dict(zip(c["c_custkey"], c["c_mktsegment"]))
    h = o["o_orderdate"].max()
    o = o.sort_values(["o_orderdate", "o_orderkey"])
    firsts, seconds = {}, {}
    for k, dte in zip(o["o_custkey"], o["o_orderdate"]):
        if k not in firsts:
            firsts[k] = dte
        elif k not in seconds:
            seconds[k] = dte
    cnt = {g: Counter() for g in (1, 2)}
    dev = {g: Counter() for g in (1, 2)}
    for k, d1 in firsts.items():
        sg = seg.get(k)
        if sg == "BUILDING":
            g = 1
        elif sg == "MACHINERY":
            g = 2
        else:
            continue
        end = seconds.get(k, h)
        wk = min((end - d1).days // 7, 52)
        cnt[g][wk] += 1
        dev[g][wk] += k in seconds
    weeks = sorted(set(cnt[1]) | set(cnt[2]))
    o1 = e1 = v = 0.0
    for wk in weeks:
        n1 = sum(cc for w, cc in cnt[1].items() if w >= wk)
        n2 = sum(cc for w, cc in cnt[2].items() if w >= wk)
        if n1 == 0 or n2 == 0:
            continue
        d1 = dev[1].get(wk, 0)
        dd = d1 + dev[2].get(wk, 0)
        n = n1 + n2
        o1 += d1
        e1 += round(dd * n1 / n, 12)
        if n > 1:
            v += round(dd * (n1 / n) * (1 - n1 / n) * (n - dd) / (n - 1), 12)
    assert row["o1"] == o1
    assert abs(row["e1"] - e1) < 1e-5, (row, e1)
    assert abs(row["chi2"] - (o1 - e1) ** 2 / v) < 1e-4, (row, (o1 - e1) ** 2 / v)


def test_wasserstein_python_reference(spark):
    """q_wasserstein_1d == numpy binned-EMD replication, and the
    metric axioms hold on the fixture (non-negative; zero against
    itself)."""
    import numpy as np
    import pandas as pd

    row = SPECS["q_wasserstein_1d"].fn(spark, SF0001).collect()[0]
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    b1 = np.floor(
        m.loc[m["c_mktsegment"] == "BUILDING", "o_totalprice"] / 1000.0
    ).astype(int)
    b2 = np.floor(
        m.loc[m["c_mktsegment"] == "MACHINERY", "o_totalprice"] / 1000.0
    ).astype(int)
    bins = sorted(set(b1) | set(b2))
    f1 = f2 = 0
    s = 0
    n1, n2 = len(b1), len(b2)
    from collections import Counter

    c1, c2 = Counter(b1), Counter(b2)
    for b in bins:
        f1 += c1.get(b, 0)
        f2 += c2.get(b, 0)
        s += abs(f1 * n2 - f2 * n1)
    want = s * 1000.0 / (n1 * n2)
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["wasserstein_1d"] - want) < 1e-4, (row, want)
    assert row["wasserstein_1d"] >= 0


def test_r2_shapley_efficiency_and_reference(spark):
    """q_r2_shapley_decomposition: phi sums to R2_full (efficiency
    axiom, exact by construction), R2_full matches
    q_ols_two_feature's r2, and phis match a numpy refit reference
    (R2 of each single-feature and the full fit)."""
    import numpy as np
    import pandas as pd

    row = SPECS["q_r2_shapley_decomposition"].fn(spark, SF0001).collect()[0]
    ols = SPECS["q_ols_two_feature"].fn(spark, SF0001).collect()[0]
    assert abs(row["r2_full"] - ols["r2"]) < 1e-6
    assert abs(row["phi_items"] + row["phi_quantity"] - row["r2_full"]) < 1e-5
    assert abs(row["share_items"] + row["share_quantity"] - 1.0) < 1e-5

    li = pd.read_parquet(f"{SF0001}/lineitem.parquet")
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    f = li.groupby("l_orderkey").agg(
        x1=("l_quantity", "size"), x2=("l_quantity", lambda s: int(s.astype(int).sum()))
    )
    j = f.join(o.set_index("o_orderkey")["o_totalprice"].round(2))
    y = j["o_totalprice"].to_numpy(float)

    def r2(cols):
        x = np.column_stack([np.ones(len(j))] + [j[c].to_numpy(float) for c in cols])
        beta, *_ = np.linalg.lstsq(x, y, rcond=None)
        resid = y - x @ beta
        return 1 - (resid**2).sum() / ((y - y.mean()) ** 2).sum()

    r_full, r1, r2_ = r2(["x1", "x2"]), r2(["x1"]), r2(["x2"])
    assert abs(row["r2_full"] - r_full) < 1e-4
    assert abs(row["phi_items"] - (0.5 * r1 + 0.5 * (r_full - r2_))) < 1e-4
    assert abs(row["phi_quantity"] - (0.5 * r2_ + 0.5 * (r_full - r1))) < 1e-4


def test_cohens_kappa_python_reference(spark):
    """text_cohens_kappa == sklearn-free python kappa on the raw
    table, and kappa <= po (chance correction can only shrink)."""
    import pandas as pd

    from cdc_via_flink_spark.functions.text import tokens as _tk  # noqa: F401

    row = SPECS["text_cohens_kappa"].fn(spark, SF0001).collect()[0]
    # contingency identities
    assert row["n"] == row["n11"] + row["n10"] + row["n01"] + row["n00"]
    po = (row["n11"] + row["n00"]) / row["n"]
    pe = (
        (row["n11"] + row["n10"]) * (row["n11"] + row["n01"])
        + (row["n01"] + row["n00"]) * (row["n10"] + row["n00"])
    ) / row["n"] ** 2
    assert abs(row["po"] - po) < 1e-9
    assert abs(row["pe"] - pe) < 1e-9
    assert abs(row["kappa"] - (po - pe) / (1 - pe)) < 1e-6
    assert row["kappa"] <= row["po"] + 1e-9
    # the two length raters must agree far above chance on this corpus
    assert row["kappa"] > 0.3


def test_gmm_em_matches_numpy_and_preserves_mean(spark):
    """q_gmm_em_1d == float numpy EM with the same init and 3 steps
    (rounding-free, tolerance 1e-3 relative), and the mixture mean
    sum(w*mu) equals the corpus mean (the E/M moment-preservation
    identity)."""
    import numpy as np
    import pandas as pd

    rows = {
        r["component"]: r for r in SPECS["q_gmm_em_1d"].fn(spark, SF0001).collect()
    }
    x = np.round(
        pd.read_parquet(f"{SF0001}/orders.parquet")["o_totalprice"].to_numpy(
            float
        ),
        2,
    )
    m, s = x.mean(), x.std()
    pi1, mu1, s1, mu2, s2 = 0.5, m - s, s, m + s, s
    for _ in range(3):
        a1 = pi1 * np.exp(-((x - mu1) ** 2) / (2 * s1 * s1)) / s1
        a2 = (1 - pi1) * np.exp(-((x - mu2) ** 2) / (2 * s2 * s2)) / s2
        r1 = a1 / (a1 + a2)
        n1, n2 = r1.sum(), (1 - r1).sum()
        mu1, mu2 = (r1 * x).sum() / n1, ((1 - r1) * x).sum() / n2
        s1 = np.sqrt(max((r1 * x * x).sum() / n1 - mu1 * mu1, 1e-6))
        s2 = np.sqrt(max(((1 - r1) * x * x).sum() / n2 - mu2 * mu2, 1e-6))
        pi1 = n1 / len(x)
    scale = max(1.0, abs(mu2))
    assert abs(rows[1]["weight"] - pi1) < 1e-3
    assert abs(rows[1]["mu"] - mu1) < 1e-3 * scale
    assert abs(rows[2]["mu"] - mu2) < 1e-3 * scale
    assert abs(rows[1]["sigma"] - s1) < 1e-3 * scale
    # moment preservation: mixture mean == corpus mean
    mix_mean = rows[1]["weight"] * rows[1]["mu"] + rows[2]["weight"] * rows[2]["mu"]
    assert abs(mix_mean - m) < 1e-2 * scale
    assert abs(rows[1]["weight"] + rows[2]["weight"] - 1.0) < 1e-9


def test_cuped_python_reference_and_identities(spark):
    """q_cuped_adjustment == pandas replication; var_reduction ==
    pooled rho^2; the adjusted GRAND mean is unchanged (CUPED is
    mean-preserving at theta fitted on the pool)."""
    import numpy as np
    import pandas as pd

    rows = {r["arm"]: r for r in SPECS["q_cuped_adjustment"].fn(spark, SF0001).collect()}
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    c = c[c["c_mktsegment"].isin(["BUILDING", "MACHINERY"])]
    o = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey", right_on="c_custkey")
    cut = pd.Timestamp("1996-01-01")
    pre = o[o["o_orderdate"] < cut].groupby("o_custkey")["o_totalprice"].sum()
    post = o[o["o_orderdate"] >= cut].groupby("o_custkey")["o_totalprice"].sum()
    df = c.set_index("c_custkey")
    x = pre.reindex(df.index).fillna(0).round(2).to_numpy()
    y = post.reindex(df.index).fillna(0).round(2).to_numpy()
    theta = np.cov(x, y, ddof=0)[0, 1] / np.var(x)
    rho2 = np.cov(x, y, ddof=0)[0, 1] ** 2 / (np.var(x) * np.var(y))
    for arm, grp in df.groupby("c_mktsegment"):
        mask = df.index.isin(grp.index)
        my = y[mask].mean()
        madj = my - theta * (x[mask].mean() - x.mean())
        assert rows[arm]["n_arm"] == int(mask.sum())
        assert abs(rows[arm]["mean_y"] - my) < 1e-3, arm
        assert abs(rows[arm]["mean_y_adj"] - madj) < 1e-3, arm
        assert abs(rows[arm]["theta"] - theta) < 1e-5
        assert abs(rows[arm]["var_reduction"] - rho2) < 1e-5
    # grand-mean preservation
    w = np.array([rows[a]["n_arm"] for a in rows])
    gy = sum(rows[a]["mean_y"] * rows[a]["n_arm"] for a in rows) / w.sum()
    ga = sum(rows[a]["mean_y_adj"] * rows[a]["n_arm"] for a in rows) / w.sum()
    assert abs(gy - ga) < 1e-4


def test_srm_check_reference(spark):
    """q_srm_check == python chi-square against 50/50 on the raw
    counts, with the standard 1-df decision."""
    import pandas as pd

    row = SPECS["q_srm_check"].fn(spark, SF0001).collect()[0]
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    n1 = int((c["c_mktsegment"] == "BUILDING").sum())
    n2 = int((c["c_mktsegment"] == "MACHINERY").sum())
    e = (n1 + n2) / 2
    chi2 = (n1 - e) ** 2 / e + (n2 - e) ** 2 / e
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert abs(row["chi2"] - chi2) < 1e-6
    assert row["verdict"] == ("SRM" if chi2 > 3.841459 else "ok")


def test_qte_numpy_reference_and_monotone_grid(spark):
    """q_quantile_treatment_effect == numpy interpolated quantile
    differences; per-arm quantiles are monotone in tau."""
    import numpy as np
    import pandas as pd

    rows = sorted(
        SPECS["q_quantile_treatment_effect"].fn(spark, SF0001).collect(),
        key=lambda r: r["tau"],
    )
    c = pd.read_parquet(f"{SF0001}/customer.parquet")
    o = pd.read_parquet(f"{SF0001}/orders.parquet")
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    t = m.loc[m["c_mktsegment"] == "BUILDING", "o_totalprice"].to_numpy(float)
    ct = m.loc[m["c_mktsegment"] == "MACHINERY", "o_totalprice"].to_numpy(float)
    for r in rows:
        qt = np.quantile(t, r["tau"], method="linear")
        qc = np.quantile(ct, r["tau"], method="linear")
        assert abs(r["q_treated"] - qt) < 1e-3, r
        assert abs(r["q_control"] - qc) < 1e-3, r
        assert abs(r["qte"] - (r["q_treated"] - r["q_control"])) < 1e-3
    for a, b in zip(rows, rows[1:]):
        assert b["q_treated"] >= a["q_treated"]
        assert b["q_control"] >= a["q_control"]


def test_holt_fold_degenerate_series():
    """holt_fold degrades instead of crashing on short series (the
    ADVICE r10 IndexError on <2 points): 1 point -> (y0, 0); empty ->
    clear ValueError, never an IndexError."""
    from decimal import Decimal

    import pytest

    from cdc_via_flink_spark.operators.forecast import holt_fold

    level, trend = holt_fold([Decimal("5")])
    assert (level, trend) == (Decimal("5"), Decimal(0))
    with pytest.raises(ValueError, match="non-empty"):
        holt_fold([])
