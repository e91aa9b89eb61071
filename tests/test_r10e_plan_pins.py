"""Plan-shape pins for the round-10e queries whose scale arguments
are load-bearing but which shipped on oracle-greenness alone —
each test pins the ONE property the docstring's 100 TB claim rests
on (the r9-VERDICT rule: a claimed plan shape needs a pinned test).
"""

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


def test_weighted_median_flag_keyed_windows(spark):
    """q_weighted_median: cumulative-weight windows partition by flag;
    no unpartitioned window over the value grain."""
    plan = _plan(spark, "q_weighted_median")
    assert "windowspecdefinition(flag" in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cumulative_uniques_day_grid_window(spark):
    """q_cumulative_uniques: the only unpartitioned window consumes
    the day grid (downstream of the first_day groupBy), never raw
    events; first-seen attribution is a user-grain aggregate."""
    plan = _plan(spark, "q_cumulative_uniques")
    assert "keys=[user_id" in plan, plan  # user-grain min(day)
    assert "keys=[day" in plan, plan  # day-grid rollup below the window
    assert "SortMergeJoin" not in plan, plan


def test_itemcf_order_blocked_and_grouplimit(spark):
    """q_itemcf_topk: pair space is the ok-keyed self-join (never a
    catalog cross product); item counts broadcast; per-item top-k
    rides WindowGroupLimit."""
    plan = _plan(spark, "q_itemcf_topk")
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_bucket_skew_audit_no_pair_join(spark):
    """dedup_bucket_skew_audit: the audit predicts the quadratic
    band-join cost WITHOUT materializing it — no self-join of the
    banded frame anywhere (only groupBys above the signature agg)."""
    plan = _plan(spark, "dedup_bucket_skew_audit")
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # bucket census = one (band, bsig) aggregate
    assert "keys=[band" in plan, plan


def test_vocab_jaccard_term_blocked(spark):
    """text_source_vocab_jaccard: the source-pair intersection comes
    from a term-keyed equi-join (df-bounded per term) — never a
    |sources|² nested loop over vocabularies."""
    plan = _plan(spark, "text_source_vocab_jaccard")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_hard_negative_label_filter_in_scoring(spark):
    """sim_hard_negative_mining: the different-label predicate runs in
    the broadcast scoring stage (before the rank window), so the
    window only ranks true candidates."""
    plan = _plan(spark, "sim_hard_negative_mining")
    assert "BroadcastNestedLoopJoin" in plan, plan  # corpus x 20 queries
    assert "NOT (label" in plan or "label" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_embedding_drift_decimal_fold(spark):
    """sim_embedding_drift: centroid components fold as DECIMAL (the
    order-independence claim) and the explode is the only
    row-multiplying node."""
    plan = _plan(spark, "sim_embedding_drift")
    assert "posexplode" in plan or "Generate" in plan, plan
    assert "decimal(28,8)" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cusum_binary_seg_keyed_only(spark):
    """q_cusum_binary_seg: every window is (nk[, side])-keyed — the
    recursion multiplies keys, never rows; no single-partition
    exchange anywhere."""
    plan = _plan(spark, "q_cusum_binary_seg")
    assert "Exchange SinglePartition" not in plan, plan
    assert "windowspecdefinition(nk" in plan, plan


def test_spc_nation_keyed_lags(spark):
    """q_spc_control_chart: the Western-Electric windows are
    nation-keyed lags over month cells; stats arrive by broadcast."""
    plan = _plan(spark, "q_spc_control_chart")
    assert "Exchange SinglePartition" not in plan, plan
    assert "windowspecdefinition(nk" in plan, plan


def test_price_index_part_keyed_joins(spark):
    """q_price_index: base/current month joins are part-keyed over the
    (part, month) aggregate — no month-grid cross product, decimal
    folds present."""
    plan = _plan(spark, "q_price_index")
    assert "CartesianProduct" not in plan, plan
    assert "decimal(28,6)" in plan, plan


def test_welch_and_anova_single_input_agg(spark):
    """q_welch_ttest / q_anova_f: one input-sized aggregate each; the
    k-row tail never shuffles an input-sized relation again."""
    for name in ("q_welch_ttest", "q_anova_f"):
        plan = _plan(spark, name)
        assert "Window" not in plan, (name, plan)
        assert "SortMergeJoin" not in plan, (name, plan)


def test_dataset_card_single_row_outputs(spark):
    """text_dataset_card: the top-language row is a bounded
    TakeOrderedAndProject over the lang rollup, not a global sort of
    documents."""
    plan = _plan(spark, "text_dataset_card")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" in plan
