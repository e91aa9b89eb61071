"""The examples must keep working — they are the 'switch to this repo'
story. Runs the training-pipeline example's corpus builder on sf0.001
and checks its output invariants."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples")
)

from tests.conftest import SF0001


def test_train_pipeline_build_corpus(spark):
    from train_pipeline import build_corpus

    corpus = build_corpus(spark, SF0001)
    rows = corpus.collect()
    assert rows, "empty packed corpus"
    splits = {r["split"] for r in rows}
    assert splits <= {"train", "valid", "test"}
    assert all(r["n_docs"] >= 1 for r in rows)
    # budget invariant: a packed bin exceeds 2048 tokens only as a singleton
    assert all(r["bin_tokens"] <= 2048 or r["n_docs"] == 1 for r in rows)
    # train must dominate (204/256 of buckets)
    per_split = (
        corpus.groupBy("split").agg(F.sum("n_docs").alias("n")).toPandas().set_index("split")["n"]
    )
    assert per_split.get("train", 0) > per_split.get("valid", 0)
    assert per_split.get("train", 0) > per_split.get("test", 0)


def test_retrieval_pipeline_context(spark):
    from retrieval_pipeline import build_context

    ctx = build_context(spark, SF0001).collect()
    # 5 embedding queries x 5 diversified picks
    assert len(ctx) == 25
    by_q = {}
    for r in ctx:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        assert sorted(r["step"] for r in rs) == [1, 2, 3, 4, 5]
        # MMR never repeats a doc within a query's context
        assert len({r["doc_id"] for r in rs}) == 5
        assert all(r["snippet"] for r in rs)
    # the lexical-evidence flag is well-formed (both values possible
    # but at minimum the column exists and is boolean)
    assert {type(r["rrf_evidence"]) for r in ctx} == {bool}


def test_attribution_report_comparison(spark):
    from attribution_report import build_comparison

    rows = build_comparison(spark, SF0001).collect()
    channels = {r["channel"] for r in rows}
    # the four event channels always present; 'direct' optional
    assert {"click", "error", "signup", "view"} <= channels
    for r in rows:
        if r["channel"] == "direct":
            # exposure-based rules don't define 'direct'
            assert r["shapley"] is None and r["markov"] is None
            continue
        # every rule produced a share and the spread is consistent
        vals = [r[k] for k in ("last_touch", "linear", "time_decay", "shapley", "markov")]
        vals = [v for v in vals if v is not None]
        assert vals and abs(r["share_spread"] - (max(vals) - min(vals))) < 1e-6
    # each rule's shares sum to ~1 across channels
    for k in ("last_touch", "linear", "time_decay", "shapley", "markov"):
        tot = sum(r[k] for r in rows if r[k] is not None)
        assert abs(tot - 1.0) < 1e-3, (k, tot)


def test_experimentation_report_runs(spark):
    """The experimentation one-pager's components stay composable:
    every step query it uses exists and returns rows at sf0.001."""
    from cdc_via_flink_spark.plans.registry import load_all

    specs = load_all()
    for name in (
        "q_mde_power",
        "q_treatment_balance_smd",
        "q_cuped_adjustment",
        "q_sprt_monitor",
        "q_ab_test_proportions",
        "q_fdr_bh",
    ):
        assert specs[name].fn(spark, SF0001).collect(), name
