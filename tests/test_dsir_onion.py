"""Dedicated coverage for the two round-9 stragglers that shipped on
oracle-greenness alone (round-9 VERDICT "What's wrong" #2):

* ``dedup_onion_clean`` — a CONSTRUCTED corpus with hand-computable
  repeated spans, including two OVERLAPPING shared regions that must
  merge into one island and count their overlap tokens exactly once.
* ``text_dsir_selection`` — plan-shape pins: the two hashed-n-gram
  model tables join in broadcast (never a doc-side shuffle join), and
  the top-k compiles to TakeOrderedAndProject (no global sort
  materialization).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.registry import load_all
from cdc_via_flink_spark.plans.text_queries import SPAN_N
from tests.conftest import SF0001

SPECS = load_all()

assert SPAN_N == 8, "constructed spans below are laid out for SPAN_N=8"


def _mk_docs(spark, tmp_path):
    """documents fixture with exact known span accounting. Filler
    tokens are globally unique, so every 8-gram touching one is
    unique; only the shared S/X runs repeat across docs. All doc_ids
    avoid %10==0 so the query's synthetic prefix-clone branch adds
    nothing."""
    S1 = [f"s{i}" for i in range(10)]  # 10-token span shared by A and B
    S2 = [f"t{i}" for i in range(10)]  # second shared span
    X = [f"x{i}" for i in range(20)]  # C's whole text; D shares X[0:12], E shares X[7:20]
    uniq = iter(f"u{i}" for i in range(100))

    def filler(n):
        return [next(uniq) for _ in range(n)]

    rows = [
        # A: 5 + S1 + 3 + S2 + 4 = 32 tokens; islands 10 + 10
        (1, " ".join(filler(5) + S1 + filler(3) + S2 + filler(4))),
        # B: 3 + S1 + 9 + S2 + 2 = 34; gap 9 > gram-gap 8 -> two islands
        (2, " ".join(filler(3) + S1 + filler(9) + S2 + filler(2))),
        # C: X entirely; D covers X[0:12], E covers X[7:20] — the two
        # shared regions OVERLAP on X[7:12]; gram islands pos 1..5 and
        # 8..13 merge (8 <= 5+8) -> ONE span of all 20 tokens
        (3, " ".join(X)),
        (4, " ".join(X[0:12] + filler(8))),  # D: 12 rep + 8 kept
        (5, " ".join(filler(4) + X[7:20] + filler(3))),  # E: 13 rep + 7 kept
        (6, " ".join(filler(4))),  # F: shorter than one gram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    )
    sf = str(tmp_path / "onion_sf")
    df.write.parquet(sf + "/documents.parquet")
    return sf


def test_onion_accounting_constructed(spark, tmp_path):
    sf = _mk_docs(spark, tmp_path)
    got = {
        r.doc_id: (r.n_tokens, r.rep_tokens, r.kept_tokens, r.n_spans, r.rep_frac)
        for r in SPECS["dedup_onion_clean"].fn(spark, sf).collect()
    }
    assert got[1] == (32, 20, 12, 2, round(20 / 32, 6))
    assert got[2] == (34, 20, 14, 2, round(20 / 34, 6))
    # the overlap case: two shared regions covering all of C merge to
    # ONE island; the 5 overlapping tokens are counted once (rep=20,
    # not 25) and kept hits exactly 0
    assert got[3] == (20, 20, 0, 1, 1.0)
    assert got[4] == (20, 12, 8, 1, round(12 / 20, 6))
    assert got[5] == (20, 13, 7, 1, round(13 / 20, 6))
    assert got[6] == (4, 0, 4, 0, 0.0)
    assert len(got) == 6


def _plan(spark, name, mode="simple"):
    df = SPECS[name].fn(spark, SF0001)
    jvm = spark._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def test_dsir_model_broadcast_and_topk(spark):
    """DSIR's scale argument, pinned: the <=4096-row ratio model
    reaches each doc feature via BroadcastHashJoin (a doc-side
    shuffle join against the model would serialize the pipeline at
    100 TB), and the final top-50 is TakeOrderedAndProject — never a
    global Sort + Limit materialization."""
    plan = _plan(spark, "text_dsir_selection")
    assert "TakeOrderedAndProject" in plan, plan
    # the docfeat-x-ratio join (on bucket b) must be broadcast
    import re

    bhj = re.findall(r"BroadcastHashJoin \[b[#L0-9]*\]", plan)
    assert bhj, f"model join on b is not broadcast:\n{plan}"
    # no sort-merge join anywhere in the DSIR plan: every join is
    # broadcast (model tables) or semi (target ids)
    assert "SortMergeJoin" not in plan, plan
