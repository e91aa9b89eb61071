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
