"""Deterministic split/sample operators (operators/sampling.py).

The oracle-parity tests (q_split_train_test, q_stratified_sample) pin
exact values at the declared-query surface; these pin the operator
API's properties: partition-layout independence (the determinism claim
that matters on a cluster), rate accuracy, and input validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.sampling import hash_split, stratified_sample
from cdc_via_flink_spark.sources.tables import load_table
from tests.conftest import SF0001


def test_hash_split_partition_independent(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id")
    splits = {"train": 204, "valid": 26, "test": 26}
    a = hash_split(d.repartition(1), "doc_id", splits)
    b = hash_split(d.repartition(13), "doc_id", splits)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    counts = {r["split"]: r["n"] for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "valid", "test"}
    # 204/256 = 79.7% expected; allow wide tolerance at 500 rows
    assert 0.7 < counts["train"] / n < 0.9


def test_hash_split_rejects_bad_buckets(spark):
    d = load_table(spark, SF0001, "documents")
    with pytest.raises(ValueError):
        hash_split(d, "doc_id", {"train": 200, "test": 26})


def test_stratified_sample_rates_and_determinism(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "lang")
    s1 = stratified_sample(d, "doc_id", "lang", {"en": 64}, default_rate=192)
    s2 = stratified_sample(d.repartition(7), "doc_id", "lang", {"en": 64}, default_rate=192)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0
    tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert kept["en"] / tot["en"] < 0.45  # target 0.25
    non_en_kept = sum(v for k, v in kept.items() if k != "en")
    non_en_tot = sum(v for k, v in tot.items() if k != "en")
    assert non_en_kept / non_en_tot > 0.6  # target 0.75
    # default_rate=256 keeps every non-listed row
    s_all = stratified_sample(d, "doc_id", "lang", {"en": 0}, default_rate=256)
    assert s_all.filter(F.col("lang") == "en").count() == 0
    assert s_all.count() == non_en_tot


def test_stratified_sample_per_stratum_rate_256_keeps_all(spark):
    # rate=256 for a listed stratum must keep 100% of it (regression:
    # f"{256:02x}" is the 3-char '100', which lexicographically kept
    # only buckets 00-10 ≈ 6.6%)
    d = load_table(spark, SF0001, "documents").select("doc_id", "lang")
    s = stratified_sample(d, "doc_id", "lang", {"en": 256}, default_rate=0)
    assert s.count() == d.filter(F.col("lang") == "en").count()
    assert s.filter(F.col("lang") != "en").count() == 0
