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


def test_chunk_overlap_covers_every_token_with_stride(spark):
    """Every token index must fall in >=1 chunk; consecutive chunks
    must overlap by exactly W-S tokens (except the clamped tail); and
    chunk ids must be dense from 0."""
    from cdc_via_flink_spark.plans.registry import load_all
    from tests.conftest import SF0001

    import pyspark.sql.functions as F

    from cdc_via_flink_spark.functions.text import tokens
    from cdc_via_flink_spark.sources.tables import load_table

    W, S = 16, 12
    rows = load_all()["q_chunk_overlap"].fn(spark, SF0001).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    n_tok = {
        r.doc_id: r.n
        for r in load_table(spark, SF0001, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    assert set(by_doc) == set(n_tok)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        n = n_tok[doc_id]
        # coverage: last chunk's window reaches the last token
        last_start = (len(chunks) - 1) * S
        assert last_start + chunks[-1].n_tokens == n
        # all but the last chunk are full windows
        assert all(c.n_tokens == W for c in chunks[:-1])


def test_mixture_resample_rates_and_determinism(spark):
    """Sampled fraction per source must track k256/256 within binomial
    noise, and the sample must be bit-stable across runs (hash
    bucketing, not rand())."""
    from cdc_via_flink_spark.plans.registry import load_all
    from tests.conftest import SF001

    fn = load_all()["q_mixture_resample"].fn
    a = {r.source: r for r in fn(spark, SF001).collect()}
    b = {r.source: r for r in fn(spark, SF001).collect()}
    assert {s: (r.n_kept, r.kept_chars) for s, r in a.items()} == {
        s: (r.n_kept, r.kept_chars) for s, r in b.items()
    }
    for s, r in a.items():
        assert 0 < r.k256 <= 256
        expect = r.n_docs * r.k256 / 256
        sd = max((expect * (1 - r.k256 / 256)) ** 0.5, 1.0)
        assert abs(r.n_kept - expect) <= 5 * sd, (s, r.n_kept, expect)


def test_corpus_checksum_shard_additivity(spark):
    """q_corpus_checksum's associativity claim, exercised: per-source
    checksums over two disjoint halves ADD UP to the full corpus
    checksum, and perturbing one text changes it."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.plans.registry import load_all
    from cdc_via_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    full = {
        r["source"]: (r["n_docs"], r["checksum"])
        for r in load_all()["q_corpus_checksum"].fn(spark, sf).collect()
    }
    d = load_table(spark, sf, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")

    def cks(df):
        return {
            r["source"]: (r["n"], r["c"])
            for r in df.select("source", hv.alias("hv"))
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("hv").alias("c"))
            .collect()
        }

    a = cks(d.filter(F.col("doc_id") % 2 == 0))
    b = cks(d.filter(F.col("doc_id") % 2 == 1))
    for srcname, (n, c) in full.items():
        na, ca = a.get(srcname, (0, 0))
        nb, cb = b.get(srcname, (0, 0))
        assert (na + nb, ca + cb) == (n, c), srcname
    # content sensitivity: a one-character change moves the checksum
    perturbed = cks(d.withColumn(
        "text",
        F.when(F.col("doc_id") == d.select(F.min("doc_id")).head()[0],
               F.concat(F.col("text"), F.lit("x"))).otherwise(F.col("text")),
    ))
    assert perturbed != cks(d)
