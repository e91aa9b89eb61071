"""Bloom-filter ingest gate (operators/bloom.py).

Pins the two Bloom guarantees independently of the declared query's
oracle: NO false negatives ever (structural), and false positives
appear at the rate the model predicts when the filter is deliberately
undersized.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.bloom import (
    WORD_BITS,
    bloom_build,
    bloom_fpr,
    bloom_plan,
    bloom_probe,
)


def _members(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "digest long")


def test_bloom_plan_model():
    m, k = bloom_plan(1_000_000, 0.01)
    # canonical optimum: ~9.59 bits/member, k ~ 7 at 1% fpr
    assert 9_500_000 <= m <= 9_700_000
    assert k == 7
    assert m % WORD_BITS == 0
    # model fpr at the planned size is at or below target (rounding up
    # m can only help)
    assert bloom_fpr(1_000_000, m, k) <= 0.011
    with pytest.raises(ValueError):
        bloom_plan(0, 0.01)
    with pytest.raises(ValueError):
        bloom_plan(10, 1.5)


def test_bloom_no_false_negatives(spark):
    members = _members(spark, range(0, 500, 3))
    m, k = bloom_plan(200, 0.01)
    bm = bloom_build(members, "digest", m, k)
    probe = bloom_probe(members.withColumnRenamed("digest", "d"), "d", "d", bm, m, k)
    n_members = members.count()
    hits = probe.filter(F.col("bloom_hit")).count()
    assert hits == n_members  # every member must hit — the Bloom guarantee


def test_bloom_undersized_shows_false_positives(spark):
    # 400 members into a 64-bit filter with k=2: model fpr ~ (1-e^-12.5)^2
    # ~= 1.0 — non-members collide essentially always. This pins that
    # false positives are REAL and visible, not an artifact the build
    # path hides.
    m, k = 64, 2
    members = _members(spark, range(1000, 1400))
    nonmembers = _members(spark, range(5000, 5100)).withColumnRenamed("digest", "d")
    bm = bloom_build(members, "digest", m, k)
    probe = bloom_probe(nonmembers, "d", "d", bm, m, k)
    fp = probe.filter(F.col("bloom_hit")).count()
    assert fp > 50  # model predicts ~100; >50 is a safe deterministic floor


def test_bloom_fpr_tracks_model(spark):
    # moderately-sized filter: measured fpr on 2000 non-members within
    # a loose band of the analytic model (deterministic hashes — the
    # measurement is exact, the band covers model error only)
    n, m, k = 300, 1024, 2
    members = _members(spark, range(n))
    nonmembers = _members(spark, range(10_000, 12_000)).withColumnRenamed(
        "digest", "d"
    )
    bm = bloom_build(members, "digest", m, k)
    probe = bloom_probe(nonmembers, "d", "d", bm, m, k)
    fp = probe.filter(F.col("bloom_hit")).count()
    model = bloom_fpr(n, m, k)
    measured = fp / 2000.0
    assert abs(measured - model) < 0.08, (measured, model)


def test_bloom_build_validates_sizing(spark):
    members = _members(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        bloom_build(members, "digest", 100, 3)  # not a word multiple
    with pytest.raises(ValueError):
        bloom_build(members, "digest", 64, 0)


def test_bloom_bitmap_bounded(spark):
    # the bitmap never exceeds m/32 rows no matter how many members
    m, k = 256, 4
    bm = bloom_build(_members(spark, range(5000)), "digest", m, k)
    assert bm.count() <= m // WORD_BITS


# --- counting Bloom (deletion-capable gate) ---


def test_counting_bloom_retained_members_always_hit(spark):
    """The deletion guarantee: after deleting any subset, every
    RETAINED member still hits — a retained digest's own +1 per
    position cannot be cancelled by other digests' deletions. Probed
    across an undersized filter (maximum counter sharing) to stress
    the property where it is hardest."""
    from cdc_via_flink_spark.operators.bloom import (
        counting_bloom_counts,
        counting_bloom_probe,
    )

    members = _members(spark, range(1000))
    deletes = _members(spark, range(0, 1000, 2))  # delete every other
    m_bits, k = 1 << 10, 4  # deliberately tiny: heavy sharing
    counts = counting_bloom_counts(members, deletes, "digest", m_bits, k)
    retained = _members(spark, range(1, 1000, 2)).withColumnRenamed(
        "digest", "d"
    ).select(F.col("d").alias("pid"), F.col("d").alias("digest"))
    got = counting_bloom_probe(retained, "pid", "digest", counts, m_bits, k)
    assert got.filter(~F.col("cb_hit")).count() == 0


def test_counting_bloom_deleted_members_miss_when_sized(spark):
    """At a healthy sizing, deleted members read miss (up to the FP
    rate) and counters never go negative (the distinct-insert
    precondition holds by construction)."""
    from cdc_via_flink_spark.operators.bloom import (
        bloom_plan,
        counting_bloom_counts,
        counting_bloom_probe,
    )

    m_bits, k = bloom_plan(2000, 0.01)
    members = _members(spark, range(2000))
    deletes = _members(spark, range(0, 2000, 4))
    counts = counting_bloom_counts(members, deletes, "digest", m_bits, k)
    assert counts.filter(F.col("cnt") < 0).count() == 0

    deleted = _members(spark, range(0, 2000, 4)).select(
        F.col("digest").alias("pid"), "digest"
    )
    got = counting_bloom_probe(deleted, "pid", "digest", counts, m_bits, k)
    n = got.count()
    hits = got.filter(F.col("cb_hit")).count()
    # hits on deleted members are pure false positives; at 1% target
    # sizing they must be rare
    assert hits <= max(10, int(0.05 * n)), (hits, n)


def test_counting_bloom_full_delete_empties_filter(spark):
    """Deleting every member nets all counters to zero — every probe
    (member or not) reads miss. The algebra is exact, not
    approximate."""
    from cdc_via_flink_spark.operators.bloom import (
        counting_bloom_counts,
        counting_bloom_probe,
    )

    members = _members(spark, range(500))
    counts = counting_bloom_counts(members, members, "digest", 1 << 12, 4)
    assert counts.filter(F.col("cnt") != 0).count() == 0
    probes = _members(spark, range(500)).select(
        F.col("digest").alias("pid"), "digest"
    )
    got = counting_bloom_probe(probes, "pid", "digest", counts, 1 << 12, 4)
    assert got.filter(F.col("cb_hit")).count() == 0
