"""Skew-guarded band self-join (operators/banding.py): the salted
hot-bucket path must emit EXACTLY the plain self-join's pair set —
every pair once, payloads attached to the right side — and the guard
must engage only on buckets above the cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.banding import band_self_join


def _plain_pairs(banded, key_cols, id_col, payload_cols=()):
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (F.col(f"A.{c}") == F.col(f"B.{c}"))
    cond = cond & (F.col(f"A.{id_col}") < F.col(f"B.{id_col}"))
    sel = [
        F.col(f"A.{id_col}").alias("id_a"),
        F.col(f"B.{id_col}").alias("id_b"),
    ] + [
        c
        for p in payload_cols
        for c in (F.col(f"A.{p}").alias(f"{p}_a"), F.col(f"B.{p}").alias(f"{p}_b"))
    ]
    return banded.alias("A").join(banded.alias("B"), cond).select(*sel)


def test_hot_bucket_salting_is_exact(spark):
    """One 300-row hot bucket (cap=50 → 6 sub-buckets) + one 40-row
    cold bucket + a 3-row bucket: pair set identical to the plain
    join, each pair emitted exactly once (no dropDuplicates needed to
    repair double-counting), payloads side-correct."""
    rows = (
        [(0, "h", i, i * 10) for i in range(300)]
        + [(0, "c", 1000 + i, i) for i in range(40)]
        + [(1, "h", 2000 + i, i) for i in range(3)]
    )
    banded = spark.createDataFrame(rows, "band int, bsig string, doc_id long, sz long")
    got = band_self_join(
        banded, ("band", "bsig"), "doc_id", payload_cols=("sz",), cap=50
    )
    exact = _plain_pairs(banded, ("band", "bsig"), "doc_id", ("sz",))
    g = sorted(tuple(r) for r in got.collect())
    e = sorted(tuple(r) for r in exact.collect())
    assert g == e
    # exactly-once: C(300,2) + C(40,2) + C(3,2)
    assert len(g) == 300 * 299 // 2 + 40 * 39 // 2 + 3


def test_property_random_bucket_structures_match_plain_join(spark):
    """Property pin over random bucket structures and caps: whatever
    the bucket-size distribution (empty-ish, all-hot, mixed, cap=1
    extreme salting), the guarded join's (pair, payload) multiset must
    equal the plain join's."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        sizes=st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=6),
        cap=st.integers(min_value=1, max_value=12),
    )
    def check(sizes, cap):
        rows = [
            (b, i + b * 1000, (i * 7 + b) % 13)
            for b, m in enumerate(sizes)
            for i in range(m)
        ]
        banded = spark.createDataFrame(rows, "bucket int, doc_id long, sz long")
        got = sorted(
            tuple(r)
            for r in band_self_join(
                banded, ("bucket",), "doc_id", payload_cols=("sz",), cap=cap
            ).collect()
        )
        exact = sorted(
            tuple(r) for r in _plain_pairs(banded, ("bucket",), "doc_id", ("sz",)).collect()
        )
        assert got == exact

    check()


def test_auto_guard_engages_only_when_a_bucket_is_hot(spark):
    """r7 (VERDICT r6 #1): 'auto' must pick the PLAIN reused-exchange
    join on healthy inputs (no RepartitionByExpression, no salt
    window) and the pinned salted plan when a bucket exceeds the cap —
    with identical pair sets either way."""

    def lplan(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    hot = spark.createDataFrame(
        [(0, "h", i) for i in range(300)], "band int, bsig string, doc_id long"
    )
    cold = spark.createDataFrame(
        [(b, "c", b * 1000 + i) for b in range(20) for i in range(6)],
        "band int, bsig string, doc_id long",
    )
    hot_df = band_self_join(hot, ("band", "bsig"), "doc_id", cap=50)
    cold_df = band_self_join(cold, ("band", "bsig"), "doc_id", cap=50)
    assert "RepartitionByExpression" in lplan(hot_df)
    assert "RepartitionByExpression" not in lplan(cold_df)
    assert hot_df.count() == 300 * 299 // 2
    assert cold_df.count() == 20 * (6 * 5 // 2)
    # explicit overrides win in both directions
    forced = band_self_join(cold, ("band", "bsig"), "doc_id", cap=50, guard="force")
    plain = band_self_join(hot, ("band", "bsig"), "doc_id", cap=50, guard="off")
    assert "RepartitionByExpression" in lplan(forced)
    assert "RepartitionByExpression" not in lplan(plain)
    assert forced.count() == 20 * (6 * 5 // 2)
    assert plain.count() == 300 * 299 // 2


def test_cold_only_matches_plain_join(spark):
    rows = [(t, b, t * 100 + i) for t in range(4) for b in range(3) for i in range(7)]
    banded = spark.createDataFrame(rows, "t int, bucket int, vec_id long")
    got = sorted(
        (r.id_a, r.id_b)
        for r in band_self_join(banded, ("t", "bucket"), "vec_id", cap=100).collect()
    )
    exact = sorted(
        (r.id_a, r.id_b)
        for r in _plain_pairs(banded, ("t", "bucket"), "vec_id").collect()
    )
    assert got == exact and len(got) == 4 * 3 * (7 * 6 // 2)


def test_probe_guard_streaming_falls_back_to_force(spark, tmp_path):
    """probe_guard handed a STREAMING raw frame cannot run its
    sample/first probe action; it must return 'force' (always safe)
    exactly as band_self_join's auto path does (ADVICE r7), not die in
    an opaque analysis error."""
    from cdc_via_flink_spark.operators.banding import probe_guard

    src = tmp_path / "src"
    src.mkdir()
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    called = []

    def make_banded(raw):
        called.append(1)
        return raw.select("doc_id", F.lit(0).alias("band"))

    assert probe_guard(make_banded, stream, ("band",)) == "force"
    assert not called  # decided without banding the stream


def test_guard_memo_bounded(spark):
    """_GUARD_MEMO is cleared wholesale at its size cap — a long-lived
    serving process churning thousands of distinct plans cannot grow
    it without bound (VERDICT r7 #8)."""
    from cdc_via_flink_spark.operators import banding

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(60)], "doc_id long, band long"
    )
    saved = dict(banding._GUARD_MEMO)
    try:
        banding._GUARD_MEMO.clear()
        banding._GUARD_MEMO.update(
            {("fake", i): "off" for i in range(banding._GUARD_MEMO_MAX)}
        )
        decision = banding.probe_guard(
            lambda raw: raw.select("doc_id", "band"), df, ("band",)
        )
        assert decision in ("force", "pin", "off")
        # cap enforced: the full fake population was dropped, the real
        # decision (re-)memoized
        assert len(banding._GUARD_MEMO) <= 1
    finally:
        banding._GUARD_MEMO.clear()
        banding._GUARD_MEMO.update(saved)
