"""Property-based counting-Bloom test: random insert/delete multisets
through counting_bloom_counts, differenced against an exact Python
counter model of the same universal-hash positions. The counters (not
just the verdicts) must match EXACTLY — the operator is algebra, not
approximation; only the membership INTERPRETATION carries the Bloom
false-positive caveat. Also pins the live-member guarantee on every
generated case: any digest with net insert-minus-delete > 0 must
probe hit."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_via_flink_spark.functions.hashing import P, a_j, b_j
from cdc_via_flink_spark.operators.bloom import (
    _J_BASE,
    counting_bloom_counts,
    counting_bloom_probe,
)

M_BITS, K = 1 << 8, 3  # tiny on purpose: maximum counter sharing


def _model_positions(digest: int) -> list[int]:
    return [
        ((a_j(_J_BASE + j) * (digest % P) + b_j(_J_BASE + j)) % P) % M_BITS
        for j in range(K)
    ]


scenario = st.tuples(
    st.lists(st.integers(0, 30), min_size=1, max_size=25, unique=True),
    st.data(),
)


@given(scenario)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_counters_match_python_model(spark, scen):
    members, data = scen
    deletes = data.draw(
        st.lists(st.sampled_from(members), max_size=len(members), unique=True)
    )
    mdf = spark.createDataFrame([(int(d),) for d in members], "digest long")
    ddf = spark.createDataFrame(
        [(int(d),) for d in deletes], "digest long"
    ) if deletes else mdf.limit(0)
    got = {
        r.pos: r.cnt
        for r in counting_bloom_counts(mdf, ddf, "digest", M_BITS, K).collect()
    }
    model: Counter = Counter()
    for d in members:
        for p in _model_positions(d):
            model[p] += 1
    for d in deletes:
        for p in _model_positions(d):
            model[p] -= 1
    # dict(model) keeps exact-zero entries for TOUCHED positions —
    # matching Spark, where a netted-to-zero position still has a row
    assert got == dict(model), (members, deletes)

    # live-member guarantee on this exact case: every non-deleted
    # member must probe hit even at this deliberately tiny sizing
    live = [d for d in members if d not in set(deletes)]
    if live:
        probes = spark.createDataFrame(
            [(int(d), int(d)) for d in live], "pid long, digest long"
        )
        counts = counting_bloom_counts(mdf, ddf, "digest", M_BITS, K)
        verd = counting_bloom_probe(probes, "pid", "digest", counts, M_BITS, K)
        assert verd.filter(~F.col("cb_hit")).count() == 0, (members, deletes)
