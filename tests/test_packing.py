"""Greedy sequence-packing invariants (operators/packing.py).

The oracle-parity test (q_pack_greedy vs the recursive-CTE oracle)
pins exact values; these tests pin the *invariants* of the packer on
arbitrary inputs, and that the distributed applyInPandas path agrees
with the sequential core.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from cdc_via_flink_spark.operators.packing import greedy_bins, pack_greedy

BUDGET = 100


@given(st.lists(st.integers(min_value=1, max_value=250), min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_greedy_bins_invariants(sizes):
    arr = np.asarray(sizes, dtype=np.int64)
    bins = greedy_bins(arr, BUDGET)
    # dense, nondecreasing, starts at 0, steps of at most 1
    assert bins[0] == 0
    steps = np.diff(bins)
    assert ((steps == 0) | (steps == 1)).all()
    # budget invariant: a bin exceeds the budget only as a singleton
    for b in range(bins[-1] + 1):
        member_sizes = arr[bins == b]
        assert member_sizes.sum() <= BUDGET or len(member_sizes) == 1
    # greedy tightness: the first element of bin b+1 did NOT fit in bin b
    starts = np.flatnonzero(np.r_[0, steps] == 1)
    for i in starts:
        assert arr[bins == bins[i] - 1].sum() + arr[i] > BUDGET


def test_pack_greedy_matches_sequential_core(spark):
    import pandas as pd

    rng = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            "lang": rng.choice(["en", "de", "zh"], size=500),
            "shard": rng.randint(0, 4, size=500),
            "doc_id": np.arange(500),
            "tokens": rng.randint(1, 80, size=500).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = pack_greedy(df, size_col="tokens", budget=BUDGET).toPandas()
    assert len(got) == 500
    got = got.sort_values(["lang", "shard", "doc_id"]).reset_index(drop=True)
    for (_lang, _shard), g in got.groupby(["lang", "shard"], sort=False):
        expect = greedy_bins(g["tokens"].to_numpy(), BUDGET)
        assert (g["bin"].to_numpy() == expect).all()
