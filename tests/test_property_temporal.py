"""Property test for the temporal join's per-key matcher
(streaming/temporal.py::_match_rows): random probe/dim series
differenced against pandas merge_asof (direction='backward',
inclusive). No SparkSession needed — this pins the pure matching
kernel both stateful-API processors share, at hypothesis speed."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_via_flink_spark.streaming.temporal import _match_rows

_ts = st.integers(min_value=0, max_value=30)

scenario = st.tuples(
    st.lists(_ts, min_size=1, max_size=15),  # probe timestamps
    st.lists(_ts, min_size=0, max_size=15),  # dim timestamps
)


@given(scenario)
@settings(max_examples=200, deadline=None)
def test_match_rows_vs_merge_asof(scen):
    probe_ts, dim_ts = scen
    probes = sorted((t, 1000 + i) for i, t in enumerate(probe_ts))
    # merge_asof has positional (not value) tie-breaks for duplicate
    # right timestamps; _match_rows specifies max-seq-at-max-ts. Align
    # by deduping dims to the max seq per timestamp, which is exactly
    # the winner _match_rows must pick.
    best: dict[int, int] = {}
    for i, t in enumerate(dim_ts):
        best[t] = max(best.get(t, -1), i)
    dims = sorted((t, s, f"op{s}") for t, s in best.items())

    got = {
        r["probe_seq"]: (r["dim_seq"], r["dim_ts_ms"], r["staleness_ms"])
        for r in _match_rows("k", probes, dims)
    }

    left = pd.DataFrame(
        {"pts": [t for t, _ in probes], "pseq": [s for _, s in probes]},
        dtype="int64",
    )
    right = pd.DataFrame(
        {"dts": [t for t, _, _ in dims], "dseq": [s for _, s, _ in dims]},
        dtype="int64",
    )
    merged = pd.merge_asof(
        left.sort_values("pts"),
        right.sort_values("dts"),
        left_on="pts",
        right_on="dts",
        direction="backward",
        allow_exact_matches=True,
    )
    exp = {}
    for r in merged.itertuples(index=False):
        if pd.isna(r.dseq):
            exp[int(r.pseq)] = (-1, -1, -1)
        else:
            exp[int(r.pseq)] = (int(r.dseq), int(r.dts), int(r.pts - r.dts))
    assert got == exp
