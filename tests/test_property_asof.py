"""Property-based as-of join test: random keyed time series through
asof_join across every (direction, allow_exact_matches) combination,
differenced against pandas merge_asof (the semantics the operator
claims parity with). Complements the fixed-seed matrix in
tests/test_asof.py with hypothesis-driven shapes: duplicate left
timestamps, empty sides per key, boundary-equal timestamps."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_via_flink_spark.operators.asof import asof_join

_ts = st.integers(min_value=0, max_value=40)
_key = st.integers(min_value=0, max_value=2)

scenario = st.tuples(
    st.lists(st.tuples(_key, _ts), min_size=1, max_size=20),  # left
    st.lists(st.tuples(_key, _ts), min_size=0, max_size=15),  # right
    st.sampled_from(["backward", "forward", "nearest"]),
    st.booleans(),  # allow_exact_matches
)


@given(scenario)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_random(spark, scen):
    left_rows, right_rows, direction, exact = scen
    left = pd.DataFrame(
        {
            "k": np.array([k for k, _ in left_rows], dtype="int64"),
            "lts": np.array([t for _, t in left_rows], dtype="int64"),
            "lid": np.arange(len(left_rows), dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": np.array([k for k, _ in right_rows], dtype="int64"),
            "rts": np.array([t for _, t in right_rows], dtype="int64"),
            "pay": np.arange(len(right_rows), dtype="int64"),
        }
    )
    # distinct (k, rts): merge_asof breaks timestamp ties positionally,
    # asof_join by right_seq — distinct timestamps align both
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)

    expected = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
    ).sort_values("lid")

    right_df = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k long, rts long, pay long")
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            right_df,
            key="k",
            left_ts="lts",
            right_ts="rts",
            payload_cols=["pay"],
            right_seq="pay",
            direction=direction,
            allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values("lid")
    )
    exp = expected["pay"].astype("float64").to_numpy()
    act = got["asof_pay"].astype("float64").to_numpy()
    assert len(exp) == len(act)
    for lid, e, a in zip(expected["lid"], exp, act):
        if np.isnan(e) and np.isnan(a):
            continue
        assert e == a, (direction, exact, int(lid), e, a)
