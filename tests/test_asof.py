"""asof_join vs pandas merge_asof — differential test across every
(direction, allow_exact_matches, tolerance) combination on randomized
keyed time series. pandas is the semantics oracle the operator claims
parity with (operators/asof.py docstring)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cdc_via_flink_spark.operators.asof import asof_join


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    n_l, n_r = 120, 80
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n_l).astype("int64"),
            "lts": rng.integers(0, 500, n_l).astype("int64"),
            "lid": np.arange(n_l, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n_r).astype("int64"),
            "rts": rng.integers(0, 500, n_r).astype("int64"),
            # unique per (k, rts) so the right_seq tie-break matches
            # pandas' positional take-last/take-first deterministically
            "pay": np.arange(n_r, dtype="int64"),
        }
    )
    # drop duplicate (k, rts) pairs: merge_asof resolves them by input
    # position while asof_join resolves by right_seq — distinct
    # timestamps make both orders identical
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("tol", [None, 40])
def test_asof_matches_pandas(spark, direction, exact, tol):
    left, right = _frames(seed=7)
    expected = pd.merge_asof(
        left.sort_values("lts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="lts",
        right_on="rts",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
        tolerance=tol,
    ).sort_values("lid")
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key="k",
            left_ts="lts",
            right_ts="rts",
            payload_cols=["pay"],
            right_seq="pay",
            direction=direction,
            allow_exact_matches=exact,
            tolerance=tol,
        )
        .toPandas()
        .sort_values("lid")
    )
    exp = expected["pay"].astype("float64").to_numpy()
    act = got["asof_pay"].astype("float64").to_numpy()
    mismatch = [
        (int(l), e, a)
        for l, e, a in zip(expected["lid"], exp, act)
        if not (np.isnan(e) and np.isnan(a)) and e != a
    ]
    assert not mismatch, (direction, exact, tol, mismatch[:10])


def test_asof_rejects_bad_direction(spark):
    left, right = _frames(seed=1)
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key="k",
            left_ts="lts",
            right_ts="rts",
            payload_cols=["pay"],
            direction="sideways",
        )


def test_asof_nearest_single_exchange(spark):
    """NEAREST computes both propagations over one keyed shuffle:
    the plan must carry exactly one Exchange hashpartitioning(k)."""
    left, right = _frames(seed=3)
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        key="k",
        left_ts="lts",
        right_ts="rts",
        payload_cols=["pay"],
        right_seq="pay",
        direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
