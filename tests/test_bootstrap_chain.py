"""Deterministic edge cases for the r11 CDC bootstrap family — the
oracle gate only proves equivalence on whatever the fixture happens to
contain, so the load-bearing corners are pinned on a hand-built events
table: deleted-at-P keys (tombstone carry + suffix resurrection),
out-of-order timestamps (prefix winner despite suffix activity), and
suffix-born keys (no snapshot record)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from cdc_via_flink_spark.plans.registry import load_all

SPECS = load_all()


def _mk_events(spark, path):
    """Change log with seq envelope [0, 100] => P = 50.

    user 1: c@0, d@10 (deleted at P), u@60  -> suffix resurrects
    user 2: c@2, d@12                       -> deleted at P, no suffix
    user 3: c@4 ts=9000 (LATE ts), u@70 ts=100 -> prefix stays winner
    user 4: c@100 only                      -> born after the snapshot
    """

    def ts(ms):
        return dt.datetime(2024, 1, 1) + dt.timedelta(milliseconds=ms)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (0, ts(1000), 1, "signup", 0.0, '{"k": 1}'),
        (10, ts(2000), 1, "delete", 0.0, '{"k": 1}'),
        (60, ts(3000), 1, "click", 0.0, '{"k": 11}'),
        (2, ts(1000), 2, "signup", 0.0, '{"k": 2}'),
        (12, ts(5000), 2, "delete", 0.0, '{"k": 2}'),
        (4, ts(9000), 3, "signup", 0.0, '{"k": 3}'),
        (70, ts(100), 3, "click", 0.0, '{"k": 33}'),
        (100, ts(4000), 4, "signup", 0.0, '{"k": 4}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "events.parquet")
    )


@pytest.fixture()
def fixture_dir(spark, tmp_path):
    d = str(tmp_path / "sfboot")
    os.makedirs(d)
    _mk_events(spark, d)
    return d


def test_batch_chain_edges(spark, fixture_dir):
    out = {
        r["txn_id"]: r
        for r in SPECS["cdc_bootstrap_snapshot_chain"]
        .fn(spark, fixture_dir)
        .collect()
    }
    assert set(out) == {"txn-1", "txn-2", "txn-3", "txn-4"}
    # suffix resurrection after a deleted-at-P key
    r1 = out["txn-1"]
    assert (r1["last_seen_op"], r1["final_after"]) == ("u", '{"k": 11}')
    assert r1["n_suffix_events"] == 1 and r1["snapshot_present"]
    # deleted at P, untouched since: consumer sees the snapshot 'r'
    # record with a NULL image (tombstone semantics)
    r2 = out["txn-2"]
    assert (r2["last_seen_op"], r2["final_after"]) == ("r", None)
    assert r2["n_suffix_events"] == 0 and r2["snapshot_present"]
    # out-of-order ts: the prefix row stays the last WRITER even
    # though the suffix has activity — op masks to 'r'
    r3 = out["txn-3"]
    assert (r3["last_seen_op"], r3["final_after"]) == ("r", '{"k": 3}')
    assert r3["final_ts_ms"] % 100000 == 9000  # the late prefix ts wins
    assert r3["n_suffix_events"] == 1
    # born after the snapshot: no 'r' record exists for it
    r4 = out["txn-4"]
    assert (r4["last_seen_op"], r4["snapshot_present"]) == ("c", False)


def test_stream_chain_edges(spark, fixture_dir):
    out = {
        r["txn_id"]: r
        for r in SPECS["stream_bootstrap_snapshot_chain"]
        .fn(spark, fixture_dir)
        .collect()
    }
    # txn-2's winner is its tombstone -> filtered from the state table;
    # txn-1's tombstone was OVERWRITTEN by the suffix update
    assert set(out) == {"txn-1", "txn-3", "txn-4"}
    assert out["txn-1"]["after"] == '{"k": 11}'
    assert out["txn-1"]["op"] == "u"
    # out-of-order: the late-ts prefix image survives the merge, op 'r'
    assert out["txn-3"]["after"] == '{"k": 3}'
    assert out["txn-3"]["op"] == "r"
    assert out["txn-4"]["op"] == "c"


def test_chunked_chain_matches_single(spark, fixture_dir):
    """The chunked waves and the single-position chain agree on the
    final images (positions differ, payloads must not)."""
    single = {
        r["txn_id"]: r["final_after"]
        for r in SPECS["cdc_bootstrap_snapshot_chain"]
        .fn(spark, fixture_dir)
        .collect()
    }
    chunked = {
        r["txn_id"]: r["final_after"]
        for r in SPECS["cdc_incremental_snapshot_chunks"]
        .fn(spark, fixture_dir)
        .collect()
    }
    assert single == chunked
