"""Streaming SCD2 maintainer (streaming/scd2.py): versions close
ACROSS micro-batch boundaries (the open version lives in state), and
the TTL timer emits current versions with NULL valid_to."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _run_to_memory,
    _stage_ordered_files,
)
from cdc_via_flink_spark.streaming.scd2 import scd2_stream

SCHEMA = "txn_id string, seq long, op string, ts_ms long"
BASE = 1_000_000_000_000
DAY = 86_400_000


def test_scd2_versions_close_across_batches(spark):
    b1 = [("k", 1, "c", BASE), ("k", 2, "u", BASE + 1000)]
    b2 = [("k", 3, "u", BASE + 5000)]  # closes seq 2 across the boundary
    s1 = [("flush", -1, "c", BASE + 10 * DAY)]
    s2 = [("flush", -2, "c", BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "scd2_unit")
    _stage_ordered_files(spark, frames, dest)
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(scd2_stream(sch), "append")
    got = {
        r["seq"]: (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        for r in out.filter(F.col("txn_id") == "k").collect()
    }
    assert got == {
        1: (BASE, BASE + 999, 0),
        2: (BASE + 1000, BASE + 4999, 0),  # closed by a LATER batch
        3: (BASE + 5000, None, 1),  # flushed current by the TTL timer
    }


def test_scd2_strict_tie_policy_dead_letters(spark):
    """dead_letter_ties=True (VERDICT r6 #6): an EQUAL-timestamp
    arrival — within a batch or across the boundary — routes to the
    dead-letter side output instead of closing the open version with
    the zero/negative-width interval batch parity renders. The default
    policy is unchanged (test_scd2_equal_ts_tie_matches_batch)."""
    # key "j": within-batch tie; key "k": cross-batch tie
    b1 = [("j", 1, "c", BASE), ("j", 2, "u", BASE), ("k", 1, "c", BASE)]
    b2 = [("k", 2, "u", BASE)]
    s1 = [("flush", -1, "c", BASE + 10 * DAY)]
    s2 = [("flush", -2, "c", BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "scd2_tie_strict_unit")
    _stage_ordered_files(spark, frames, dest)
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(scd2_stream(sch, dead_letter_ties=True), "append")
    got = {
        (r["txn_id"], r["seq"]): (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        for r in out.filter(F.col("txn_id").isin("j", "k")).collect()
    }
    # the tie row dead-letters (is_current -1, valid_to = the open
    # version's valid_from it collided with); the open version stays
    # and flushes current via the TTL timer
    assert got == {
        ("j", 1): (BASE, None, 1),
        ("j", 2): (BASE, BASE, -1),
        ("k", 1): (BASE, None, 1),
        ("k", 2): (BASE, BASE, -1),
    }


def test_scd2_cross_batch_out_of_order_dead_letters(spark):
    """A row arriving in a LATER batch with ts before the open
    version's valid_from (admitted by the watermark tolerance) must
    NOT close the open version with an inverted interval: it routes to
    the dead-letter side output (is_current = -1) and the version
    history stays intact."""
    b1 = [("k", 1, "c", BASE), ("k", 2, "u", BASE + 5000)]
    # arrives a batch later but timestamped BEFORE seq 2's valid_from
    b2 = [("k", 3, "u", BASE + 2000)]
    b3 = [("k", 4, "u", BASE + 9000)]
    s1 = [("flush", -1, "c", BASE + 10 * DAY)]
    s2 = [("flush", -2, "c", BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2, b3, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "scd2_ooo_unit")
    _stage_ordered_files(spark, frames, dest)
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(scd2_stream(sch), "append")
    rows = out.filter(F.col("txn_id") == "k").collect()
    dead = [r for r in rows if r["is_current"] == -1]
    hist = {
        r["seq"]: (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        for r in rows
        if r["is_current"] >= 0
    }
    # the late row is dead-lettered with the collision recorded
    assert [(r["seq"], r["valid_from_ms"], r["valid_to_ms"]) for r in dead] == [
        (3, BASE + 2000, BASE + 5000)
    ]
    # history is uncorrupted: no inverted intervals, seq 2 closed by seq 4
    assert hist == {
        1: (BASE, BASE + 4999, 0),
        2: (BASE + 5000, BASE + 8999, 0),
        4: (BASE + 9000, None, 1),
    }
    assert all(
        f <= (t if t is not None else f) for f, t, _ in hist.values()
    )


def test_scd2_buffered_integrates_admitted_late_rows(spark):
    """Watermark-buffered mode (VERDICT r5 #4): the same cross-batch
    out-of-order replay that the eager maintainer dead-letters must
    INTEGRATE into the history — versions open only once matured, so
    the late-but-admitted seq 3 slots between seq 1 and seq 2 exactly
    as the batch lead() oracle orders them, and no is_current = -1
    rows exist at all."""
    from cdc_via_flink_spark.streaming.scd2 import scd2_stream_buffered

    b1 = [("k", 1, "c", BASE), ("k", 2, "u", BASE + 5000)]
    b2 = [("k", 3, "u", BASE + 2000)]  # out-of-order, inside tolerance
    b3 = [("k", 4, "u", BASE + 9000)]
    s1 = [("flush", -1, "c", BASE + 10 * DAY)]
    s2 = [("flush", -2, "c", BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2, b3, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "scd2_buf_unit")
    _stage_ordered_files(spark, frames, dest)
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(scd2_stream_buffered(sch), "append")
    rows = out.filter(F.col("txn_id") == "k").collect()
    assert all(r["is_current"] >= 0 for r in rows)  # no dead letters
    got = {
        r["seq"]: (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        for r in rows
    }
    # the batch lead() history over ALL four rows, late one integrated
    assert got == {
        1: (BASE, BASE + 1999, 0),
        3: (BASE + 2000, BASE + 4999, 0),
        2: (BASE + 5000, BASE + 8999, 0),
        4: (BASE + 9000, None, 1),
    }


def test_scd2_equal_ts_tie_matches_batch(spark):
    """EQUAL-timestamp supersessions are kept (NOT dead-lettered), both
    within a batch and across the batch boundary, because the batch
    oracle (cdc_scd2_history: lead(ts_ms) OVER (ORDER BY ts_ms, seq)-1)
    itself closes the earlier-seq row of a tie at valid_to = t-1.
    Streaming must replay to the identical history (ADVICE r5)."""
    # key "j": within-batch tie; key "k": cross-batch tie
    b1 = [("j", 1, "c", BASE), ("j", 2, "u", BASE), ("k", 1, "c", BASE)]
    b2 = [("k", 2, "u", BASE)]
    s1 = [("flush", -1, "c", BASE + 10 * DAY)]
    s2 = [("flush", -2, "c", BASE + 20 * DAY)]
    frames = [
        spark.createDataFrame(r, schema=SCHEMA) for r in (b1, b2, s1, s2)
    ]
    dest = os.path.join(STAGE_ROOT, "scd2_tie_unit")
    _stage_ordered_files(spark, frames, dest)
    sch = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    out = _run_to_memory(scd2_stream(sch), "append")
    got = {
        (r["txn_id"], r["seq"]): (r["valid_from_ms"], r["valid_to_ms"], r["is_current"])
        for r in out.filter(F.col("txn_id").isin("j", "k")).collect()
    }
    # the batch window semantics: lower-seq row of the tie closes at t-1
    assert got == {
        ("j", 1): (BASE, BASE - 1, 0),
        ("j", 2): (BASE, None, 1),
        ("k", 1): (BASE, BASE - 1, 0),
        ("k", 2): (BASE, None, 1),
    }
