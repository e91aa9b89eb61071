"""Streaming SCD Type-2 maintenance — the warehouse-history sink of a
CDC pipeline, kept current as changes ARRIVE (the live form of the
batch cdc_scd2_history query): per key, each incoming change CLOSES
the previously-open version (valid_to = new valid_from - 1, emitted
immediately) and opens itself; still-open versions emit with a NULL
valid_to / is_current=1 when the TTL timer closes the key.

State per key is ONE open version (seq, op, ts_ms) — constant, not
history-sized; closed intervals leave the operator the moment they
are determined. Input is assumed per-key time-ordered (the guarantee
keyed Kafka production gives the reference's consumer, readme.md:1;
replays stage time-ordered files). One shuffle: groupBy(txn_id).

Out-of-order guard: rows are sorted within a batch, but a row arriving
in a LATER batch with ts_ms before the open version's valid_from —
which the watermark tolerance admits — would otherwise close the open
version with an inverted interval (valid_to < valid_from) and corrupt
the history silently. Such rows are routed to a DEAD-LETTER side
output instead (is_current = -1, the S4 side-output discriminator:
valid_from_ms = the late row's ts, valid_to_ms = the open version's
valid_from it collided with); the open version is untouched. History
consumers filter is_current >= 0.

EQUAL-timestamp arrivals (t == open valid_from) are deliberately NOT
dead-lettered: the batch oracle (cdc_scd2_history:
lead(ts_ms) OVER (ORDER BY ts_ms, seq) - 1) closes the earlier-seq
row of a tie with valid_to = t - 1 = valid_from - 1, i.e. batch SCD2
itself renders a same-instant supersession as a zero/negative-width
interval — so the streaming path does the same (within a batch the
ts,seq sort makes the lower-seq row close first; cross-batch the open
version closes). Dead-lettering ties would diverge from the batch
history under replay. Pinned by
tests/test_stream_scd2.py::test_scd2_equal_ts_tie_matches_batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("txn_id", StringType()),
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("valid_from_ms", LongType()),
        StructField("valid_to_ms", LongType()),
        StructField("is_current", IntegerType()),
    ]
)

SCD2_STATE_SCHEMA = StructType(
    [
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
    ]
)

SCD2_TTL_MS = 2 * 60 * 60 * 1000

_OUT_COLS = [f.name for f in SCD2_OUTPUT_SCHEMA.fields]


def _make_scd2(dead_letter_ties: bool):
    """Build the keyed SCD2 co-process. ``dead_letter_ties`` selects
    the STRICT tie policy (VERDICT r6 #6, the as-of operator's option
    style): a row whose ts EQUALS the open version's valid_from is
    routed to the dead-letter side output instead of closing it with
    the zero/negative-width interval the batch oracle renders. Default
    False — the documented batch-parity policy pinned by
    test_scd2_equal_ts_tie_matches_batch; True is for sources where a
    same-instant supersession can only mean clock corruption."""

    def fn(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _scd2_impl(key, pdfs, state, dead_letter_ties)

    return fn


def _scd2_impl(
    key: tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    dead_letter_ties: bool = False,
) -> Iterator[pd.DataFrame]:
    (txn_id,) = key

    if state.hasTimedOut:
        seq, op, ts = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "txn_id": txn_id,
                    "seq": int(seq),
                    "op": op,
                    "valid_from_ms": int(ts),
                    "valid_to_ms": None,
                    "is_current": 1,
                }
            ],
            columns=_OUT_COLS,
        )
        return

    open_v = tuple(state.get) if state.exists else None
    rows = []
    chunks = list(pdfs)
    pdf = (
        chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    ).sort_values(["ts_ms", "seq"])
    last = 0
    for r in pdf.itertuples(index=False):
        t = int(r.ts_ms)
        last = max(last, t)
        if open_v is not None and (
            t < open_v[2] or (dead_letter_ties and t == open_v[2])
        ):
            # cross-batch out-of-order arrival: closing the open
            # version would invert the interval — dead-letter it
            # (strict mode also rejects exact ties, see _make_scd2)
            rows.append(
                {
                    "txn_id": txn_id,
                    "seq": int(r.seq),
                    "op": r.op,
                    "valid_from_ms": t,
                    "valid_to_ms": int(open_v[2]),
                    "is_current": -1,
                }
            )
            continue
        if open_v is not None:
            rows.append(
                {
                    "txn_id": txn_id,
                    "seq": int(open_v[0]),
                    "op": open_v[1],
                    "valid_from_ms": int(open_v[2]),
                    "valid_to_ms": t - 1,
                    "is_current": 0,
                }
            )
        open_v = (int(r.seq), r.op, t)

    if open_v is not None:
        state.update(open_v)
        state.setTimeoutTimestamp(last + SCD2_TTL_MS)

    if rows:
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def scd2_stream(
    changes: DataFrame,
    event_time: Column | None = None,
    dead_letter_ties: bool = False,
) -> DataFrame:
    """Wire a streaming change frame (txn_id, seq, op, ts_ms) into the
    SCD2 maintainer. Caller starts the query. ``dead_letter_ties``
    selects the strict equal-timestamp policy (see _make_scd2);
    default keeps batch parity."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = changes.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return (
        with_time.groupBy("txn_id")
        .applyInPandasWithState(
            _make_scd2(dead_letter_ties),
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .filter(F.col("txn_id").isNotNull())
    )


# --- watermark-buffered mode (VERDICT r5 #4) -------------------------
#
# The eager maintainer above OPENS a version the moment its row
# arrives, so a row admitted by the watermark but arriving a batch
# after a newer row must be dead-lettered (closing the open version
# would invert the interval). The BUFFERED mode below instead holds
# rows in state until the event-time watermark passes them (the
# streaming/temporal.py maturity pattern): a version only opens once
# no earlier-timestamped row can still arrive, so admitted-late rows
# INTEGRATE into the history and the dead-letter path vanishes —
# by construction every new arrival has ts >= the previous watermark
# > every already-opened version's valid_from (Spark drops rows
# strictly older than the watermark before the stateful operator).
#
# Trade-off vs the eager mode: closures emit up to one watermark lag
# later, and state per key is O(rows inside the lag) instead of O(1).
# Both modes replay to the identical batch history on in-order input;
# on out-of-order (in-tolerance) input the buffered mode matches the
# batch oracle exactly while the eager mode dead-letters.

SCD2_BUF_STATE_SCHEMA = StructType(
    [
        StructField("o_seq", LongType()),
        StructField("o_op", StringType()),
        StructField("o_ts", LongType()),  # -1 = no open version yet
        StructField("b_seqs", ArrayType(LongType())),
        StructField("b_ops", ArrayType(StringType())),
        StructField("b_tss", ArrayType(LongType())),
    ]
)


def _close_chain(txn_id: str, open_v, ordered, final: bool) -> tuple[list, tuple]:
    """Run the close/open chain over (ts, seq, op)-sorted rows; returns
    (emitted closures, new open version). With final=True the last
    open version emits as current."""
    rows = []
    for t, seq, op in ordered:
        if open_v is not None:
            rows.append(
                {
                    "txn_id": txn_id,
                    "seq": int(open_v[0]),
                    "op": open_v[1],
                    "valid_from_ms": int(open_v[2]),
                    "valid_to_ms": int(t) - 1,
                    "is_current": 0,
                }
            )
        open_v = (int(seq), op, int(t))
    if final and open_v is not None:
        rows.append(
            {
                "txn_id": txn_id,
                "seq": int(open_v[0]),
                "op": open_v[1],
                "valid_from_ms": int(open_v[2]),
                "valid_to_ms": None,
                "is_current": 1,
            }
        )
    return rows, open_v


def _make_scd2_buffered(ttl_ms: int):
    """Build the buffered maintainer with a caller-chosen TTL.

    The TTL is a SEMANTIC knob, not just an eviction tuning: the TTL
    flush FINALIZES a key (emits its open version as current and drops
    state), so a key that revives after a flush starts a fresh chain —
    two is_current=1 rows, which diverges from a batch lead() oracle.
    In append mode that earlier current row cannot be retracted, so
    the operator contract is: choose ttl_ms LONGER than the longest
    quiet gap a live key can have (the eager maintainer shares this
    contract; its single-file declared replay never advances the
    watermark mid-stream, while the buffered declared replay is
    multi-batch and therefore passes a TTL above the fixture's whole
    time span — correctness by construction, not by data luck)."""

    def _scd2_buffered(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (txn_id,) = key

        if state.hasTimedOut:
            o_seq, o_op, o_ts, b_seqs, b_ops, b_tss = state.get
            state.remove()
            open_v = (o_seq, o_op, o_ts) if o_ts >= 0 else None
            ordered = sorted(zip(b_tss, b_seqs, b_ops))
            rows, _ = _close_chain(txn_id, open_v, ordered, final=True)
            if rows:
                yield pd.DataFrame(rows, columns=_OUT_COLS)
            return

        if state.exists:
            o_seq, o_op, o_ts, b_seqs, b_ops, b_tss = state.get
            open_v = (o_seq, o_op, o_ts) if o_ts >= 0 else None
            buf = list(zip(b_tss, b_seqs, b_ops))
        else:
            open_v, buf = None, []

        last = max([t for t, _, _ in buf], default=open_v[2] if open_v else 0)
        for pdf in pdfs:
            for r in pdf.itertuples(index=False):
                t = int(r.ts_ms)
                last = max(last, t)
                buf.append((t, int(r.seq), r.op))

        # maturity boundary is STRICT (t < wm), matching temporal.py: a
        # row timestamped exactly AT the watermark can still arrive, so
        # opening a t == wm version now could later invert against it.
        wm = state.getCurrentWatermarkMs()
        matured = sorted(r for r in buf if r[0] < wm)
        buf = [r for r in buf if r[0] >= wm]
        rows, open_v = _close_chain(txn_id, open_v, matured, final=False)

        state.update(
            (
                open_v[0] if open_v else -1,
                open_v[1] if open_v else "",
                open_v[2] if open_v else -1,
                [r[1] for r in buf],
                [r[2] for r in buf],
                [r[0] for r in buf],
            )
        )
        state.setTimeoutTimestamp(last + ttl_ms)

        if rows:
            yield pd.DataFrame(rows, columns=_OUT_COLS)

    return _scd2_buffered


def scd2_stream_buffered(
    changes: DataFrame,
    event_time: Column | None = None,
    ttl_ms: int = SCD2_TTL_MS,
) -> DataFrame:
    """Watermark-buffered SCD2 maintainer: identical output contract to
    scd2_stream minus the dead-letter rows — admitted-late arrivals
    integrate into the history instead (see module comment). ttl_ms
    must exceed the longest quiet gap a live key can have (see
    _make_scd2_buffered — a TTL flush finalizes the key)."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = changes.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return (
        with_time.groupBy("txn_id")
        .applyInPandasWithState(
            _make_scd2_buffered(ttl_ms),
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_BUF_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .filter(F.col("txn_id").isNotNull())
    )
