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


def _scd2(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
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
        if open_v is not None and t < open_v[2]:
            # cross-batch out-of-order arrival: closing the open
            # version would invert the interval — dead-letter it
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


def scd2_stream(changes: DataFrame, event_time: Column | None = None) -> DataFrame:
    """Wire a streaming change frame (txn_id, seq, op, ts_ms) into the
    SCD2 maintainer. Caller starts the query."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = changes.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return (
        with_time.groupBy("txn_id")
        .applyInPandasWithState(
            _scd2,
            outputStructType=SCD2_OUTPUT_SCHEMA,
            stateStructType=SCD2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .filter(F.col("txn_id").isNotNull())
    )
