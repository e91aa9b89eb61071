"""Streaming transaction assembler (SURVEY.md ST1) — the Spark-native
re-expression of the reference's KeyedCoProcessFunction
(reference: DebeziumTransactionReconstructor.java:131-170).

Mapping:
- the two keyed streams + connect (reference :71-87) become ONE parsed
  union stream grouped by txn_id feeding applyInPandasWithState — the
  union-with-discriminator idiom (SURVEY.md J1);
- ValueState<TransactionState> (reference :132) becomes the
  GroupState tuple (buffered event arrays);
- processElement1/processElement2 become one per-key batch function
  that replays rows in arrival (seq) order: buffer changes, emit a
  record per END with ≥1 buffered change (reference :156-169,
  END-with-no-events dropped via the same null-state guard);
- the reference's unbounded state leak for post-END orphans
  (reference :141-153, no timer) is FIXED here with an event-time
  timeout (watermark + horizon) that evicts abandoned transactions —
  documented deviation (SURVEY.md ST1), enabled by the watermark the
  reference declares but never consumes (reference :57-61, W1).

Scale: state per key is the open transaction's buffered events only;
emitted keys clear immediately; the RocksDB state store holds the
working set off-heap; the shuffle is the single groupBy(txn_id).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("txn_id", StringType()),
        StructField("end_seq", LongType()),
        StructField("event_count", LongType()),
        StructField("n_events", LongType()),
        StructField("ops_concat", StringType()),
        StructField("first_ts_ms", LongType()),
        StructField("last_ts_ms", LongType()),
    ]
)

# Buffered per-transaction state: parallel arrays (seq, op, ts_ms).
STATE_SCHEMA = StructType(
    [
        StructField("seqs", ArrayType(LongType())),
        StructField("ops", ArrayType(StringType())),
        StructField("tss", ArrayType(LongType())),
    ]
)

ORPHAN_TTL_MS = 10 * 60 * 1000  # evict abandoned txns 10 min past watermark

_OUT_COLS = [c.name for c in OUTPUT_SCHEMA.fields]


def _assemble(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (txn_id,) = key

    if state.hasTimedOut:
        # Orphan eviction (deviation from the reference's leak): drop
        # buffered changes that never saw an END. Yield nothing — an
        # empty iterator is cheaper than materializing an empty frame
        # per evicted key.
        state.remove()
        return

    seqs: list[int]
    ops: list[str]
    tss: list[Any]
    if state.exists:
        seqs, ops, tss = (list(x) for x in state.get)
    else:
        seqs, ops, tss = [], [], []

    out_rows = []
    chunks = list(pdfs)
    # single-chunk groups are the overwhelmingly common case: skip the
    # pd.concat allocation (it costs ~as much as the whole group loop)
    rows = (chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)).sort_values("seq")
    for r in rows.itertuples(index=False):
        if r.kind == "change":
            seqs.append(int(r.seq))
            ops.append(r.op)
            tss.append(None if pd.isna(r.ts_ms) else int(r.ts_ms))
        elif r.kind == "txn" and r.status == "END":
            if seqs:  # END with no buffered events -> dropped (reference :159-163)
                valid_ts = [t for t in tss if t is not None]
                out_rows.append(
                    {
                        "txn_id": txn_id,
                        "end_seq": int(r.seq),
                        "event_count": None
                        if pd.isna(r.event_count)
                        else int(r.event_count),
                        "n_events": len(seqs),
                        "ops_concat": ",".join(ops),
                        "first_ts_ms": min(valid_ts) if valid_ts else None,
                        "last_ts_ms": max(valid_ts) if valid_ts else None,
                    }
                )
                seqs, ops, tss = [], [], []

    if seqs:
        state.update((seqs, ops, tss))
        if state.getCurrentWatermarkMs() > 0:
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ORPHAN_TTL_MS)
    elif state.exists:
        state.remove()

    if out_rows:  # keys without an END this batch emit nothing at all
        yield pd.DataFrame(out_rows, columns=_OUT_COLS)


def assemble_transactions_stream(
    parsed: DataFrame, event_time: Column | None = None
) -> DataFrame:
    """Wire the parsed union stream (operators.debezium.parse_debezium
    columns) into the stateful assembler. Input must be a streaming
    DataFrame; caller starts the query (typically with an availableNow
    or processAllAvailable replay in tests).

    `event_time`: watermark column. Debezium txn-metadata events carry
    NO timestamp (reference :109-114, SURVEY W2), and with an
    event-time timeout Spark drops rows at-or-behind the watermark as
    late — so timestamp-less rows must NOT default to epoch 0 (they
    would all be "late" and silently vanish). Production maps the
    Kafka ingest `timestamp` column; replay harnesses pass a monotone
    ingest surrogate. Default: change-event ts, txn rows at the
    maximum representable-safe future is avoided — callers must
    provide a real column when txn rows exist."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = parsed.withColumn("event_time", event_time).withWatermark(
        "event_time", "1 minute"
    )  # reference W1 (:57-61), load-bearing here
    return (
        with_time.groupBy("txn_id")
        .applyInPandasWithState(
            _assemble,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .filter(F.col("txn_id").isNotNull())
    )
