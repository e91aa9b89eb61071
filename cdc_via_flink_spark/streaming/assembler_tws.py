"""Spark-4-native transaction assembler: transformWithStateInPandas.

Same ST1 semantics as streaming/assembler.py (the
applyInPandasWithState path; reference:
DebeziumTransactionReconstructor.java:131-170), re-expressed on
Spark 4's arbitrary-stateful-processing API. Why both exist:

- `applyInPandasWithState` (Spark ≥3.4): one opaque state tuple per
  key — the closest analog to the reference's single
  ``ValueState<TransactionState>`` (reference :132).
- `transformWithStateInPandas` (Spark ≥4.0): typed, composable state
  primitives. The buffered change events become a true ``ListState``
  — append is O(1) per event in RocksDB (no read-modify-write of the
  whole buffer, which is exactly the state-bloat failure mode of hot
  transactions at 100 TB), and eviction uses first-class timers
  rather than a per-key timeout timestamp.

Semantics (identical to both the batch twin and the v1 assembler):
emit on END with ≥1 buffered change; END-with-no-events dropped
(reference :159-163); events after END re-buffer; abandoned
transactions evicted by event-time timer at watermark + TTL
(documented deviation fixing the reference's unbounded state leak).

ENVIRONMENT NOTE: transformWithStateInPandas' Python worker speaks
protobuf to the JVM state server. This container lacks the `protobuf`
package, so the repo vendors a minimal clean-room wire-format shim
(vendor/protoshim, activated by vendor.proto_compat.ensure_protobuf
ONLY when the real package is absent) — with it, this path executes
here and tests/test_assembler_tws.py runs for real: the JVM's Java
protobuf parses every shim-serialized state request across a full
streaming query. On any cluster with a standard PySpark install the
real protobuf is used untouched.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from cdc_via_flink_spark.streaming.assembler import ORPHAN_TTL_MS, OUTPUT_SCHEMA

_OUT_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


class TransactionAssembler(StatefulProcessor):
    """Per-txn_id stateful processor: ListState buffer + END trigger."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        # Parallel to the reference's List<DebeziumChangeEvent>
        # (reference :174) — but appends stream into RocksDB instead of
        # rewriting the whole list per event.
        self._events = handle.getListState("events", "seq long, op string, ts_ms long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (txn_id,) = key
        buf = [(int(s), o, None if t is None else int(t)) for s, o, t in self._events.get()]
        appended: list[tuple] = []
        out_rows = []
        chunks = list(rows)
        pdf = (
            chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ).sort_values("seq")
        for r in pdf.itertuples(index=False):
            if r.kind == "change":
                ev = (
                    int(r.seq),
                    r.op,
                    None if pd.isna(r.ts_ms) else int(r.ts_ms),
                )
                buf.append(ev)
                appended.append(ev)
            elif r.kind == "txn" and r.status == "END":
                if buf:  # END with no events -> dropped (reference :159-163)
                    tss = [t for _, _, t in buf if t is not None]
                    out_rows.append(
                        {
                            "txn_id": txn_id,
                            "end_seq": int(r.seq),
                            "event_count": None
                            if pd.isna(r.event_count)
                            else int(r.event_count),
                            "n_events": len(buf),
                            "ops_concat": ",".join(o for _, o, _ in buf),
                            "first_ts_ms": min(tss) if tss else None,
                            "last_ts_ms": max(tss) if tss else None,
                        }
                    )
                    self._events.clear()
                    buf, appended = [], []

        if appended and len(appended) == len(buf):
            self._events.appendList(appended)  # pure appends: no rewrite
        elif buf and appended:
            self._events.put(buf)  # emitted mid-batch then re-buffered

        wm = timerValues.getCurrentWatermarkInMs()
        if buf and wm > 0:
            # Evict abandoned transactions (deviation from the
            # reference's leak): one timer per open key.
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(wm + ORPHAN_TTL_MS)

        if out_rows:  # no END this batch -> emit nothing for this key
            yield pd.DataFrame(out_rows, columns=_OUT_COLS)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        self._events.clear()
        return
        yield  # keep this a generator with an empty iteration

    def close(self) -> None:
        pass


def assemble_transactions_stream_tws(
    parsed: DataFrame, event_time: Column | None = None
) -> DataFrame:
    """transformWithStateInPandas twin of
    assembler.assemble_transactions_stream — same input contract
    (parse_debezium columns), same output schema, same watermark rules
    (see that function's docstring for the timestamp-less txn-row
    caveat)."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = parsed.withColumn("event_time", event_time).withWatermark(
        "event_time", "1 minute"
    )
    return (
        with_time.groupBy("txn_id")
        .transformWithStateInPandas(
            TransactionAssembler(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
        .filter(F.col("txn_id").isNotNull())
    )
