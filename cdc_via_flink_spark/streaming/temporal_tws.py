"""transformWithStateInPandas twin of streaming/temporal.py — the
temporal table join on Spark 4's typed-state API, completing dual-API
coverage for BOTH stateful operators in this engine (the assembler has
the same pair: assembler.py / assembler_tws.py; see that module's
docstring for why both APIs exist and the protobuf-shim environment
note).

The typed primitives fit this operator even better than the
assembler: the two sides become two true ListStates — the common case
(rows arrive, nothing matures yet) is PURE APPENDS into RocksDB, no
read-modify-write of the buffers; the full rewrite (`put`) happens
only when the watermark actually matures probes or compacts dim
versions. Eviction and the final flush are a first-class event-time
timer instead of a per-key timeout timestamp.

Semantics are identical to the applyInPandasWithState path — both
declared queries share one SQL oracle — and pinned against each other
by tests/test_temporal.py.
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

from cdc_via_flink_spark.streaming.temporal import (
    TEMPORAL_OUTPUT_SCHEMA,
    TEMPORAL_TTL_MS,
    _match_rows,
)

_OUT_COLS = [f.name for f in TEMPORAL_OUTPUT_SCHEMA.fields]


class TemporalJoiner(StatefulProcessor):
    """Per-key temporal as-of matcher: two ListStates + one timer."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._probes = handle.getListState("probes", "seq long, ts_ms long")
        self._dims = handle.getListState("dims", "seq long, op string, ts_ms long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (txn_id,) = key
        probes = [(int(t), int(s)) for s, t in self._probes.get()]
        dims = [(int(t), int(s), o) for s, o, t in self._dims.get()]
        new_p: list[tuple] = []
        new_d: list[tuple] = []
        for pdf in rows:
            for r in pdf.itertuples(index=False):
                t = int(r.ts_ms)
                if r.side == "P":
                    new_p.append((t, int(r.seq)))
                else:
                    new_d.append((t, int(r.seq), r.op))
        probes += new_p
        dims = sorted(dims + new_d)

        wm = timerValues.getCurrentWatermarkInMs()
        # STRICT boundary: Spark's late-row filter drops only rows
        # strictly older than the watermark, so a dim version at
        # exactly wm can still arrive — probes at wm are not final and
        # the newest dim version strictly behind wm must survive
        # compaction (mirrors streaming/temporal.py).
        matured = sorted(p for p in probes if p[0] < wm)
        out = _match_rows(txn_id, matured, dims) if matured else []
        keep_p = [p for p in probes if p[0] >= wm]

        past = [d for d in dims if d[0] < wm]
        compacted = len(past) > 1
        if compacted:
            dims = past[-1:] + [d for d in dims if d[0] >= wm]

        # Fast path: nothing matured/compacted -> pure RocksDB appends.
        if not matured and new_p:
            self._probes.appendList([(s, t) for t, s in new_p])
        elif matured:
            if keep_p:
                self._probes.put([(s, t) for t, s in keep_p])
            else:
                self._probes.clear()
        if not compacted and new_d:
            self._dims.appendList([(s, o, t) for t, s, o in new_d])
        elif compacted:
            self._dims.put([(s, o, t) for t, s, o in dims])

        if keep_p or dims:
            last = max([p[0] for p in keep_p] + [d[0] for d in dims])
            for tm in self._handle.listTimers():
                self._handle.deleteTimer(tm)
            self._handle.registerTimer(last + TEMPORAL_TTL_MS)

        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (txn_id,) = key
        probes = sorted((int(t), int(s)) for s, t in self._probes.get())
        dims = sorted((int(t), int(s), o) for s, o, t in self._dims.get())
        self._probes.clear()
        self._dims.clear()
        out = _match_rows(txn_id, probes, dims)
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    def close(self) -> None:
        pass


def temporal_join_stream_tws(
    tagged: DataFrame, event_time: Column | None = None
) -> DataFrame:
    """Wire the tagged union stream (txn_id, seq, side, op, ts_ms)
    into the tWS temporal joiner — same contract as
    temporal.temporal_join_stream."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = tagged.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return (
        with_time.groupBy("txn_id")
        .transformWithStateInPandas(
            TemporalJoiner(),
            outputStructType=TEMPORAL_OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
        .filter(F.col("txn_id").isNotNull())
    )
