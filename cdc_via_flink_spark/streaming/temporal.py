"""Streaming temporal table join (Flink's `FOR SYSTEM_TIME AS OF` /
processing-history join) — the one join flavor the reference's stack is
famous for that SURVEY.md J5 only covers in batch form.

Semantics: a PROBE stream row (key, probe_seq, probe ts) joins the
latest BUILD-side version (key, seq, op, ts) with version_ts <=
probe_ts (inclusive, ties broken toward the highest seq). The build
side here is a CDC change stream — i.e. "enrich each fact event with
the dimension row as it was when the event happened", which is exactly
what Flink models as a temporal table function join and what the
reference's Debezium topics exist to feed.

Spark-native shape: Structured Streaming has interval joins but no
built-in event-time temporal join, so this is the sanctioned custom
path — ONE union-with-discriminator stream grouped by key feeding
`applyInPandasWithState` (same idiom as the assembler, SURVEY.md J1):

- per key, both sides buffer in GroupState;
- a probe MATURES once the event-time watermark passes its timestamp:
  no earlier build version can still arrive (it would be late and
  dropped by the same watermark), so the as-of match is final. Matured
  probes emit INCREMENTALLY on every invocation — not only at stream
  end;
- build-version state is COMPACTED on every invocation: any future
  probe has ts > watermark, so of all versions with ts <= watermark
  only the newest can ever match again — older ones are dropped. State
  per key is therefore O(unmatured probes + versions inside the
  watermark lag + 1), not O(history);
- an event-time timeout (last activity + TTL) flushes remaining
  probes and evicts the key — idle keys cannot leak state (the
  reference's unbounded-state gap, DebeziumTransactionReconstructor
  .java:141-153, fixed the same way as in assembler.py).

Scale: one shuffle (groupBy key); RocksDB holds the buffers off-heap;
matching is a sort + binary search per matured probe, O(log versions).
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

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

TEMPORAL_OUTPUT_SCHEMA = StructType(
    [
        StructField("txn_id", StringType()),
        StructField("probe_seq", LongType()),
        StructField("probe_ts_ms", LongType()),
        StructField("dim_seq", LongType()),
        StructField("dim_op", StringType()),
        StructField("dim_ts_ms", LongType()),
        StructField("staleness_ms", LongType()),
    ]
)

# Buffered per-key state: parallel arrays for each side.
TEMPORAL_STATE_SCHEMA = StructType(
    [
        StructField("p_seqs", ArrayType(LongType())),
        StructField("p_tss", ArrayType(LongType())),
        StructField("d_seqs", ArrayType(LongType())),
        StructField("d_ops", ArrayType(StringType())),
        StructField("d_tss", ArrayType(LongType())),
    ]
)

TEMPORAL_TTL_MS = 2 * 60 * 60 * 1000  # flush + evict 2 h past last activity

_OUT_COLS = [c.name for c in TEMPORAL_OUTPUT_SCHEMA.fields]


def _match_rows(key: str, probes: list[tuple[int, int]], dims: list[tuple]) -> list[dict]:
    """As-of match each (ts, seq) probe against sorted dim versions:
    the max (ts, seq) version with ts <= probe_ts; unmatched -> the
    -1/'none' null stand-ins (parity policy: no NULLs in declared
    output columns)."""
    out = []
    d_keys = [d[0] for d in dims]  # dims sorted by (ts, seq); ts list for bisect
    for p_ts, p_seq in probes:
        i = bisect.bisect_right(d_keys, p_ts)
        if i:
            d_ts, d_seq, d_op = dims[i - 1]
            out.append(
                {
                    "txn_id": key,
                    "probe_seq": p_seq,
                    "probe_ts_ms": p_ts,
                    "dim_seq": d_seq,
                    "dim_op": d_op,
                    "dim_ts_ms": d_ts,
                    "staleness_ms": p_ts - d_ts,
                }
            )
        else:
            out.append(
                {
                    "txn_id": key,
                    "probe_seq": p_seq,
                    "probe_ts_ms": p_ts,
                    "dim_seq": -1,
                    "dim_op": "none",
                    "dim_ts_ms": -1,
                    "staleness_ms": -1,
                }
            )
    return out


def _temporal(
    key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (txn_id,) = key

    if state.hasTimedOut:
        p_seqs, p_tss, d_seqs, d_ops, d_tss = (list(x) for x in state.get)
        state.remove()
        dims = sorted(zip(d_tss, d_seqs, d_ops))
        probes = sorted(zip(p_tss, p_seqs))
        rows = _match_rows(txn_id, probes, dims)
        if rows:
            yield pd.DataFrame(rows, columns=_OUT_COLS)
        return

    if state.exists:
        p_seqs, p_tss, d_seqs, d_ops, d_tss = (list(x) for x in state.get)
    else:
        p_seqs, p_tss, d_seqs, d_ops, d_tss = [], [], [], [], []

    last = max(max(p_tss, default=0), max(d_tss, default=0))
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            t = int(r.ts_ms)
            last = max(last, t)
            if r.side == "P":
                p_seqs.append(int(r.seq))
                p_tss.append(t)
            else:
                d_seqs.append(int(r.seq))
                d_ops.append(r.op)
                d_tss.append(t)

    wm = state.getCurrentWatermarkMs()
    dims = sorted(zip(d_tss, d_seqs, d_ops))

    # Incremental emission: probes STRICTLY behind the watermark are
    # final — Spark drops late rows only when strictly older than the
    # watermark, so a build-side version timestamped exactly AT the
    # watermark can still arrive; maturing a t == wm probe here would
    # emit a match that version could invalidate.
    matured = sorted((t, s) for t, s in zip(p_tss, p_seqs) if t < wm)
    if matured:
        keep = [(t, s) for t, s in zip(p_tss, p_seqs) if t >= wm]
        p_tss, p_seqs = [t for t, _ in keep], [s for _, s in keep]
        rows = _match_rows(txn_id, matured, dims)
    else:
        rows = []

    # Version compaction: of all dim versions with ts < wm only the
    # newest can match a future (ts >= wm) probe — strict for the same
    # late-row-drop boundary reason as probe maturity.
    past = [d for d in dims if d[0] < wm]
    if len(past) > 1:
        dims = past[-1:] + [d for d in dims if d[0] >= wm]
        d_tss = [d[0] for d in dims]
        d_seqs = [d[1] for d in dims]
        d_ops = [d[2] for d in dims]

    if p_seqs or d_seqs:
        state.update((p_seqs, p_tss, d_seqs, d_ops, d_tss))
        state.setTimeoutTimestamp(last + TEMPORAL_TTL_MS)
    elif state.exists:
        state.remove()

    if rows:
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def temporal_join_stream(tagged: DataFrame, event_time: Column | None = None) -> DataFrame:
    """Wire a tagged union stream (txn_id, seq, side 'P'/'D', op,
    ts_ms) into the stateful temporal join. Caller starts the query;
    probe results emit as the watermark matures them (and the TTL
    timeout flushes stragglers)."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = tagged.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return (
        with_time.groupBy("txn_id")
        .applyInPandasWithState(
            _temporal,
            outputStructType=TEMPORAL_OUTPUT_SCHEMA,
            stateStructType=TEMPORAL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
        .filter(F.col("txn_id").isNotNull())
    )
