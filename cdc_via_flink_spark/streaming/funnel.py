"""Timer-driven streaming funnel (SURVEY.md ST1/ST2 family): per-user
signup → click → purchase progression, emitted by EVENT-TIME TIMEOUT
rather than by a terminator event.

This is the capability the reference's V2 sketch gropes for with
GlobalWindows + a custom count/`END` trigger
(DebeziumTransactionReconstructorWithEventCorrelation.java:74-92):
emission decided by TIME passing, not by a marker record. The
assembler (streaming/assembler.py) emits on the END marker; here
there is no marker — a user's funnel is closed when the watermark
passes their last activity + TTL, at which point the buffered events
are folded into the funnel result and state is evicted.

Ordering correctness: funnel stages are order-sensitive (an
earlier-arriving signup changes which clicks qualify), so incremental
per-batch folding would be wrong under out-of-order arrival. The
state therefore buffers (event_type, ts_ms) pairs and the fold runs
once, at timeout, over the complete buffer — the same
buffer-then-finalize contract the reference's trigger implies, made
safe by the watermark bound. State per user is their event history
within the funnel horizon (bounded in production by the TTL eviction;
the fold is O(buffer)).

Scale: one shuffle (groupBy user_id); RocksDB holds buffers off-heap;
timers are per-key and fire in bulk when the watermark jumps.
"""

from __future__ import annotations

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

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_signup_ms", LongType()),
        StructField("first_click_ms", LongType()),
        StructField("first_purchase_ms", LongType()),
        StructField("stage", LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("etypes", ArrayType(StringType())),
        StructField("tss", ArrayType(LongType())),
    ]
)

FUNNEL_TTL_MS = 2 * 60 * 60 * 1000  # close a funnel 2 h after last activity


def _fold_funnel(etypes: list[str], tss: list[int]) -> tuple[int, int, int, int]:
    """One pass over the COMPLETE buffered history (order-insensitive:
    operates on minima, not arrival order)."""
    s_ms = min((t for e, t in zip(etypes, tss) if e == "signup"), default=None)
    c_ms = (
        min(
            (t for e, t in zip(etypes, tss) if e == "click" and t >= s_ms),
            default=None,
        )
        if s_ms is not None
        else None
    )
    p_ms = (
        min(
            (t for e, t in zip(etypes, tss) if e == "purchase" and t >= c_ms),
            default=None,
        )
        if c_ms is not None
        else None
    )
    stage = 3 if p_ms is not None else (2 if c_ms is not None else 1)
    return s_ms, -1 if c_ms is None else c_ms, -1 if p_ms is None else p_ms, stage


def _funnel(
    key: tuple[int], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cols = [c.name for c in FUNNEL_OUTPUT_SCHEMA.fields]

    if state.hasTimedOut:
        etypes, tss = (list(x) for x in state.get)
        state.remove()
        s_ms, c_ms, p_ms, stage = _fold_funnel(etypes, tss)
        if s_ms is None:  # activity but never signed up: no funnel row
            yield pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
            return
        yield pd.DataFrame(
            [
                {
                    "user_id": int(user_id),
                    "first_signup_ms": s_ms,
                    "first_click_ms": c_ms,
                    "first_purchase_ms": p_ms,
                    "stage": stage,
                }
            ],
            columns=cols,
        )
        return

    etypes, tss = (list(x) for x in state.get) if state.exists else ([], [])
    last = max(tss, default=0)
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            etypes.append(r.event_type)
            t = int(r.ts_ms)
            tss.append(t)
            last = max(last, t)
    state.update((etypes, tss))
    # Close the funnel TTL past the user's last activity. Unlike the
    # assembler's watermark-relative orphan TTL, the timeout is in
    # EVENT time, so it is valid even in the first micro-batch (when
    # the watermark is still 0) — required for finite replay, where
    # later batches may carry no rows for this key.
    state.setTimeoutTimestamp(last + FUNNEL_TTL_MS)
    yield pd.DataFrame({c: pd.Series(dtype="object") for c in cols})


def funnel_stream(events: DataFrame, event_time: Column | None = None) -> DataFrame:
    """Wire a streaming events frame (user_id, event_type, ts_ms) into
    the timer-driven funnel. Caller starts the query; results appear
    as watermark movement expires per-user timers."""
    if event_time is None:
        event_time = F.timestamp_millis(F.col("ts_ms"))
    with_time = events.withColumn("event_time", event_time).withWatermark(
        "event_time", "10 minutes"
    )
    return with_time.groupBy("user_id").applyInPandasWithState(
        _funnel,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    ).filter(F.col("user_id").isNotNull())
