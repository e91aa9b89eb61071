"""State-store-native dedup ingest gate — transformWithStateInPandas.

The Spark-4 twin of streaming/ingest_gate.py (VERDICT r10 #4: port one
index-kernel maintainer to the modern stateful API). The kernel form
maintains the gate as an EXTERNAL artifact — parquet bitmap + digest
corpus, crash-atomic pointer commits — because that artifact outlives
the query and is shared with batch jobs. The transformWithState form
inverts the design: the RocksDB state store IS the gate. Keyed by
digest, each key holds one ValueState `first_ep` (the epoch that
admitted the digest; -1 for pre-seeded corpus members), so

  - the Bloom bitmap disappears: RocksDB maintains its own per-SST
    bloom filters, giving the same definite-miss short-circuit the
    explicit bitmap bought the parquet design, without the repo
    maintaining it;
  - the corpus digest join disappears: membership is the point lookup
    `seen.exists()` on the grouping key;
  - the corpus seed rides Spark's first-class initial-state channel
    (`initialState=corpus.groupBy("digest")` +
    ``handleInitialState``), not a side-channel parquet read;
  - exactly-once epochs come from the state-store checkpoint, not the
    kernel's pointer protocol.

Verdict semantics are IDENTICAL to the kernel gate (the declared
query's oracle states them as plain SQL): a batch row is exact_dup iff
its digest is in the seeded corpus or was admitted by an EARLIER
epoch — same-epoch duplicates are all admitted (the kernel gate
computes verdicts against base ∪ committed deltas, which excludes the
current batch; `handleInputRows` replicates that by reading state
once per key before updating it). `first_seen_ep` surfaces the state
content itself (-1 / admitting epoch / null), so the oracle checks
not just the verdicts but the state machine.

Trade-off (why both forms exist, mirroring assembler vs
assembler_tws): the kernel artifact is readable by ANY batch session
and survives independent of a checkpoint; the state-store gate is
faster per event (no per-epoch parquet delta write, no bitmap merge
scan) but its state is private to the streaming checkpoint. STATUS.md
records the measured steady-state comparison.
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

GATE_TWS_OUTPUT = "doc_id long, ep long, exact_dup boolean, first_seen_ep long"
_OUT_COLS = ["doc_id", "ep", "exact_dup", "first_seen_ep"]

CORPUS_EP = -1  # first_ep marker for pre-seeded corpus digests


def digest_col(text_col: str) -> Column:
    """Same digest family as the kernel gate (bloom_maintenance) so
    the two backends are drop-in comparable."""
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text

    return token_int(normalize_text(F.col(text_col)))


class DigestGate(StatefulProcessor):
    """Per-digest gate: ValueState first_ep; verdicts read state
    BEFORE the batch updates it (committed-epochs-only semantics)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "first_ep long")

    def handleInitialState(
        self, key: tuple, initialState: pd.DataFrame, timerValues: TimerValues
    ) -> None:
        self._seen.update((CORPUS_EP,))

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        existing = self._seen.get() if self._seen.exists() else None
        first_ep = None if existing is None else int(existing[0])
        out = []
        min_ep: int | None = None
        for pdf in rows:
            for r in pdf.itertuples(index=False):
                ep = int(r.ep)
                min_ep = ep if min_ep is None else min(min_ep, ep)
                out.append(
                    {
                        "doc_id": int(r.doc_id),
                        "ep": ep,
                        "exact_dup": first_ep is not None,
                        "first_seen_ep": first_ep,
                    }
                )
        if first_ep is None and min_ep is not None:
            self._seen.update((min_ep,))
        if out:
            yield pd.DataFrame(out, columns=_OUT_COLS)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        return
        yield  # keep this a generator with an empty iteration

    def close(self) -> None:
        pass


def gated_dedup_stream_tws(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ep_col: str = "ep",
) -> DataFrame:
    """Streaming verdict frame (GATE_TWS_OUTPUT) for ``new_docs``
    (a streaming frame carrying id, text and an epoch column) against
    the state-store gate seeded from the batch ``corpus`` frame.
    Requires the RocksDB state store provider (a tWS precondition —
    callers set spark.sql.streaming.stateStore.providerClass)."""
    keyed = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(ep_col).cast("long").alias("ep"),
        digest_col(text_col).alias("digest"),
    )
    seed = corpus.select(digest_col(text_col).alias("digest")).distinct()
    return keyed.groupBy("digest").transformWithStateInPandas(
        DigestGate(),
        outputStructType=GATE_TWS_OUTPUT,
        outputMode="append",
        timeMode="none",
        initialState=seed.groupBy("digest"),
    )
