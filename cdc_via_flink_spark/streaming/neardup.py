"""Streaming near-duplicate detection (SURVEY.md X1 × ST1): MinHash
LSH over a document STREAM — the online form of the batch
minhash_lsh_neardup pipeline, for ingest-time dedup of a training
corpus (flag near-dups as documents arrive instead of re-sweeping the
corpus).

Shape: the signature + banding stage is MAP-SIDE (operators/dedup.py::
row_minhash_bands — per-row array expressions, no aggregation), so the
only stateful operator is the keeper election keyed by LSH bucket
(band, bsig): the first document seen in a bucket becomes its KEEPER;
every later arrival emits a collision record (doc_id, keeper_id) — the
candidate near-dup signal downstream verification consumes. Within one
micro-batch "first" is decided by min doc_id, so a single-batch replay
equals the batch min-per-bucket election exactly (the SQL oracle).

State per key is ONE long (the keeper id) — the smallest possible
stateful footprint; at 100 TB the key space is the distinct band
signatures of the corpus. Production would bound it with a TTL (the
dropDuplicatesWithinWatermark pattern) accepting re-admission of dups
older than the horizon; the replay keeps NoTimeout so the election is
exact for the oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

NEARDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("band", IntegerType()),
        StructField("bsig", StringType()),
        StructField("doc_id", LongType()),
        StructField("keeper_id", LongType()),
    ]
)

NEARDUP_STATE_SCHEMA = StructType([StructField("keeper", LongType())])

_OUT_COLS = [c.name for c in NEARDUP_OUTPUT_SCHEMA.fields]


def _elect(
    key: tuple[int, str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    band, bsig = key
    keeper = state.get[0] if state.exists else None
    docs = sorted(
        int(r.doc_id) for pdf in pdfs for r in pdf.itertuples(index=False)
    )
    rows = []
    for d in docs:
        if keeper is None:
            keeper = d
        elif d != keeper:
            rows.append(
                {"band": band, "bsig": bsig, "doc_id": d, "keeper_id": keeper}
            )
    state.update((keeper,))
    if rows:
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def neardup_collisions_stream(banded: DataFrame) -> DataFrame:
    """Wire a streaming banded frame (doc_id, band, bsig) into the
    keeper election. Caller starts the query."""
    return (
        banded.groupBy("band", "bsig")
        .applyInPandasWithState(
            _elect,
            outputStructType=NEARDUP_OUTPUT_SCHEMA,
            stateStructType=NEARDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .filter(F.col("doc_id").isNotNull())
    )
