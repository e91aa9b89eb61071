"""Upsert sink (streaming/upsert.py): multi-batch replay materializes
exactly the latest row per key, honoring cross-batch ordering and
delete tombstones."""

from __future__ import annotations

from cdc_via_flink_spark.operators.debezium import parse_debezium
from cdc_via_flink_spark.streaming.sources import ENVELOPE_STREAM_SCHEMA
from cdc_via_flink_spark.streaming.upsert import (
    read_latest_snapshot,
    upsert_latest_state_query,
)
from tests.test_streaming_infra import _stage_file


def _chg(txn, ts, op, after='"{}"'):
    return (
        f'{{"payload":{{"op":"{op}","ts_ms":{ts},'
        f'"transaction":{{"id":"{txn}"}},"after":{after}}}}}'
    )


def test_upsert_latest_state_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: t1 created, t2 created
    _stage_file(
        spark,
        [(1, _chg("t1", 1000, "c", '"{\\"v\\": 1}"')), (2, _chg("t2", 1500, "c"))],
        src, "0", 1_000_000_000,
    )
    # batch 1: t1 updated (newer), t2 deleted, t3 created
    _stage_file(
        spark,
        [
            (3, _chg("t1", 2000, "u", '"{\\"v\\": 2}"')),
            (4, _chg("t2", 2500, "d")),
            (5, _chg("t3", 3000, "c")),
        ],
        src, "1", 1_000_000_100,
    )

    raw = (
        spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = upsert_latest_state_query(parse_debezium(raw), table, ckpt)
    q.awaitTermination()

    snap = read_latest_snapshot(spark, table)
    rows = {r.txn_id: (r.op, r.ts_ms) for r in snap.collect()}
    assert rows == {"t1": ("u", 2000), "t3": ("c", 3000)}  # t2 tombstoned

    # restart with no new data: snapshot unchanged (idempotent)
    q2 = upsert_latest_state_query(
        parse_debezium(
            spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        ),
        table,
        ckpt,
    )
    q2.awaitTermination()
    rows2 = {r.txn_id: (r.op, r.ts_ms) for r in read_latest_snapshot(spark, table).collect()}
    assert rows2 == rows
