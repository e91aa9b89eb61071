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


def test_tombstone_blocks_out_of_order_resurrection(spark, tmp_path):
    """A stale (older-ts) update arriving in a batch AFTER the delete
    must NOT resurrect the key: the tombstone persists in the snapshot
    and wins the (ts_ms, seq) merge window."""
    src = str(tmp_path / "src")
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _stage_file(spark, [(1, _chg("t1", 1000, "c"))], src, "0", 1_000_000_000)
    _stage_file(spark, [(2, _chg("t1", 3000, "d"))], src, "1", 1_000_000_100)
    _stage_file(  # stale update: ts 2000 < delete's 3000
        spark, [(3, _chg("t1", 2000, "u"))], src, "2", 1_000_000_200
    )
    raw = (
        spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    upsert_latest_state_query(parse_debezium(raw), table, ckpt).awaitTermination()
    assert read_latest_snapshot(spark, table).filter("txn_id = 't1'").count() == 0
    tomb = (
        read_latest_snapshot(spark, table, include_tombstones=True)
        .filter("txn_id = 't1'")
        .collect()
    )
    assert [(r.op, r.ts_ms) for r in tomb] == [("d", 3000)]


def test_snapshot_gc_bounds_versions_and_restart_reads_latest(spark, tmp_path):
    """Each micro-batch writes a full ``v=<epoch>`` snapshot; GC must
    bound that to ``keep_snapshots`` dirs, and a restart AFTER GC must
    still resume from the committed pointer and read correct state."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    for i, (ts, op) in enumerate([(1000, "c"), (2000, "u"), (3000, "u"), (4000, "u")]):
        _stage_file(
            spark, [(i, _chg("t1", ts, op))], src, str(i), 1_000_000_000 + 100 * i
        )

    def run():
        raw = (
            spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        upsert_latest_state_query(
            parse_debezium(raw), table, ckpt, keep_snapshots=2
        ).awaitTermination()

    run()
    versions = sorted(d for d in os.listdir(table) if d.startswith("v="))
    assert len(versions) == 2, versions  # committed + 1 predecessor, older GC'd
    assert {r.txn_id: r.ts_ms for r in read_latest_snapshot(spark, table).collect()} == {
        "t1": 4000
    }

    # restart after GC: new batch merges against the surviving snapshot
    _stage_file(spark, [(9, _chg("t1", 5000, "u"))], src, "4", 1_000_000_900)
    run()
    assert {r.txn_id: r.ts_ms for r in read_latest_snapshot(spark, table).collect()} == {
        "t1": 5000
    }
    assert len([d for d in os.listdir(table) if d.startswith("v=")]) == 2


def test_replayed_epoch_is_noop(spark, tmp_path):
    """Crash between pointer move and checkpoint commit replays the
    epoch; the merge must detect the committed pointer and no-op rather
    than overwrite the snapshot directory it is reading from."""
    from cdc_via_flink_spark.streaming.upsert import _merge_batch

    table = str(tmp_path / "state")
    import os

    os.makedirs(table, exist_ok=True)
    batch = parse_debezium(
        spark.createDataFrame([(1, _chg("t1", 1000, "c"))], "seq long, value string")
    )
    _merge_batch(spark, batch, table, epoch_id=5)
    before = {r.txn_id: r.ts_ms for r in read_latest_snapshot(spark, table).collect()}
    _merge_batch(spark, batch, table, epoch_id=5)  # replay: must not throw
    after = {r.txn_id: r.ts_ms for r in read_latest_snapshot(spark, table).collect()}
    assert before == after == {"t1": 1000}
