"""The debezium_replay Python DataSource: the executable evidence for
S1/S2/S6 source semantics (topic subscribe, pattern subscribe,
resumable offsets) that the jar-gated Kafka reader cannot provide in
this container. See sources/python_datasource.py."""

from __future__ import annotations

import json
import os

import pytest

from cdc_via_flink_spark.operators.debezium import parse_debezium
from cdc_via_flink_spark.sources.python_datasource import (
    DebeziumReplayDataSource,
    _select_topics,
)


def _write_topic(root, topic, envelopes):
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, f"{topic}.jsonl"), "w") as fh:
        for e in envelopes:
            fh.write(json.dumps(e) + "\n")


def _change_envelope(txn_id, event_id, op="c"):
    """Debezium change envelope in the codec's shape
    (operators/debezium.py ENVELOPE_SCHEMA: payload.transaction.id
    carries the txn key; before/after are opaque JSON strings)."""
    return {
        "payload": {
            "op": op,
            "ts_ms": 1700000000000 + event_id,
            "transaction": {"id": f"txn-{txn_id}"},
            "before": None,
            "after": json.dumps({"event_id": event_id, "amount": 1.5}),
        }
    }


@pytest.fixture()
def replay_root(tmp_path):
    root = str(tmp_path / "topics")
    _write_topic(root, "transactions", [_change_envelope(1, i) for i in range(5)])
    _write_topic(root, "txn-events", [_change_envelope(2, 10 + i) for i in range(3)])
    return root


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(DebeziumReplayDataSource)
    return spark


def test_batch_subscribe_exact_topic(registered, replay_root):
    df = (
        registered.read.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribe", "transactions")
        .load()
    )
    rows = df.orderBy("offset").collect()
    assert [r.offset for r in rows] == [0, 1, 2, 3, 4]
    assert {r.topic for r in rows} == {"transactions"}
    assert rows[0].partition == 0
    assert json.loads(rows[0].value)["payload"]["transaction"]["id"] == "txn-1"


def test_batch_subscribe_pattern(registered, replay_root):
    df = (
        registered.read.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", "txn-.*")
        .load()
    )
    assert df.count() == 3
    both = (
        registered.read.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", ".*")
        .load()
    )
    assert both.count() == 8
    assert both.select("topic").distinct().count() == 2


def test_option_validation(replay_root):
    with pytest.raises(ValueError, match="exactly one"):
        _select_topics({"path": replay_root})
    with pytest.raises(ValueError, match="exactly one"):
        _select_topics(
            {"path": replay_root, "subscribe": "transactions", "subscribepattern": ".*"}
        )
    with pytest.raises(ValueError, match="unknown topic"):
        _select_topics({"path": replay_root, "subscribe": "nope"})
    with pytest.raises(ValueError, match="matched no topic"):
        _select_topics({"path": replay_root, "subscribepattern": "zzz.*"})


def test_batch_feeds_envelope_parser(registered, replay_root):
    """Drop-in parity: replay rows -> (seq, value) -> the SAME
    parse_debezium the Kafka path feeds (operators/debezium.py)."""
    df = (
        registered.read.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", ".*")
        .load()
        .selectExpr("offset AS seq", "value")
    )
    parsed = parse_debezium(df)
    assert parsed.filter("kind = 'change' AND op = 'c'").count() == 8
    tx = {r.txn_id for r in parsed.select("txn_id").distinct().collect()}
    assert tx == {"txn-1", "txn-2"}


def test_stream_availablenow_reads_everything(registered, replay_root, tmp_path):
    df = (
        registered.readStream.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", ".*")
        .option("maxRecordsPerBatch", "2")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("replay_all")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = registered.sql("SELECT topic, offset FROM replay_all").collect()
    assert len(out) == 8
    per_topic = {}
    for r in out:
        per_topic.setdefault(r.topic, []).append(r.offset)
    assert sorted(per_topic["transactions"]) == [0, 1, 2, 3, 4]
    assert sorted(per_topic["txn-events"]) == [0, 1, 2]


def test_stream_restart_resumes_from_checkpoint(registered, replay_root, tmp_path):
    """S6: restart with the same checkpoint consumes ONLY appended
    lines — offsets resume, no reprocessing, no loss."""
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")

    def run_once():
        df = (
            registered.readStream.format("debezium_replay")
            .option("path", replay_root)
            .option("subscribe", "transactions")
            .load()
        )
        q = (
            df.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert registered.read.parquet(out).count() == 5
    with open(os.path.join(replay_root, "transactions.jsonl"), "a") as fh:
        fh.write(json.dumps(_change_envelope(3, 99)) + "\n")
    run_once()
    offsets = [r.offset for r in registered.read.parquet(out).orderBy("offset").collect()]
    # exactly-once across restart: offsets 0-4 from run one, ONLY the
    # appended offset 5 from run two — no reprocessing, no loss.
    assert offsets == [0, 1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# Writer direction (Kafka-producer twin): stage -> ordered fold -> commit
# ---------------------------------------------------------------------------


def test_batch_write_roundtrip(registered, tmp_path):
    root = str(tmp_path / "sink")
    vals = [json.dumps(_change_envelope(1, i)) for i in range(7)]
    df = registered.createDataFrame([(v,) for v in vals], "value string")
    (
        df.coalesce(1)  # single partition => file order == row order
        .write.format("debezium_replay")
        .option("path", root)
        .option("topic", "out-topic")
        .mode("append")
        .save()
    )
    back = (
        registered.read.format("debezium_replay")
        .option("path", root)
        .option("subscribe", "out-topic")
        .load()
        .orderBy("offset")
    )
    assert [r.value for r in back.collect()] == vals
    assert not os.listdir(os.path.join(root, "_staging"))  # staged cleaned


def test_batch_write_topic_column_and_overwrite(registered, tmp_path):
    root = str(tmp_path / "sink")
    rows = [("t-a", "a1"), ("t-a", "a2"), ("t-b", "b1")]
    df = registered.createDataFrame(rows, "topic string, value string")
    df.write.format("debezium_replay").option("path", root).mode("append").save()
    df2 = registered.createDataFrame([("t-a", "a3")], "topic string, value string")
    df2.write.format("debezium_replay").option("path", root).mode("overwrite").save()
    read = lambda t: [  # noqa: E731
        r.value
        for r in registered.read.format("debezium_replay")
        .option("path", root)
        .option("subscribe", t)
        .load()
        .orderBy("offset")
        .collect()
    ]
    assert read("t-a") == ["a3"]  # overwrite truncated ONLY the written topic
    assert read("t-b") == ["b1"]


def test_stream_write_exactly_once_on_epoch_replay(registered, tmp_path):
    """Replayed epoch (crash between sink commit and checkpoint write)
    must not double-append: the batchId marker makes commit idempotent."""
    from pyspark.sql import Row

    from cdc_via_flink_spark.sources.python_datasource import _ReplayStreamWriter

    root = str(tmp_path / "sink")
    w = _ReplayStreamWriter({"path": root, "topic": "t"})
    msg = w.write(iter([Row(value="v1"), Row(value="v2")]))
    w.commit([msg], batchId=3)
    # replay: same epoch staged again, committed again
    msg2 = w.write(iter([Row(value="v1"), Row(value="v2")]))
    w.commit([msg2], batchId=3)
    with open(os.path.join(root, "t.jsonl")) as fh:
        assert fh.read().splitlines() == ["v1", "v2"]


def test_stream_write_no_duplicates_on_crash_in_commit(registered, tmp_path):
    """Crash DURING commit (fold ran, marker rename didn't): the
    surviving .pre journal must roll the topic logs back to their
    pre-fold lengths before the replayed epoch folds again — no
    duplicated lines, unlike a bare append-then-marker scheme."""
    import json

    from pyspark.sql import Row

    from cdc_via_flink_spark.sources.python_datasource import (
        _ReplayStreamWriter,
        _fold_staged,
    )

    root = str(tmp_path / "sink")
    w = _ReplayStreamWriter({"path": root, "topic": "t"})
    msg0 = w.write(iter([Row(value="base")]))
    w.commit([msg0], batchId=0)

    # simulate epoch 1 crashing mid-commit: journal written, fold ran
    # (lines appended), but the journal->marker rename never happened
    pre_len = os.path.getsize(os.path.join(root, "t.jsonl"))
    journal = os.path.join(root, "_commits", "1.pre")
    with open(journal, "w") as fh:
        json.dump({"offsets": {"t.jsonl": pre_len}}, fh)
    _fold_staged(root, [w.write(iter([Row(value="v1"), Row(value="v2")]))])

    # replayed epoch 1: must truncate back, then fold exactly once
    msg = w.write(iter([Row(value="v1"), Row(value="v2")]))
    w.commit([msg], batchId=1)
    with open(os.path.join(root, "t.jsonl")) as fh:
        assert fh.read().splitlines() == ["base", "v1", "v2"]
    assert os.path.exists(os.path.join(root, "_commits", "1"))
    assert not os.path.exists(journal)

    # and a replay AFTER the durable marker is a no-op
    msg2 = w.write(iter([Row(value="v1"), Row(value="v2")]))
    w.commit([msg2], batchId=1)
    with open(os.path.join(root, "t.jsonl")) as fh:
        assert fh.read().splitlines() == ["base", "v1", "v2"]


def test_stream_write_end_to_end(registered, replay_root, tmp_path):
    """readStream(debezium_replay) -> writeStream(debezium_replay):
    the full hermetic Kafka loop — consume two topics, produce into a
    third, read the produced topic back and compare values."""
    sink_root = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        registered.readStream.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", "t.*")
        .load()
        .select("value")
    )
    q = (
        stream.writeStream.format("debezium_replay")
        .option("path", sink_root)
        .option("topic", "merged")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        r.value
        for r in registered.read.format("debezium_replay")
        .option("path", sink_root)
        .option("subscribe", "merged")
        .load()
        .collect()
    )
    exp = []
    for t in ("transactions", "txn-events"):
        with open(os.path.join(replay_root, f"{t}.jsonl")) as fh:
            exp.extend(fh.read().splitlines())
    assert got == sorted(exp)

    # restart on the same checkpoint with no new input: no duplicates
    q2 = (
        registered.readStream.format("debezium_replay")
        .option("path", replay_root)
        .option("subscribePattern", "t.*")
        .load()
        .select("value")
        .writeStream.format("debezium_replay")
        .option("path", sink_root)
        .option("topic", "merged")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    n = (
        registered.read.format("debezium_replay")
        .option("path", sink_root)
        .option("subscribe", "merged")
        .load()
        .count()
    )
    assert n == len(exp)


def _read_lines(path):
    with open(path) as fh:
        return fh.read().splitlines()


def test_partitioned_write_routes_and_reads_back(registered, tmp_path):
    """Kafka-style partitioned topics: explicit partition column and
    md5-key routing land rows in <topic>.p<k>.jsonl; the reader
    reports the REAL partition and per-partition offsets."""
    from pyspark.sql import Row

    root = str(tmp_path / "sink")
    rows = [
        Row(value="a0", partition=0, key=None),
        Row(value="a1", partition=1, key=None),
        Row(value="a2", partition=1, key=None),
        Row(value="k1", partition=None, key="user-7"),
        Row(value="k2", partition=None, key="user-7"),  # same key, same part
    ]
    (
        registered.createDataFrame(rows)
        .write.format("debezium_replay")
        .option("path", root)
        .option("topic", "t")
        .option("topicPartitions", 2)
        .mode("append")
        .save()
    )
    import hashlib

    k_part = int(hashlib.md5(b"user-7").hexdigest()[:8], 16) % 2
    assert _read_lines(os.path.join(root, "t.p1.jsonl")) == (
        ["a1", "a2", "k1", "k2"] if k_part == 1 else ["a1", "a2"]
    )
    got = (
        registered.read.format("debezium_replay")
        .option("path", root)
        .option("subscribe", "t")
        .load()
        .collect()
    )
    by_part = {}
    for r in got:
        by_part.setdefault(r.partition, []).append((r.offset, r.value))
    assert set(by_part) == {0, 1}
    for part, vals in by_part.items():
        # offsets are dense per partition, starting at 0
        assert [o for o, _ in sorted(vals)] == list(range(len(vals)))
    all_vals = sorted(v for vs in by_part.values() for _, v in vs)
    assert all_vals == ["a0", "a1", "a2", "k1", "k2"]


def test_partition_column_out_of_range_rejected(registered, tmp_path):
    from pyspark.sql import Row

    import pytest as _pytest

    root = str(tmp_path / "sink")
    with _pytest.raises(Exception, match="out of range"):
        (
            registered.createDataFrame([Row(value="x", partition=5)])
            .write.format("debezium_replay")
            .option("path", root)
            .option("topic", "t")
            .option("topicPartitions", 2)
            .mode("append")
            .save()
        )


def test_partitioned_stream_offsets_and_resume(registered, tmp_path):
    """Streaming over a partitioned topic: per-partition offsets in
    the checkpoint; appends after a restart resume from exactly the
    per-partition cursor (no reprocessing, no loss)."""
    import glob as _glob

    root = str(tmp_path / "topics")
    os.makedirs(root)
    with open(os.path.join(root, "t.p0.jsonl"), "w") as fh:
        fh.write("p0-a\np0-b\n")
    with open(os.path.join(root, "t.p1.jsonl"), "w") as fh:
        fh.write("p1-a\n")

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        df = (
            registered.readStream.format("debezium_replay")
            .option("path", root)
            .option("subscribe", "t")
            .load()
        )
        q = (
            df.selectExpr("partition", "offset", "value")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {
        (r.partition, r.offset): r.value
        for r in registered.read.parquet(out_dir).collect()
    }
    assert first == {(0, 0): "p0-a", (0, 1): "p0-b", (1, 0): "p1-a"}

    # append to both partitions, restart from checkpoint
    with open(os.path.join(root, "t.p0.jsonl"), "a") as fh:
        fh.write("p0-c\n")
    with open(os.path.join(root, "t.p1.jsonl"), "a") as fh:
        fh.write("p1-b\n")
    run_once()
    rows = registered.read.parquet(out_dir).collect()
    assert len(rows) == 5  # no reprocessing
    got = {(r.partition, r.offset): r.value for r in rows}
    assert got[(0, 2)] == "p0-c" and got[(1, 1)] == "p1-b"
    assert _glob.glob(os.path.join(ckpt, "offsets", "*"))


def test_mixed_topic_layout_rejected(registered, tmp_path):
    root = str(tmp_path / "topics")
    os.makedirs(root)
    open(os.path.join(root, "t.jsonl"), "w").write("a\n")
    open(os.path.join(root, "t.p1.jsonl"), "w").write("b\n")
    import pytest as _pytest

    with _pytest.raises(Exception, match="both"):
        (
            registered.read.format("debezium_replay")
            .option("path", root)
            .option("subscribe", "t")
            .load()
            .collect()
        )


def test_partitioned_stream_feeds_stateful_assembler(registered, tmp_path):
    """The reference's real topology: a PARTITIONED keyed topic feeding
    the stateful reconstructor. Envelopes for 3 transactions are
    produced into a 2-partition topic keyed by txn_id (each txn's
    envelopes land in one partition, in order), consumed back as a
    STREAM through the partitioned reader, and assembled with
    applyInPandasWithState — emitted transactions must match the
    declared END counts regardless of which partition carried them."""
    from pyspark.sql import Row, functions as F

    from cdc_via_flink_spark.operators.debezium import parse_debezium
    from cdc_via_flink_spark.streaming.assembler import (
        assemble_transactions_stream,
    )

    root = str(tmp_path / "ptopic")
    rows = []
    for txn in (1, 2, 3):
        for i in range(txn + 1):  # txn-1: 2 changes, txn-2: 3, txn-3: 4
            rows.append(
                Row(
                    key=f"txn-{txn}",
                    value=json.dumps(_change_envelope(txn, txn * 10 + i)),
                )
            )
        rows.append(
            Row(
                key=f"txn-{txn}",
                value=json.dumps(
                    {
                        "payload": {
                            "status": "END",
                            "id": f"txn-{txn}",
                            "event_count": txn + 1,
                        }
                    }
                ),
            )
        )
    (
        registered.createDataFrame(rows)
        .coalesce(1)
        .write.format("debezium_replay")
        .option("path", root)
        .option("topic", "txns")
        .option("topicPartitions", 2)
        .mode("append")
        .save()
    )
    stream = (
        registered.readStream.format("debezium_replay")
        .option("path", root)
        .option("subscribe", "txns")
        .load()
        .selectExpr("offset AS seq", "value")
    )
    parsed = parse_debezium(stream)
    event_time = F.coalesce(
        F.timestamp_millis(F.col("ts_ms")),
        F.timestamp_millis(F.lit(1700000100000) + F.col("seq")),
    )
    assembled = assemble_transactions_stream(parsed, event_time=event_time)
    q = (
        assembled.writeStream.format("memory")
        .queryName("ptopic_assembled")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.txn_id: (r.n_events, r.event_count)
        for r in registered.table("ptopic_assembled").collect()
    }
    assert got == {
        "txn-1": (2, 2),
        "txn-2": (3, 3),
        "txn-3": (4, 4),
    }
