"""Streaming infrastructure tests (SURVEY.md S4/S6/ST5): dead-letter
dual sink via foreachBatch, and checkpointed restart (offsets are not
reprocessed; new data continues from the committed point)."""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.debezium import parse_debezium
from cdc_via_flink_spark.streaming.sinks import dual_sink_query, split_dead_letter
from cdc_via_flink_spark.streaming.sources import ENVELOPE_STREAM_SCHEMA


def _stage_file(spark, rows, dest_dir, name, mtime):
    tmp = dest_dir + f"_w_{name}"
    spark.createDataFrame(rows, "seq long, value string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(f"{tmp}/part-*.parquet")[0]
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, f"{name}.parquet")
    shutil.copy(part, dest)
    os.utime(dest, (mtime, mtime))


GOOD = '{"payload":{"op":"c","ts_ms":1000,"transaction":{"id":"t1"},"after":"{}"}}'
BAD = "{not json"
END = '{"payload":{"status":"END","id":"t1","event_count":1}}'


def test_dead_letter_dual_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    _stage_file(spark, [(1, GOOD), (2, BAD), (3, END)], src, "0", 1_000_000_000)
    raw = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA).parquet(src)
    parsed = parse_debezium(raw)
    q = dual_sink_query(
        parsed,
        good_dir=str(tmp_path / "good"),
        dead_dir=str(tmp_path / "dead"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    good = spark.read.parquet(str(tmp_path / "good" / "epoch=0"))
    dead = spark.read.parquet(str(tmp_path / "dead" / "epoch=0"))
    assert good.count() == 2
    assert [r.seq for r in dead.collect()] == [2]


def test_checkpoint_restart_no_reprocess(spark, tmp_path):
    """S6/ST5: stop after batch 1, add a file, restart from the same
    checkpoint -> only the new file is processed (offsets committed),
    and the union of outputs covers both files exactly once."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _stage_file(spark, [(1, GOOD)], src, "0", 1_000_000_000)

    def run_once():
        raw = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA).parquet(src)
        parsed = parse_debezium(raw).select("seq", "kind")
        q = (
            parsed.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = {r.seq for r in spark.read.parquet(sink).collect()}
    assert first == {1}

    _stage_file(spark, [(2, END)], src, "1", 1_000_000_100)
    run_once()
    second = sorted(r.seq for r in spark.read.parquet(sink).collect())
    assert second == [1, 2], "restart must process exactly the new data"


def test_split_dead_letter_batch(spark):
    env = spark.createDataFrame([(1, GOOD), (2, BAD)], "seq long, value string")
    good, dead = split_dead_letter(parse_debezium(env))
    assert good.count() == 1 and dead.count() == 1


def test_stateful_assembler_state_survives_restart(spark, tmp_path):
    """ST5 for the STATEFUL operator: changes arrive in run 1 (no END),
    the query STOPS, END arrives, a NEW query restarts from the same
    checkpoint — the buffered events must be recovered from the state
    store and the transaction emitted (the reference's ValueState-
    across-checkpoints behavior, DebeziumTransactionReconstructor
    .java:37,132, strengthened to a full process restart)."""
    from cdc_via_flink_spark.streaming.assembler import assemble_transactions_stream

    src = str(tmp_path / "src")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    c1 = '{"payload":{"op":"c","ts_ms":1000,"transaction":{"id":"t9"},"after":"{}"}}'
    c2 = '{"payload":{"op":"u","ts_ms":2000,"transaction":{"id":"t9"},"after":"{}"}}'
    _stage_file(spark, [(1, c1), (2, c2)], src, "0", 1_000_000_000)

    def run_once():
        raw = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA).parquet(src)
        parsed = parse_debezium(raw)
        event_time = F.coalesce(
            F.timestamp_millis(F.col("ts_ms")),
            F.timestamp_millis(F.lit(10_000) + F.col("seq")),
        )
        out = assemble_transactions_stream(parsed, event_time=event_time)
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()  # buffers t9's two changes; emits nothing
    assert spark.read.parquet(sink).count() == 0

    end = '{"payload":{"status":"END","id":"t9","event_count":2}}'
    _stage_file(spark, [(3, end)], src, "1", 1_000_000_100)
    run_once()  # restart: state recovered, END completes the txn
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    assert (rows[0].txn_id, rows[0].n_events, rows[0].ops_concat) == ("t9", 2, "c,u")


def test_late_rows_dropped_past_watermark(spark, tmp_path):
    """ST4: with a 10-minute watermark, a row arriving in a later
    micro-batch but timestamped before (watermark - delay) is DROPPED
    from the windowed aggregation (Spark's documented late-data
    behavior == the reference's bounded out-of-orderness tolerance,
    DebeziumTransactionReconstructor.java:57-61)."""
    src = str(tmp_path / "src")
    h = 3_600_000  # ms
    # batch 0: 10:00 and 11:00 -> watermark 10:50 (operative one batch
    # after it is computed, hence the spacer batch below)
    _stage_file(
        spark,
        [(1, f"{10 * h}"), (2, f"{11 * h}")],
        src,
        "0",
        1_000_000_000,
    )
    # batch 1: spacer advancing the commit cycle (11:02)
    _stage_file(spark, [(3, f"{11 * h + 2 * 60_000}")], src, "1", 1_000_000_100)
    # batch 2: 10:05 (LATE: watermark is now ≥ 10:50) and 11:05 (on time)
    _stage_file(
        spark,
        [(4, f"{10 * h + 5 * 60_000}"), (5, f"{11 * h + 5 * 60_000}")],
        src,
        "2",
        1_000_000_200,
    )
    raw = (
        spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ev = raw.select(
        "seq", F.timestamp_millis(F.col("value").cast("long")).alias("ts")
    )
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis(F.col("window.start")).alias("w_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.w_start: r.n for r in spark.table("late_drop").collect()}
    # the 10:00-10:10 window emitted with ONE row: seq 3 was late.
    assert got.get(10 * h) == 1


def test_streaming_observability_listener_and_observe(spark, tmp_path):
    """ST5 observability: named query + df.observe metrics surfaced
    through a StreamingQueryListener — the Spark-native replacement
    for the reference's uncaught-exception-handler + named-job
    plumbing (DebeziumTransactionReconstructor.java:39-45,88-89)."""
    from pyspark.sql.streaming import StreamingQueryListener

    events = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, e):
            events.append(("started", e.name))

        def onQueryProgress(self, e):
            om = e.progress.observedMetrics
            if "env_metrics" in om:
                row = om["env_metrics"]
                events.append(("metrics", row.n_rows, row.n_dead))

        def onQueryIdle(self, e):
            pass

        def onQueryTerminated(self, e):
            events.append(("terminated",))

    spark.streams.addListener(listener := Capture())
    try:
        src = str(tmp_path / "src")
        _stage_file(spark, [(1, GOOD), (2, BAD), (3, END)], src, "0", 1_000_000_000)
        raw = spark.readStream.schema(ENVELOPE_STREAM_SCHEMA).parquet(src)
        parsed = parse_debezium(raw).observe(
            "env_metrics",
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("kind").isNull(), 1)).alias("n_dead"),
        )
        q = (
            parsed.writeStream.format("memory")
            .queryName("observed_reconstruction")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        import time

        for _ in range(50):  # listener events are delivered async
            if any(e[0] == "metrics" for e in events):
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)

    assert ("started", "observed_reconstruction") in events
    metric = next(e for e in events if e[0] == "metrics")
    assert metric[1] == 3 and metric[2] == 1  # 3 rows, 1 dead-letter


def test_outer_join_null_matches_flush(spark):
    """Left-outer stream-stream join: the sentinel-file watermark
    advance must flush the trailing null-matches before availableNow
    terminates (without it, unmatched signups would be silently lost
    in finite replay)."""
    from cdc_via_flink_spark.plans.registry import load_all

    from tests.conftest import SF0001

    rows = load_all()["stream_outer_join"].fn(spark, SF0001).collect()
    assert any(r.purchase_id == -1 for r in rows), "no null-matches flushed"
    assert any(r.purchase_id != -1 for r in rows), "no matched rows"
    assert all(r.user_id != -999 for r in rows), "sentinel rows leaked"


def test_kafka_reader_options_subscribe_vs_pattern():
    """S2's only runnable evidence in this container (no Kafka jar):
    the option map the reader would be built from — fixed-topic vs
    topic-pattern subscription are mutually exclusive, offsets start
    from earliest like the reference's consumer."""
    import pytest

    from cdc_via_flink_spark.streaming.sources import kafka_reader_options

    fixed = kafka_reader_options("b:9092", subscribe="txn.changes,txn.commits")
    assert fixed["subscribe"] == "txn.changes,txn.commits"
    assert "subscribePattern" not in fixed
    assert fixed["startingOffsets"] == "earliest"
    assert fixed["kafka.bootstrap.servers"] == "b:9092"

    pat = kafka_reader_options("b:9092", subscribe_pattern="txn\\..*")
    assert pat["subscribePattern"] == "txn\\..*"
    assert "subscribe" not in pat

    with pytest.raises(ValueError):
        kafka_reader_options("b:9092")
    with pytest.raises(ValueError):
        kafka_reader_options("b:9092", subscribe="a", subscribe_pattern="b")


def test_funnel_fold_is_arrival_order_insensitive():
    """The funnel folds the COMPLETE buffer at timeout precisely so
    out-of-order arrival can't corrupt stage attribution: any
    permutation of the same events folds identically."""
    import itertools

    from cdc_via_flink_spark.streaming.funnel import _fold_funnel

    events = [("click", 50), ("signup", 100), ("click", 150), ("purchase", 160),
              ("purchase", 90)]
    expected = (100, 150, 160, 3)  # click@50 and purchase@90 precede the funnel
    for perm in itertools.permutations(events):
        et, ts = [e for e, _ in perm], [t for _, t in perm]
        assert _fold_funnel(et, ts) == expected, perm


def test_funnel_stage_short_circuits():
    from cdc_via_flink_spark.streaming.funnel import _fold_funnel

    # signup only
    assert _fold_funnel(["signup"], [10]) == (10, -1, -1, 1)
    # signup + click, purchase BEFORE click does not count
    assert _fold_funnel(
        ["signup", "click", "purchase"], [10, 20, 15]
    ) == (10, 20, -1, 2)
    # no signup at all
    assert _fold_funnel(["click", "purchase"], [5, 6])[0] is None


def test_state_data_source_introspection(spark, tmp_path):
    """streaming/state_inspect.py: the checkpoint's stateful-operator
    catalog (state-metadata), the raw state rows, and batchId
    time-travel — state as of an EARLIER committed batch still holds
    windows the later watermark has since evicted."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from cdc_via_flink_spark.streaming.state_inspect import (
        open_window_state,
        read_state,
        read_state_metadata,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    rows = [(i, f"2024-01-01 00:{i:02d}:00") for i in range(30)]
    for k in range(3):
        part = [(i, ts) for i, ts in rows if i // 10 == k]
        df = spark.createDataFrame(part, "id long, ts_s string").selectExpr(
            "id", "CAST(ts_s AS TIMESTAMP) AS ts"
        )
        d = os.path.join(src, f"_b{k}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        p = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        final = os.path.join(src, f"{k:03d}.parquet")
        os.replace(os.path.join(d, p), final)
        import shutil

        shutil.rmtree(d)
        t = _time.time() - (3 - k) * 10
        os.utime(final, (t, t))

    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    md = read_state_metadata(spark, ckpt).collect()
    assert len(md) == 1 and md[0].operatorName == "stateStoreSave"
    max_batch = md[0].maxBatchId

    # final state: only the last (unclosed) 10-minute window survives
    final_state = {
        (r.window_start.minute, r.n_rows)
        for r in open_window_state(spark, ckpt).collect()
    }
    assert final_state == {(20, 10)}

    # time-travel: as of batch 0 the FIRST window was still buffered
    early = read_state(spark, ckpt, batch_id=0).select(
        F.col("key.window.start").alias("ws"), F.col("value.count").alias("n")
    ).collect()
    assert {(r.ws.minute, r.n) for r in early} == {(0, 10)}
    assert max_batch >= 2


def test_progress_log_reader(spark, tmp_path):
    """read_progress_log: every batch in offsets/ appears with its
    committed flag and batch watermark; the watermark advances across
    batches of an event-time stream."""
    import os
    import time as _time

    from pyspark.sql import functions as F

    from cdc_via_flink_spark.streaming.state_inspect import read_progress_log

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    rows = [(i, f"2024-01-01 00:{i:02d}:00") for i in range(30)]
    for k in range(3):
        part = [(i, ts) for i, ts in rows if i // 10 == k]
        df = spark.createDataFrame(part, "id long, ts_s string").selectExpr(
            "id", "CAST(ts_s AS TIMESTAMP) AS ts"
        )
        d = os.path.join(src, f"_b{k}")
        df.coalesce(1).write.mode("overwrite").parquet(d)
        p = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        final = os.path.join(src, f"{k:03d}.parquet")
        os.replace(os.path.join(d, p), final)
        import shutil

        shutil.rmtree(d)
        t = _time.time() - (3 - k) * 10
        os.utime(final, (t, t))
    stream = (
        spark.readStream.schema("id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    log = sorted(
        (r.batch_id, r.committed, r.batch_watermark_ms)
        for r in read_progress_log(spark, ckpt).collect()
    )
    assert len(log) >= 3
    assert all(c for _b, c, _w in log)  # finished run: all committed
    wms = [w for _b, _c, w in log if w is not None]
    assert wms == sorted(wms) and wms[-1] > 0  # watermark advanced
    # the walk goes through the Hadoop FileSystem API (r8 VERDICT #3):
    # an explicit file:-scheme URI resolves to the same ledger
    via_uri = sorted(
        (r.batch_id, r.committed, r.batch_watermark_ms)
        for r in read_progress_log(spark, "file://" + ckpt).collect()
    )
    assert via_uri == log
    # and a checkpoint with no offsets dir is an empty frame, not an error
    assert read_progress_log(spark, str(tmp_path / "no_ckpt")).count() == 0


def test_join_state_eviction_boundary(spark, tmp_path):
    """Pins the interval join's state-eviction boundary the declared
    stream_state_join_buffer oracle encodes: rows AT the watermark
    boundary are RETAINED (>= semantics) — left survives while
    s_ts + 1h >= wm, right while p_ts >= wm — probed with exact-tie
    fixtures 1 ms either side of the boundary."""
    import os

    from pyspark.sql import functions as F

    rows = [
        (1, 100, "signup", "2024-01-01 01:00:00"),  # wm driver: wm = 00:50
        (2, 101, "signup", "2023-12-31 23:50:00"),  # s+1h == wm -> retained
        (3, 102, "signup", "2023-12-31 23:49:59.999"),  # 1ms below -> evicted
        (4, 103, "signup", "2023-12-31 23:50:00.001"),  # 1ms above -> retained
        (5, 200, "purchase", "2024-01-01 01:00:00"),
        (6, 201, "purchase", "2024-01-01 00:50:00"),  # == wm -> retained
        (7, 202, "purchase", "2024-01-01 00:49:59.999"),  # evicted
        (8, 203, "purchase", "2024-01-01 00:50:00.001"),  # retained
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts_s string"
    ).selectExpr("event_id", "user_id", "event_type", "CAST(ts_s AS TIMESTAMP) AS ts")
    path = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    df.coalesce(1).write.parquet(path)

    def side(kind, alias):
        return (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .parquet(path)
            .filter(F.col("event_type") == kind)
            .withWatermark("ts", "10 minutes")
            .select(
                F.col("user_id").alias(f"{alias}_user"),
                F.col("event_id").alias(f"{alias}_id"),
                F.col("ts").alias(f"{alias}_ts"),
            )
        )

    s, p = side("signup", "s"), side("purchase", "p")
    j = s.join(
        p,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    q = (
        j.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    left = sorted(
        r.s_id
        for r in spark.read.format("statestore")
        .option("joinSide", "left")
        .load(ckpt)
        .select("value.s_id")
        .collect()
    )
    right = sorted(
        r.p_id
        for r in spark.read.format("statestore")
        .option("joinSide", "right")
        .load(ckpt)
        .select("value.p_id")
        .collect()
    )
    assert left == [1, 2, 4]
    assert right == [5, 6, 8]
