"""CDC semantics unit tests (SURVEY.md §5.2-2, FIXTURES.md §2.3):
the V1 edge behaviors, on both the batch twin and the streaming
assembler. Reference sites cited per scenario."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.debezium import parse_debezium
from cdc_via_flink_spark.operators.reconstruct import reconstruct_transactions
from cdc_via_flink_spark.streaming.assembler import assemble_transactions_stream
from cdc_via_flink_spark.streaming.sources import file_envelope_stream


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "txn_id string, seq long, op string, ts_ms long"
    )


def _ends(spark, rows):
    return spark.createDataFrame(rows, "txn_id string, seq long, event_count long")


def test_happy_path(spark):
    """BEGIN/changes/END -> one record with all events in order."""
    c = _changes(spark, [("t1", 1, "c", 100), ("t1", 2, "u", 200), ("t1", 3, "d", 300)])
    e = _ends(spark, [("t1", 4, 3)])
    out = reconstruct_transactions(c, e).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.txn_id, r.end_seq, r.n_events, r.ops_concat) == ("t1", 4, 3, "c,u,d")
    assert (r.first_ts_ms, r.last_ts_ms) == (100, 300)


def test_interleaved_transactions(spark):
    """Events of T1/T2 interleaved -> each emitted independently
    (keyed state isolation, reference :73-86)."""
    c = _changes(
        spark,
        [("t1", 1, "c", 100), ("t2", 2, "c", 150), ("t1", 3, "u", 200), ("t2", 5, "d", 250)],
    )
    e = _ends(spark, [("t2", 6, 2), ("t1", 7, 2)])
    out = {r.txn_id: r for r in reconstruct_transactions(c, e).collect()}
    assert out["t1"].ops_concat == "c,u"
    assert out["t2"].ops_concat == "c,d"


def test_end_without_events_dropped(spark):
    """END with no buffered events -> silently dropped
    (reference :159-163 null-state guard)."""
    c = _changes(spark, [("t1", 1, "c", 100)])
    e = _ends(spark, [("t1", 2, 1), ("t9", 3, 5)])
    out = reconstruct_transactions(c, e).collect()
    assert [r.txn_id for r in out] == ["t1"]


def test_change_after_end_not_emitted(spark):
    """Changes after the last END are never emitted (the reference's
    orphan-state behavior, :141-153; streaming path additionally
    expires them via timeout — documented deviation)."""
    c = _changes(spark, [("t1", 1, "c", 100), ("t1", 5, "u", 500)])
    e = _ends(spark, [("t1", 3, 1)])
    out = reconstruct_transactions(c, e).collect()
    assert len(out) == 1
    assert out[0].ops_concat == "c"
    assert out[0].n_events == 1


def test_multiple_ends_segment(spark):
    """Each END emits the changes buffered since the previous END
    (emit+clear per END, reference :158-166)."""
    c = _changes(
        spark,
        [("t1", 1, "c", 100), ("t1", 2, "u", 200), ("t1", 4, "d", 400), ("t1", 6, "c", 600)],
    )
    e = _ends(spark, [("t1", 3, 2), ("t1", 5, 1), ("t1", 7, 1)])
    out = sorted(reconstruct_transactions(c, e).collect(), key=lambda r: r.end_seq)
    assert [(r.end_seq, r.ops_concat) for r in out] == [(3, "c,u"), (5, "d"), (7, "c")]


def test_emit_on_count_filters(spark):
    """Count mode: only segments matching declared event_count emit
    (the check the reference parses but ignores, :113-114)."""
    c = _changes(spark, [("t1", 1, "c", 100), ("t1", 2, "u", 200), ("t2", 3, "c", 300)])
    e = _ends(spark, [("t1", 4, 2), ("t2", 5, 9)])
    out = reconstruct_transactions(c, e, emit_on="count").collect()
    assert [r.txn_id for r in out] == ["t1"]


def test_malformed_json_routed_null(spark):
    """Malformed envelope -> kind NULL (PERMISSIVE parse, matching the
    reference's null-and-log path :104-107,124-127)."""
    env = spark.createDataFrame(
        [(1, '{"payload":{"op":"c","ts_ms":1,"transaction":{"id":"t"}}}'), (2, "{nope")],
        "seq long, value string",
    )
    parsed = parse_debezium(env)
    kinds = {r.seq: r.kind for r in parsed.collect()}
    assert kinds[1] == "change"
    assert kinds[2] is None


def test_streaming_cross_batch_state(spark, tmp_path):
    """Changes arriving in batch 1, END in batch 2: state persists
    across micro-batches and the record emits in batch 2 (GroupState ==
    the reference's ValueState across checkpoints, :132)."""
    f1 = [
        (1, '{"payload":{"op":"c","ts_ms":1000,"transaction":{"id":"t1"},"after":"{}"}}'),
        (2, '{"payload":{"op":"u","ts_ms":2000,"transaction":{"id":"t1"},"after":"{}"}}'),
    ]
    f2 = [
        (3, '{"payload":{"op":"d","ts_ms":3000,"transaction":{"id":"t1"},"after":"{}"}}'),
        (4, '{"payload":{"status":"END","id":"t1","event_count":3}}'),
    ]
    stage = str(tmp_path / "stream")
    import glob
    import os
    import shutil

    # Stage each file with a controlled name and modification time so
    # the file source triggers batch 1 = f1, batch 2 = f2.
    os.makedirs(f"{stage}/envelopes", exist_ok=True)
    for i, data in enumerate([f1, f2]):
        tmp_out = f"{stage}/w{i}"
        spark.createDataFrame(data, "seq long, value string").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp_out)
        part = glob.glob(f"{tmp_out}/part-*.parquet")[0]
        dest = f"{stage}/envelopes/{i}.parquet"
        shutil.copy(part, dest)
        os.utime(dest, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    from cdc_via_flink_spark.streaming.sources import ENVELOPE_STREAM_SCHEMA

    raw = (
        spark.readStream.schema(ENVELOPE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{stage}/envelopes")
    )
    parsed = parse_debezium(raw)
    event_time = F.coalesce(
        F.timestamp_millis(F.col("ts_ms")),
        F.timestamp_millis(F.lit(10_000) + F.col("seq")),
    )
    out = assemble_transactions_stream(parsed, event_time=event_time)
    q = (
        out.writeStream.format("memory")
        .queryName("xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("xbatch").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.txn_id, r.n_events, r.ops_concat) == ("t1", 3, "c,u,d")


def test_segmented_reconstruction_equivalent(spark):
    """skew_block_size changes the PLAN (parallel per-block scan +
    block suffix minima instead of one per-key window), never the
    RESULT — same segments on an interleaved multi-txn workload."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.reconstruct import reconstruct_from_union

    u = spark.range(5000).select(
        F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("txn_id"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 31 == 0, F.lit("E")).otherwise(F.lit("C")).alias("kind"),
        F.lit("u").alias("op"),
        (F.col("id") * 3).alias("ts_ms"),
        F.when(F.col("id") % 31 == 0, F.col("id") % 5).cast("long").alias("declared"),
    )
    key = lambda r: (r.txn_id, r.end_seq)  # noqa: E731
    val = lambda r: (r.n_events, r.ops_concat, r.first_ts_ms, r.last_ts_ms, r.event_count)  # noqa: E731
    base = {key(r): val(r) for r in reconstruct_from_union(u).collect()}
    for b in (64, 1000):
        seg = {key(r): val(r) for r in reconstruct_from_union(u, skew_block_size=b).collect()}
        assert seg == base
    # count mode too
    base_c = {key(r): val(r) for r in reconstruct_from_union(u, emit_on="count").collect()}
    seg_c = {key(r): val(r) for r in reconstruct_from_union(u, emit_on="count", skew_block_size=64).collect()}
    assert seg_c == base_c


def _skew_union(spark, n, hot_every=20):
    """n-row union where (hot_every-1)/hot_every of rows share ONE
    txn_id — the hot-transaction shape (a bulk load emitting millions
    of row changes in one transaction)."""
    return spark.range(n).select(
        F.when(F.col("id") % hot_every != 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("t"), (F.col("id") % 1000).cast("string")))
        .alias("txn_id"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 997 == 0, F.lit("E")).otherwise(F.lit("C")).alias("kind"),
        F.lit("u").alias("op"),
        (F.col("id") * 3).alias("ts_ms"),
        F.when(F.col("id") % 997 == 0, F.col("id") % 5).cast("long").alias("declared"),
    )


def test_skew_probe_is_sampled_and_accurate(spark):
    """The hot-key probe must (a) aggregate a SAMPLE, not the full
    input (a full groupBy pre-pass at 100 TB re-reads the union once
    per job), and (b) estimate the hottest key within sampling
    tolerance."""
    import cdc_via_flink_spark.operators.reconstruct as R

    u = _skew_union(spark, 50_000)  # ~95% of rows on one key
    est = R._est_max_rows_per_key(u)
    true_max = (
        u.groupBy("txn_id").count().agg(F.max("count")).first()[0]
    )
    assert abs(est - true_max) / true_max < 0.25, (est, true_max)
    # the probe's plan must carry a Sample operator and prune to txn_id
    probe = u.select("txn_id").sample(fraction=R.AUTO_SKEW_SAMPLE, seed=7)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Sample" in plan, plan


def test_auto_skew_detection_triggers_segmented_plan(spark, monkeypatch):
    """With the gates lowered, the DEFAULT call (no manual knob) must
    detect the hot key and switch to the segmented plan — and produce
    exactly the plain plan's results."""
    import cdc_via_flink_spark.operators.reconstruct as R

    u = _skew_union(spark, 5000)
    key = lambda r: (r.txn_id, r.end_seq)  # noqa: E731
    base = {key(r): r.n_events for r in R.reconstruct_from_union(u, skew_block_size=None).collect()}

    monkeypatch.setattr(R, "AUTO_SKEW_MIN_BYTES", 1)
    monkeypatch.setattr(R, "AUTO_SKEW_HOT_ROWS", 100)
    monkeypatch.setattr(R, "AUTO_SKEW_BLOCK", 64)
    out = R.reconstruct_from_union(u)  # default: auto
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    # segmented shape: block window + block-info join => >=2 keyed exchanges
    assert plan.count("Exchange hashpartitioning") >= 2, plan
    assert {key(r): r.n_events for r in out.collect()} == base
    # below the hot threshold the default stays the single-shuffle plan
    monkeypatch.setattr(R, "AUTO_SKEW_HOT_ROWS", 10_000_000)
    plain = R.reconstruct_from_union(u)
    pplan = plain._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert pplan.count("Exchange hashpartitioning") == 1, pplan


def test_hot_key_default_path_no_cliff(spark):
    """1M rows with 95% in ONE transaction through the DEFAULT path,
    no knobs. The round-2 formulation (suffix window frame,
    re-aggregated per row) was quadratic per key — >10 minutes at this
    shape; the desc-order prefix frame is incremental and finishes in
    seconds. A regression here shows up as this test hanging."""
    from cdc_via_flink_spark.operators.reconstruct import reconstruct_from_union

    u = _skew_union(spark, 1_000_000)
    out = reconstruct_from_union(u)
    hot = [r for r in out.collect() if r.txn_id == "hot"]
    # 1M/997 ENDs segment the hot key; every segment but the edge ones
    # holds 997 * 19/20 changes
    assert len(hot) > 900
    assert sum(r.n_events for r in hot) > 900_000


def test_parser_tolerates_schema_evolution(spark):
    """Debezium producers evolve: payloads grow fields (new columns,
    source metadata) this consumer has never seen, and may omit fields
    this consumer knows about. PERMISSIVE from_json must ignore
    unknown fields and null missing ones — an upstream ALTER TABLE
    must not dead-letter the stream or corrupt reconstruction."""
    from cdc_via_flink_spark.operators.debezium import parse_debezium

    evolved = (
        '{"payload":{"op":"u","ts_ms":5,"transaction":{"id":"t1","extra_txn_field":9},'
        '"after":"{}","brand_new_column":"surprise","source":{"db":"d","table":"t"}}}'
    )
    missing = '{"payload":{"op":"c","transaction":{"id":"t2"}}}'  # no ts_ms/after
    env = spark.createDataFrame(
        [(1, evolved), (2, missing)], "seq long, value string"
    )
    parsed = parse_debezium(env).collect()
    by_id = {r["txn_id"]: r for r in parsed}
    assert by_id["t1"]["kind"] == "change" and by_id["t1"]["ts_ms"] == 5
    assert by_id["t2"]["kind"] == "change" and by_id["t2"]["ts_ms"] is None
    assert all(r["kind"] is not None for r in parsed)  # nothing dead-lettered
