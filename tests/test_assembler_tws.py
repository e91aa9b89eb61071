"""transformWithStateInPandas assembler (streaming/assembler_tws.py)
vs the batch twin — skipped where pyspark's protobuf dependency is
absent (see the module's ENVIRONMENT GATE note)."""

from __future__ import annotations

import pytest

from tests.conftest import SF0001

pytest.importorskip("google.protobuf", reason="transformWithState worker needs protobuf")

from pyspark.sql import functions as F  # noqa: E402

from cdc_via_flink_spark.operators.debezium import parse_debezium  # noqa: E402
from cdc_via_flink_spark.plans.registry import load_all  # noqa: E402
from cdc_via_flink_spark.plans.streaming_queries import (  # noqa: E402
    _run_to_memory,
    _staged_envelope_stream,
)
from cdc_via_flink_spark.sources.tables import load_table  # noqa: E402
from cdc_via_flink_spark.streaming.assembler_tws import (  # noqa: E402
    assemble_transactions_stream_tws,
)


def test_tws_matches_batch_twin(spark):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    parsed = parse_debezium(_staged_envelope_stream(spark, SF0001))
    base_ms = (
        load_table(spark, SF0001, "events").agg(F.max("ts_ms").alias("m")).collect()[0]["m"]
    )
    event_time = F.coalesce(
        F.timestamp_millis(F.col("ts_ms")),
        F.timestamp_millis(F.lit(base_ms) + F.col("seq")),
    )
    out = _run_to_memory(
        assemble_transactions_stream_tws(parsed, event_time=event_time), "append"
    )
    got = {(r.txn_id, r.end_seq): (r.n_events, r.ops_concat) for r in out.collect()}
    exp_df = load_all()["cdc_reconstruct_end"].fn(spark, SF0001)
    exp = {(r.txn_id, r.end_seq): (r.n_events, r.ops_concat) for r in exp_df.collect()}
    assert got == exp
