"""Observed-metrics accounting (functions/metrics.py): per-stage
attrition collected as a side effect of ONE action, matching the
recomputed ground truth — and the streaming form surfacing per-batch
numbers through StreamingQueryProgress.observedMetrics."""

from __future__ import annotations

import os

from pyspark.sql import Observation, functions as F

from cdc_via_flink_spark.functions.metrics import observe_stage
from cdc_via_flink_spark.functions.text import normalize_text
from cdc_via_flink_spark.sources.tables import load_table

from .conftest import SF0001


def test_batch_attrition_single_action(spark):
    d = load_table(spark, SF0001, "documents")
    o_in, o_len, o_tok = Observation("in"), Observation("len"), Observation("tok")

    staged = observe_stage(d, o_in)
    staged = observe_stage(staged.filter(F.col("n_chars") >= 100), o_len)
    staged = observe_stage(
        staged.filter(
            F.size(F.split(normalize_text(F.col("text")), " ")) >= 20
        ),
        o_tok,
        F.sum("n_chars").alias("chars"),
    )
    survivors = staged.count()  # the ONE action

    n_in, n_len, n_tok = (
        o_in.get["rows"],
        o_len.get["rows"],
        o_tok.get["rows"],
    )
    assert n_in >= n_len >= n_tok == survivors
    assert n_in == d.count()
    assert n_len == d.filter(F.col("n_chars") >= 100).count()
    assert o_tok.get["chars"] > 0


def test_streaming_observed_metrics_per_batch(spark, tmp_path):
    ev = load_table(spark, SF0001, "events").select("event_id", "event_type")
    src = str(tmp_path / "src")
    ev.coalesce(1).write.parquet(src)
    sev = spark.readStream.schema(ev.schema).parquet(src)
    observed = sev.observe(
        "ingest",
        F.count(F.lit(1)).alias("rows"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchases"),
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    progresses = [p for p in q.recentProgress if p["observedMetrics"]]
    assert progresses, "no batch carried observed metrics"
    m = progresses[-1]["observedMetrics"]["ingest"]
    assert m["rows"] == ev.count()
    assert m["purchases"] == ev.filter(F.col("event_type") == "purchase").count()
