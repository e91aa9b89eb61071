"""Observed metrics: pipeline accounting WITHOUT extra actions.

A curation pipeline wants per-stage attrition numbers (docs in, docs
surviving each gate) — but calling .count() per stage re-runs the
upstream plan once per stage, which at 100 TB turns one pass into
five. `DataFrame.observe` attaches aggregate metrics to a point in the
plan that are collected as a side effect of the ONE real action, so
the accounting is free.

Batch: pass an `Observation` per stage and read `.get` after the
action. Streaming: pass named observe() columns and read
`StreamingQueryProgress.observedMetrics` per batch — same API, the
per-batch numbers the reference's console logging approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F


def observe_stage(df: DataFrame, obs: Observation, *extra) -> DataFrame:
    """Attach row-count (+ optional extra aggregate columns) at this
    point of the plan; read obs.get after the query's single action."""
    return df.observe(obs, F.count(F.lit(1)).alias("rows"), *extra)
