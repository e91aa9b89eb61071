"""Throughput of the round-4 streaming operators (complements
bench_streaming.py's ST1 assembler numbers):

- temporal: events/s through the stateful temporal table join
  (streaming/temporal.py) — union-tagged events replay, single
  availableNow pass, TTL flush via sentinels.
- neardup: docs/s through map-side MinHash banding + LSH keeper
  election (streaming/neardup.py).

Usage: python scripts/bench_streaming_ops.py [temporal|neardup|all]
Prints one JSON line per op. SF dir from $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_temporal(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.plans.streaming_queries import (
        stream_temporal_join,
    )

    n = None
    t0 = time.monotonic()
    out = stream_temporal_join(spark, sf_dir)
    n_out = out.count()
    wall = time.monotonic() - t0
    from cdc_via_flink_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "events").count()
    return {
        "metric": "temporal_join_stream_throughput",
        "value": round(n / wall, 1),
        "unit": "events_per_sec",
        "wall_s": round(wall, 2),
        "n_events": n,
        "n_out": n_out,
        "sf_dir": sf_dir,
    }


def bench_neardup(spark, sf_dir: str) -> dict:
    from cdc_via_flink_spark.plans.streaming_queries import stream_neardup_lsh
    from cdc_via_flink_spark.sources.tables import load_table

    t0 = time.monotonic()
    out = stream_neardup_lsh(spark, sf_dir)
    n_out = out.count()
    wall = time.monotonic() - t0
    n = load_table(spark, sf_dir, "documents").count()
    return {
        "metric": "neardup_lsh_stream_throughput",
        "value": round(n / wall, 1),
        "unit": "docs_per_sec",
        "wall_s": round(wall, 2),
        "n_docs": n,
        "n_collisions": n_out,
        "sf_dir": sf_dir,
    }


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cdc_via_flink_spark.session import get_spark

    spark = get_spark("cdc_via_flink_spark-stream-ops-bench")
    if which in ("temporal", "all"):
        print(json.dumps(bench_temporal(spark, sf_dir)))
    if which in ("neardup", "all"):
        print(json.dumps(bench_neardup(spark, sf_dir)))
    spark.stop()


if __name__ == "__main__":
    main()
