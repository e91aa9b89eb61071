"""Streaming winnow-maintenance profile (the third maintained index's
throughput/state evidence, completing the trio with
STATESTORE_r08_dedup.json and the ANN maintainer's artifacts): sf0.1
documents split 80/20, the 20 % streamed through
winnow_maintenance_query in B batches; reports base build wall,
streaming wall + docs/s, per-epoch delta bytes (fp + count ledger),
emitted pairs, and final index bytes/doc.

Prints ONE JSON line; recorded as STATESTORE_r{N}_winnow.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "winnow_maint_bench",
)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.streaming.winnow_maintenance import (
        read_emitted_pairs,
        save_streaming_winnow_index,
        winnow_maintenance_query,
    )

    spark = get_spark("bench-winnow-maintenance")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    base = docs.filter(F.pmod(F.col("doc_id"), 5) != 0)
    arrivals = docs.filter(F.pmod(F.col("doc_id"), 5) == 0)
    n_arrive = arrivals.count()

    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    os.makedirs(OUT_ROOT)
    src = os.path.join(OUT_ROOT, "src")
    os.makedirs(src)
    for k in range(B):
        fr = arrivals.filter(
            F.pmod((F.col("doc_id") / 5).cast("long"), B) == k
        ).orderBy("doc_id")
        d = os.path.join(src, f"_b{k}")
        fr.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        final = os.path.join(src, f"{k:03d}.parquet")
        os.replace(os.path.join(d, part), final)
        shutil.rmtree(d)
        t = time.time() - (B - k) * 10
        os.utime(final, (t, t))

    idx = os.path.join(OUT_ROOT, "idx")
    pairs = os.path.join(OUT_ROOT, "pairs")
    ckpt = os.path.join(OUT_ROOT, "ckpt")

    t0 = time.time()
    save_streaming_winnow_index(base, idx)
    build_sec = round(time.time() - t0, 2)
    base_bytes = _du(idx)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    winnow_maintenance_query(stream, idx, pairs, ckpt).awaitTermination()
    stream_sec = round(time.time() - t0, 2)

    droot = os.path.join(idx, "deltas")
    deltas = sorted(os.listdir(droot)) if os.path.isdir(droot) else []
    print(
        json.dumps(
            {
                "metric": "winnow_maintenance_profile",
                "sf_dir": SF_DIR,
                "base_docs": n_docs - n_arrive,
                "base_build_sec": build_sec,
                "base_index_bytes": base_bytes,
                "batches": B,
                "arrived_docs": n_arrive,
                "stream_sec": stream_sec,
                "docs_per_sec": round(n_arrive / stream_sec, 1),
                "emitted_pairs": read_emitted_pairs(spark, pairs).count(),
                "delta_bytes_per_epoch": [
                    _du(os.path.join(droot, d)) for d in deltas
                ],
                "final_index_bytes": _du(idx),
                "index_bytes_per_doc": round(_du(idx) / n_docs, 1),
            }
        )
    )
    spark.stop()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
