"""Streaming dedup-maintenance profile at the DERIVED MinHash sizing
(VERDICT r7 #3): STATESTORE_r06's soak curves predate the (54, 18, 3)
banding — the maintained index now computes 3.4x the signature hashes
per micro-batch vs the old (16, 4, 4) fixture sizing, and nothing
measured what that did to docs/s or per-batch index growth.

Workload: the sf0.1 documents table split into a BASE corpus (indexed
once via save_streaming_dedup_index) and B arrival batches streamed
through dedup_maintenance_query (availableNow, maxFilesPerTrigger=1).
Per sizing profile it reports:

  - index build wall (the one-time base cost);
  - streaming wall for all B batches + marginal docs/s;
  - per-epoch delta sizes (banded + docs bytes) and emitted pairs;
  - final index bytes, and bytes/doc (the state-growth rate a
    1000-executor deployment multiplies by its ingest rate).

Profiles measured:
  - derived: minhash_plan(0.5) = (54, 18, 3) — the recall-correct
    production sizing (>=90 % boundary recall);
  - legacy_16_4_4: the pre-r7 fixture sizing (~23 % boundary recall at
    t=0.5) — the r6-comparable control, NOT a recommended config;
  - stream_profile: minhash_plan(0.5, target_miss=0.2) — the
    VERDICT-suggested cheaper per-batch plan (each batch tolerates a
    higher miss rate; periodic compaction at the full sizing would
    restore the bound). Derived, not pinned.

The three profiles use three separate indexes (sizing is validated
against base/meta — mixed probing raises by design).

The ST1 assembler soak (bench_statestore.py) is the same-session
control: run it back-to-back with this and record both, so an
ambient-weather swing shows up in the sizing-independent control
rather than being misread as a sizing cost.

Prints ONE JSON line; recorded as STATESTORE_r{N}_dedup.json.
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp", "dedup_maint"
)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from cdc_via_flink_spark.operators.dedup import minhash_plan
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        dedup_maintenance_query,
        read_emitted_pairs,
        save_streaming_dedup_index,
    )

    spark = get_spark("bench-dedup-maintenance")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    # base = ~80 % of the corpus; arrivals = the rest, in B equal batches
    base = docs.filter(F.pmod(F.col("doc_id"), 5) != 0)
    arrivals = docs.filter(F.pmod(F.col("doc_id"), 5) == 0)
    n_arrive = arrivals.count()

    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    os.makedirs(OUT_ROOT)

    # stage the arrival batches once as ordered files (shared by all
    # profiles — the staging cost is harness, not operator, cost)
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
        t = time.time() - (B - k) * 10  # distinct ascending mtimes
        os.utime(final, (t, t))

    profiles = {
        "derived": dict(zip(("num_hashes", "bands", "rows"), minhash_plan(0.5))),
        "legacy_16_4_4": {"num_hashes": 16, "bands": 4, "rows": 4},
        "stream_profile": dict(
            zip(("num_hashes", "bands", "rows"), minhash_plan(0.5, target_miss=0.2))
        ),
    }

    results: dict = {}
    for pname, sizing in profiles.items():
        idx = os.path.join(OUT_ROOT, f"idx_{pname}")
        pairs = os.path.join(OUT_ROOT, f"pairs_{pname}")
        ckpt = os.path.join(OUT_ROOT, f"ckpt_{pname}")
        t0 = time.time()
        save_streaming_dedup_index(base, idx, threshold=0.5, **sizing)
        build_sec = round(time.time() - t0, 2)
        base_bytes = _du(idx)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.time()
        q = dedup_maintenance_query(
            stream, idx, pairs, ckpt, threshold=0.5, **sizing
        )
        q.awaitTermination()
        stream_sec = round(time.time() - t0, 2)

        droot = os.path.join(idx, "deltas")
        deltas = sorted(os.listdir(droot)) if os.path.isdir(droot) else []
        results[pname] = {
            **sizing,
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

    print(
        json.dumps(
            {
                "metric": "dedup_maintenance_profile",
                "sf_dir": SF_DIR,
                "threshold": 0.5,
                "profiles": results,
            }
        )
    )
    spark.stop()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
