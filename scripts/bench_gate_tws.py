"""Differenced steady-state throughput: dedup ingest gate, kernel
backend (parquet bitmap + digest corpus, foreachBatch deltas) vs the
transformWithStateInPandas backend (RocksDB state store IS the gate)
— the measured comparison VERDICT r10 #4 asked for.

Methodology = scripts/bench_maintainer_marginal.py (fixed per-epoch
cost cancels in the A/B difference):

  run A: E epochs x S docs      run B: E epochs x B_MULT*S docs
  marginal_docs_per_sec = (docs_B - docs_A) / (wall_B - wall_A)
  fixed_sec_per_epoch   = (wall_A - docs_A / marginal) / E

Each wall cell is min-of-2. Arrival pool = the sf documents not in the
base corpus plus synthetic unique-text background docs (the gate
hashes ONE digest per doc, so text length is immaterial); every run
gets a fresh index/checkpoint. The TWS run prices the same verdict
semantics (state read + conditional update per digest) plus the
initial-state corpus seeding, which happens once in epoch 1 and is
therefore part of the FIXED term the differencing cancels.

Prints ONE JSON line; recorded as STATESTORE_r11_gate_tws.json.
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
    "gate_tws_marginal",
)
E = 4
S = int(os.environ.get("SPARK_GRAFT_MARGINAL_S", "2000"))
B_MULT = int(os.environ.get("SPARK_GRAFT_MARGINAL_BMULT", "8"))


def _stage(spark, frames, dest):
    os.makedirs(dest, exist_ok=True)
    for k, fr in enumerate(frames):
        d = os.path.join(dest, f"_b{k}")
        fr.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        final = os.path.join(dest, f"{k:03d}.parquet")
        os.replace(os.path.join(d, part), final)
        shutil.rmtree(d)
        t = time.time() - (len(frames) - k) * 10
        os.utime(final, (t, t))


def _run_kernel(spark, base, src, tag) -> float:
    from cdc_via_flink_spark.plans.dedup_queries import BLOOM_K, BLOOM_M
    from cdc_via_flink_spark.streaming.ingest_gate import (
        gated_dedup_query,
        save_gated_dedup_index,
    )

    idx = os.path.join(OUT_ROOT, f"idx_kernel_{tag}")
    out = os.path.join(OUT_ROOT, f"out_kernel_{tag}")
    ckpt = os.path.join(OUT_ROOT, f"ckpt_kernel_{tag}")
    for p in (idx, out, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    save_gated_dedup_index(base, idx, m_bits=BLOOM_M, k=BLOOM_K)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    gated_dedup_query(stream, idx, out, ckpt).awaitTermination()
    return time.time() - t0


def _run_tws(spark, base, src, tag) -> float:
    from cdc_via_flink_spark.streaming.ingest_gate_tws import (
        gated_dedup_stream_tws,
    )

    ckpt = os.path.join(OUT_ROOT, f"ckpt_tws_{tag}")
    shutil.rmtree(ckpt, ignore_errors=True)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ep", F.pmod(F.col("doc_id"), E).cast("long"))
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        verd = gated_dedup_stream_tws(stream, base)
        t0 = time.time()
        q = (
            verd.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return time.time() - t0
    finally:
        if prev:
            spark.conf.set(provider_key, prev)
        else:
            spark.conf.unset(provider_key)


def main() -> None:
    from cdc_via_flink_spark.session import get_spark
    from cdc_via_flink_spark.vendor.proto_compat import (
        ensure_protobuf,
        ship_to_workers,
    )

    spark = get_spark("bench-gate-tws")
    if ensure_protobuf() == "unavailable":
        raise SystemExit("no protobuf and the vendored shim failed to load")
    ship_to_workers(spark)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    base = docs.filter(F.pmod(F.col("doc_id"), 5) != 0)
    arrivals = [
        (r.doc_id, r.text)
        for r in docs.filter(F.pmod(F.col("doc_id"), 5) == 0)
        .orderBy("doc_id")
        .collect()
    ]
    need = B_MULT * S * E
    uid = 0
    while len(arrivals) < need:
        arrivals.append(
            (10_000_000 + uid, " ".join(f"g{uid:08d}_{j}" for j in range(8)))
        )
        uid += 1
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    os.makedirs(OUT_ROOT)

    def frames(batch_size):
        rows = arrivals[: batch_size * E]
        return [
            spark.createDataFrame(
                rows[k::E][:batch_size], "doc_id long, text string"
            )
            for k in range(E)
        ]

    src_a = os.path.join(OUT_ROOT, "src_a")
    src_b = os.path.join(OUT_ROOT, "src_b")
    _stage(spark, frames(S), src_a)
    _stage(spark, frames(B_MULT * S), src_b)

    result: dict = {
        "metric": "gate_backend_marginal_throughput",
        "sf_dir": SF_DIR,
        "epochs": E,
        "batch_docs_a": S,
        "batch_docs_b": B_MULT * S,
    }
    for kind, runner in (("kernel", _run_kernel), ("tws", _run_tws)):
        wall_a = min(
            runner(spark, base, src_a, f"a{i}") for i in range(2)
        )
        wall_b = min(
            runner(spark, base, src_b, f"b{i}") for i in range(2)
        )
        docs_a, docs_b = S * E, B_MULT * S * E
        marginal = (docs_b - docs_a) / max(wall_b - wall_a, 1e-9)
        fixed = (wall_a - docs_a / marginal) / E
        result[kind] = {
            "wall_a_sec": round(wall_a, 2),
            "wall_b_sec": round(wall_b, 2),
            "one_shot_docs_per_sec_a": round(docs_a / wall_a, 1),
            "one_shot_docs_per_sec_b": round(docs_b / wall_b, 1),
            "marginal_docs_per_sec": round(marginal, 1),
            "fixed_sec_per_epoch": round(fixed, 2),
        }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
