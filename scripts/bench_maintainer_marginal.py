"""Differenced steady-state throughput for the dedup and winnow index
maintainers (round-8 VERDICT #1): the one-shot availableNow rates in
STATESTORE_r08_{dedup,winnow}.json conflate FIXED per-epoch cost
(planning, index open, delta commit) with MARGINAL per-doc work — a
100 TB ingest gate is sized on the marginal number.

Methodology (the assembler's, BASELINE.md round-3, adapted): two runs
with the SAME epoch count but different batch sizes over fresh copies
of the same base index —

  run A: E epochs x S docs      run B: E epochs x 2S docs

Fixed cost appears E times in both runs and cancels in the
difference, so

  marginal_docs_per_sec = (docs_B - docs_A) / (wall_B - wall_A)
  fixed_sec_per_epoch   = (wall_A - docs_A / marginal) / E

Each wall cell is min-of-2 (the r8 ambient-measurement lesson:
single-run cells at session end read 5x high). Batches for the two
runs draw from the same disjoint-from-base arrival pool; the runs are
independent (each gets a fresh index), so their doc overlap is
irrelevant.

Batch sizing: a first pass at 125-vs-250 docs/epoch could NOT resolve
the marginal term — run B came back FASTER than run A for the dedup
maintainer (fixed cost ~5.1 s/epoch, 96-100 % of wall; Spark job
planning + index-union open + delta commit swamp 250 docs of work).
So the pools are extended with SYNTHETIC background docs (45 globally
unique words each, the bench_minhash_recall background recipe: zero
shingle collisions) to reach 500-vs-2000 docs/epoch, where the doc
term is 4x and visible. The marginal number therefore prices the
NON-COLLIDING bulk path (shingle/fingerprint + band/fh join + delta
write) — which at 100 TB IS the bulk; duplicate-heavy batches add
verify cost proportional to candidates, priced separately by
STRESS_r*_hotbucket.json.

Prints ONE JSON line; recorded as STATESTORE_r09_marginal.json.
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
    "maint_marginal",
)
E = 4  # epochs per run (identical in A and B so fixed cost cancels)
# run-A batch size; run B uses B_MULT*S. Env-overridable because the
# resolvable sizing is maintainer-specific: the cbloom gate's per-doc
# work is so small that 500-vs-2000 cannot resolve it (the r8
# 125-vs-250 lesson one level up) — it needs 2000-vs-16000.
S = int(os.environ.get("SPARK_GRAFT_MARGINAL_S", "500"))
B_MULT = int(os.environ.get("SPARK_GRAFT_MARGINAL_BMULT", "4"))


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


def _run_once(spark, kind, base, src, tag):
    """One fresh-index maintained run; returns wall seconds."""
    idx = os.path.join(OUT_ROOT, f"idx_{kind}_{tag}")
    pairs = os.path.join(OUT_ROOT, f"pairs_{kind}_{tag}")
    ckpt = os.path.join(OUT_ROOT, f"ckpt_{kind}_{tag}")
    for p in (idx, pairs, ckpt):
        shutil.rmtree(p, ignore_errors=True)
    if kind == "dedup":
        from cdc_via_flink_spark.streaming.dedup_maintenance import (
            dedup_maintenance_query,
            save_streaming_dedup_index,
        )

        save_streaming_dedup_index(base, idx, threshold=0.5)
        maker = lambda st: dedup_maintenance_query(st, idx, pairs, ckpt)  # noqa: E731
    elif kind == "winnow":
        from cdc_via_flink_spark.streaming.winnow_maintenance import (
            save_streaming_winnow_index,
            winnow_maintenance_query,
        )

        save_streaming_winnow_index(base, idx)
        maker = lambda st: winnow_maintenance_query(st, idx, pairs, ckpt)  # noqa: E731
    elif kind == "bloom":
        from cdc_via_flink_spark.operators.bloom import bloom_plan
        from cdc_via_flink_spark.streaming.bloom_maintenance import (
            bloom_maintenance_query,
            save_streaming_bloom_index,
        )

        m_bits, k = bloom_plan(100_000, 0.01)  # sized for base + arrivals
        save_streaming_bloom_index(base, idx, m_bits=m_bits, k=k)
        maker = lambda st: bloom_maintenance_query(st, idx, pairs, ckpt)  # noqa: E731
    elif kind == "cbloom":
        from cdc_via_flink_spark.operators.bloom import bloom_plan
        from cdc_via_flink_spark.streaming.counting_bloom_maintenance import (
            counting_bloom_maintenance_query,
            save_streaming_counting_bloom_index,
        )

        m_bits, k = bloom_plan(100_000, 0.01)  # sized for base + arrivals
        save_streaming_counting_bloom_index(base, idx, m_bits=m_bits, k=k)
        # all-inserts stream: prices the bulk ingest path (deletes are
        # the same per-event hash + counter-delta work with sign -1)
        maker = lambda st: counting_bloom_maintenance_query(  # noqa: E731
            st.withColumn("op", F.lit("c")), idx, pairs, ckpt
        )
    elif kind == "bitmap":
        from cdc_via_flink_spark.streaming.bitmap_maintenance import (
            bitmap_maintenance_query,
            save_streaming_bitmap_index,
        )

        # events shape derived deterministically from the doc stream:
        # 100k-user domain, 28-day span — prices the real per-event
        # path (word aggregate + state join); text is unused.
        def _as_events(st):
            return st.select(
                F.pmod(F.col("doc_id"), 100_000).alias("user_id"),
                F.date_add(
                    F.lit("2024-01-01").cast("date"),
                    F.pmod(F.col("doc_id"), 28).cast("int"),
                ).alias("day"),
            )

        save_streaming_bitmap_index(_as_events(base), idx)
        maker = lambda st: bitmap_maintenance_query(  # noqa: E731
            _as_events(st), idx, pairs, ckpt
        )
    else:
        raise ValueError(
            f"unknown kind {kind!r} (expected dedup|winnow|bloom|cbloom|bitmap)"
        )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    t0 = time.time()
    maker(stream).awaitTermination()
    return time.time() - t0


def main() -> None:
    from cdc_via_flink_spark.session import get_spark

    spark = get_spark("bench-maintainer-marginal")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

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
    light = bool(os.environ.get("SPARK_GRAFT_MARGINAL_LIGHT"))
    while len(arrivals) < need:
        # synthetic background doc: 45 globally unique words, zero
        # shingle/fingerprint collisions with anything else. LIGHT=1
        # swaps in a 1-char text for maintainers that never read text
        # (bitmap) so million-event pools stay driver-cheap.
        words = "x" if light else " ".join(
            f"s{uid:08d}_{j:02d}" for j in range(45)
        )
        arrivals.append((10_000_000 + uid, words))
        uid += 1
    shutil.rmtree(OUT_ROOT, ignore_errors=True)
    os.makedirs(OUT_ROOT)

    def frames(batch_size):
        # interleave real and synthetic docs uniformly across epochs
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

    out: dict = {
        "metric": "maintainer_marginal_throughput",
        "sf_dir": SF_DIR,
        "epochs": E,
        "batch_docs_a": S,
        "batch_docs_b": B_MULT * S,
        "synthetic_docs": max(0, need - 1000),
    }
    kinds = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 else ("dedup", "winnow")
    for kind in kinds:
        wall_a = min(_run_once(spark, kind, base, src_a, f"a{r}") for r in (0, 1))
        wall_b = min(_run_once(spark, kind, base, src_b, f"b{r}") for r in (0, 1))
        docs_a, docs_b = S * E, B_MULT * S * E
        marginal = (docs_b - docs_a) / max(wall_b - wall_a, 1e-9)
        fixed = max(0.0, (wall_a - docs_a / marginal) / E)
        out[kind] = {
            "wall_a_sec": round(wall_a, 2),
            "wall_b_sec": round(wall_b, 2),
            "one_shot_docs_per_sec_a": round(docs_a / wall_a, 1),
            "one_shot_docs_per_sec_b": round(docs_b / wall_b, 1),
            "marginal_docs_per_sec": round(marginal, 1),
            "fixed_sec_per_epoch": round(fixed, 2),
            "fixed_share_of_run_a": round(fixed * E / wall_a, 3),
        }
    print(json.dumps(out))
    spark.stop()
    shutil.rmtree(OUT_ROOT, ignore_errors=True)


if __name__ == "__main__":
    main()
