"""Streaming incremental corpus dedup — the MAINTAINED form of
operators/dedup.py::incremental_neardup_pairs (SURVEY.md X1 + ST5;
the text-side twin of streaming/ann_maintenance.py): documents arrive
as a stream, and every micro-batch is

  1. near-dup-checked against the maintained signature index
     (base ∪ COMMITTED deltas) AND against itself — emitting exactly
     the verified pairs that involve a batch document;
  2. appended to the index as a crash-atomic committed DELTA (banded
     signatures + the batch's docs, so later batches can exact-verify
     against it).

Crash-atomicity (exactly-once epochs, compaction recovery, foreign-
checkpoint refusal) comes from the shared maintained-index kernel
(streaming/index_kernel.py); this adapter contributes the dedup
content: what a delta holds, the sizing/hash-family meta validation,
and the pair emission per epoch.

Because batch k sees base ∪ batches < k in the index and itself via
the skew-guarded self-join, the UNION of all epochs' pair outputs
equals the one-shot batch incremental run over (base, all new docs) —
which itself equals the monolithic full-corpus LSH restricted to
new-involving pairs. Each pair is found exactly once (at the epoch of
its max-epoch member). Pinned by tests/test_dedup_maintenance.py and
the declared stream_incremental_neardup query's restricted full-LSH
oracle.

Scale: per-batch work = shingling/hashing the BATCH (old docs are
re-shingled only when they land in a candidate pair — the
incremental_neardup_pairs contract), one equi-join against the stored
band rows, and a delta-sized write; the base index is never rewritten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from cdc_via_flink_spark.streaming import index_kernel as ik

DEDUP_PTR = "_DEDUP_COMMITTED"
COMPACT_MARKER = ik.COMPACT_MARKER

# schema of the emitted verified-pair frames (jaccard_on_pairs output)
PAIRS_SCHEMA = (
    "id_a bigint, id_b bigint, inter bigint, size_a bigint, "
    "size_b bigint, jaccard double"
)

# maintainer sizing profiles (VERDICT r8 #8): "exact" derives
# minhash_plan(threshold) — the full boundary-recall bound, the same
# plan the batch pipeline and save_streaming_dedup_index default to;
# "streaming" derives minhash_plan(threshold, target_miss=0.2) — a
# 20 % per-batch boundary-miss budget for latency-sensitive ingest
# gates (~1.55x the exact profile's docs/s at t=0.5, measured in
# STATESTORE_r08_dedup.json), with the full bound restored by
# periodically re-running the batch pipeline at the exact plan over
# the compacted corpus (pinned by
# test_streaming_profile_compaction_restores_recall).
STREAMING_TARGET_MISS = 0.2


def _read_ptr(index_path: str) -> tuple[int, str] | None:
    return ik.read_ptr(index_path, DEDUP_PTR)


def _write_ptr(index_path: str, epoch: int, run: str) -> None:
    ik.write_ptr(index_path, DEDUP_PTR, epoch, run)


def _committed_deltas(index_path: str) -> list[str]:
    return ik.committed_deltas(index_path, DEDUP_PTR)


def resolve_profile_banding(
    num_hashes: int | None,
    bands: int | None,
    rows: int | None,
    threshold: float,
    profile: str = "exact",
) -> tuple[int, int, int]:
    """Resolve maintainer banding for a named profile. Explicit pins
    win over the profile; otherwise "exact" = minhash_plan(threshold)
    and "streaming" = minhash_plan(threshold, target_miss=0.2)."""
    from cdc_via_flink_spark.operators.dedup import minhash_plan, resolve_banding

    if profile not in ("exact", "streaming"):
        raise ValueError(f"unknown dedup maintainer profile {profile!r}; "
                         "expected 'exact' or 'streaming'")
    if all(v is None for v in (num_hashes, bands, rows)) and profile == "streaming":
        return minhash_plan(threshold, target_miss=STREAMING_TARGET_MISS)
    return resolve_banding(num_hashes, bands, rows, threshold)


def save_streaming_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    rows: int | None = None,
    threshold: float = 0.5,
    profile: str = "exact",
) -> None:
    """Base index for the maintained flow: banded signatures (the
    save_dedup_index layout) PLUS the docs themselves (id, text) so
    later batches can exact-verify candidate pairs against corpus
    members without a side channel. Both live under ONE `base/` dir so
    compaction can publish a folded replacement with a single
    two-rename swap (the ANN compaction recipe). Sizing defaults to
    the profile's derived plan (see resolve_profile_banding);
    `base/meta` pins it plus the hash-family version, and
    dedup_maintenance_query validates its own resolved sizing against
    that meta at start — a maintainer probing at a different sizing or
    hash family fails loudly instead of silently colliding on nothing
    (ADVICE r7). Build the index and the maintainer with the SAME
    profile (the meta validation enforces it)."""
    from cdc_via_flink_spark.operators.dedup import (
        _banded_signatures,
        write_minhash_meta,
    )

    num_hashes, bands, rows = resolve_profile_banding(
        num_hashes, bands, rows, threshold, profile
    )
    banded, _sh = _banded_signatures(df, text_col, id_col, num_hashes, bands, rows)
    banded.repartition("band", "bsig").sortWithinPartitions(
        "band", "bsig"
    ).write.mode("overwrite").parquet(path + "/base/banded")
    df.select(
        df[id_col].alias("doc_id"), df[text_col].alias("text")
    ).write.mode("overwrite").parquet(path + "/base/docs")
    write_minhash_meta(
        df.sparkSession, path + "/base/meta", num_hashes, bands, rows, threshold
    )


def read_dedup_index(
    spark: SparkSession, index_path: str
) -> tuple[DataFrame, DataFrame]:
    """(banded, docs) over base ∪ committed deltas. Recovers a crashed
    compaction first (deterministic from side-dir state), so readers
    never observe the mid-swap window."""
    ik.recover_compaction(index_path, "base")
    banded = spark.read.parquet(index_path + "/base/banded")
    docs = spark.read.parquet(index_path + "/base/docs")
    for d in _committed_deltas(index_path):
        banded = banded.unionByName(spark.read.parquet(d + "/banded"))
        docs = docs.unionByName(spark.read.parquet(d + "/docs"))
    return banded, docs


def _recover_compaction(index_path: str) -> None:
    ik.recover_compaction(index_path, "base")


def compact_dedup_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base (Delta OPTIMIZE analog for
    the dedup index). The maintenance pointer is left untouched — its
    epoch high-water must survive so a replay of an already-folded
    epoch still skips. MAINTAINER MUST BE STOPPED. Sizing/hash-family
    meta is invariant under compaction (signatures are folded, never
    recomputed) — the kernel carries it into the replacement base.
    Returns {"deltas_folded": n}."""

    def write_folded(tmp: str) -> None:
        banded, docs = read_dedup_index(spark, index_path)
        banded.repartition("band", "bsig").sortWithinPartitions(
            "band", "bsig"
        ).write.mode("overwrite").parquet(tmp + "/banded")
        docs.write.mode("overwrite").parquet(tmp + "/docs")

    return ik.compact_index(
        index_path, DEDUP_PTR, "base", write_folded, copy_meta=True
    )


def dedup_maintenance_query(
    new_docs: DataFrame,
    index_path: str,
    pairs_out: str,
    checkpoint_dir: str,
    num_hashes: int | None = None,
    bands: int | None = None,
    rows: int | None = None,
    threshold: float = 0.5,
    profile: str = "exact",
) -> StreamingQuery:
    """Start the maintained dedup gate over a streaming document frame
    (doc_id long, text string). Verified new-involving pairs land in
    pairs_out/e<epoch>; the batch joins the index as delta e<epoch>.
    Caller awaits the query.

    The maintainer's resolved sizing is validated against the index's
    `base/meta` (written by save_streaming_dedup_index) BEFORE the
    stream starts: a sizing or hash-family mismatch would band the
    batch onto (band, bsig) keys the stored index never produces —
    zero candidates, no error, recall silently gone (ADVICE r7) — so
    it raises here instead.

    THROUGHPUT vs RECALL (measured, STATESTORE_r08_dedup.json): the
    default profile="exact" derives minhash_plan(0.5) = (54, 18, 3)
    and sustains ~0.49x the docs/s of the old (16, 4, 4) fixture
    sizing (which missed ~77 % of boundary pairs) at ~2.2x the index
    bytes/doc. CAPACITY (differenced, STATESTORE_r09_marginal.json):
    those one-shot rates are dominated by FIXED per-epoch cost
    (~4.8 s/epoch: planning + index open + three delta/pairs commits
    — 96 % of a 500-doc epoch's wall); the MARGINAL rate on the
    non-colliding bulk is ~2,300 docs/s per local[32] host, which is
    the number a 100 TB ingest gate sizes against once micro-batches
    are large enough to amortize the epoch overhead. profile="streaming" derives
    minhash_plan(threshold, target_miss=0.2) = (39, 13, 3) at t=0.5,
    ~1.55x the exact profile's throughput — accepting a 20 % per-batch
    boundary-miss budget, and restoring the full bound by periodically
    re-running the batch pipeline at the exact plan over the compacted
    corpus (pinned by test_streaming_profile_compaction_restores_recall).
    Build the index and the maintainer with the SAME profile either
    way (the meta validation enforces it).
    """
    from cdc_via_flink_spark.operators.dedup import (
        _banded_signatures,
        check_minhash_meta,
        incremental_neardup_pairs,
    )

    num_hashes, bands, rows = resolve_profile_banding(
        num_hashes, bands, rows, threshold, profile
    )
    check_minhash_meta(
        new_docs.sparkSession, index_path + "/base/meta", num_hashes, bands, rows
    )

    def process(batch: DataFrame, epoch_id: int, delta_tmp: str) -> None:
        spark = batch.sparkSession
        old_banded, old_docs = read_dedup_index(spark, index_path)
        pairs = incremental_neardup_pairs(
            old_docs,
            batch,
            "text",
            "doc_id",
            num_hashes,
            bands,
            rows,
            threshold,
            old_banded=old_banded,
        )
        ik.publish_epoch_output(pairs, pairs_out, epoch_id)

        banded, _sh = _banded_signatures(
            batch, "text", "doc_id", num_hashes, bands, rows
        )
        banded.write.mode("overwrite").parquet(delta_tmp + "/banded")
        batch.select("doc_id", "text").write.mode("overwrite").parquet(
            delta_tmp + "/docs"
        )

    return ik.run_maintenance(
        new_docs,
        index_path,
        DEDUP_PTR,
        "dedup index",
        checkpoint_dir,
        process,
        gc_roots=(pairs_out,),
    )


def read_emitted_pairs(
    spark: SparkSession, pairs_out: str, index_path: str | None = None
) -> DataFrame:
    """Union of emitted pair epochs. With ``index_path`` given, only
    epochs covered by the index's COMMITTED pointer are read (an epoch
    published by a crash that died before its pointer commit is
    excluded — it will be rewritten on replay); without it, all
    published epochs. Empty output → an empty typed frame, not an
    error (round-8 ADVICE)."""
    return ik.read_epoch_outputs(
        spark,
        pairs_out,
        PAIRS_SCHEMA,
        index_path=index_path,
        ptr_name=DEDUP_PTR if index_path is not None else None,
    )
