"""Streaming incremental corpus dedup — the MAINTAINED form of
operators/dedup.py::incremental_neardup_pairs (SURVEY.md X1 + ST5;
the text-side twin of streaming/ann_maintenance.py): documents arrive
as a stream, and every micro-batch is

  1. near-dup-checked against the maintained signature index
     (base ∪ COMMITTED deltas) AND against itself — emitting exactly
     the verified pairs that involve a batch document;
  2. appended to the index as a crash-atomic committed DELTA (banded
     signatures + the batch's docs, so later batches can exact-verify
     against it), behind the same epoch + checkpoint-identity pointer
     recipe as the ANN maintainer: tmp-dir staging, one-rename
     publish, pointer commit last, orphan GC, replayed epochs skipped,
     foreign checkpoints refused.

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

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

DEDUP_PTR = "_DEDUP_COMMITTED"


def _read_ptr(index_path: str) -> tuple[int, str] | None:
    p = os.path.join(index_path, DEDUP_PTR)
    if not os.path.exists(p):
        return None
    epoch, _, run = open(p).read().strip().partition("\t")
    return int(epoch), run


def _write_ptr(index_path: str, epoch: int, run: str) -> None:
    tmp = os.path.join(index_path, DEDUP_PTR + ".tmp")
    with open(tmp, "w") as f:
        f.write(f"{epoch}\t{run}")
    os.replace(tmp, os.path.join(index_path, DEDUP_PTR))


def _committed_deltas(index_path: str) -> list[str]:
    ptr = _read_ptr(index_path)
    if ptr is None:
        return []
    droot = os.path.join(index_path, "deltas")
    if not os.path.isdir(droot):
        return []
    out = [
        os.path.join(droot, d)
        for d in os.listdir(droot)
        if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= ptr[0]
    ]
    return sorted(out, key=lambda p: int(os.path.basename(p)[1:]))


def save_streaming_dedup_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int | None = None,
    bands: int | None = None,
    rows: int | None = None,
    threshold: float = 0.5,
) -> None:
    """Base index for the maintained flow: banded signatures (the
    save_dedup_index layout) PLUS the docs themselves (id, text) so
    later batches can exact-verify candidate pairs against corpus
    members without a side channel. Both live under ONE `base/` dir so
    compaction can publish a folded replacement with a single
    two-rename swap (the ANN compaction recipe). Sizing defaults to
    minhash_plan(threshold); `base/meta` pins it plus the hash-family
    version, and dedup_maintenance_query validates its own resolved
    sizing against that meta at start — a maintainer probing at a
    different sizing or hash family fails loudly instead of silently
    colliding on nothing (ADVICE r7)."""
    from cdc_via_flink_spark.operators.dedup import (
        _banded_signatures,
        resolve_banding,
        write_minhash_meta,
    )

    num_hashes, bands, rows = resolve_banding(num_hashes, bands, rows, threshold)
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
    _recover_compaction(index_path)
    banded = spark.read.parquet(index_path + "/base/banded")
    docs = spark.read.parquet(index_path + "/base/docs")
    for d in _committed_deltas(index_path):
        banded = banded.unionByName(spark.read.parquet(d + "/banded"))
        docs = docs.unionByName(spark.read.parquet(d + "/docs"))
    return banded, docs


COMPACT_MARKER = "_COMPACTING"


def _recover_compaction(index_path: str) -> None:
    """Make the index consistent after a crash at ANY point of
    compact_dedup_index's sequence (the ann_maintenance recipe over
    the single `base/` unit): the marker records the max folded epoch;
    which of base/_base_old/_base_compact_tmp exist determines whether
    to abort the fold, finish the swap, or finish the cleanup."""
    marker = os.path.join(index_path, COMPACT_MARKER)
    base = os.path.join(index_path, "base")
    old = os.path.join(index_path, "_base_old")
    tmp = os.path.join(index_path, "_base_compact_tmp")
    if not os.path.exists(marker):
        shutil.rmtree(tmp, ignore_errors=True)  # pre-marker orphan
        return
    max_epoch = int(open(marker).read().strip())
    if os.path.isdir(tmp) and os.path.isdir(base) and not os.path.isdir(old):
        # fold prepared but not applied: abort (deltas intact)
        shutil.rmtree(tmp)
        os.remove(marker)
        return
    if os.path.isdir(old) and not os.path.isdir(base):
        os.rename(tmp, base)  # crashed between the two renames: finish
    droot = os.path.join(index_path, "deltas")
    if os.path.isdir(droot):
        for d in os.listdir(droot):
            if d.startswith("e") and d[1:].isdigit() and int(d[1:]) <= max_epoch:
                shutil.rmtree(os.path.join(droot, d), ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)


def compact_dedup_index(spark: SparkSession, index_path: str) -> dict:
    """Fold committed deltas into the base (Delta OPTIMIZE analog for
    the dedup index). The maintenance pointer is left untouched — its
    epoch high-water must survive so a replay of an already-folded
    epoch still skips. MAINTAINER MUST BE STOPPED (same contract as
    the ANN compaction). Crash at any step recovers deterministically
    via _recover_compaction. Returns {"deltas_folded": n}."""
    _recover_compaction(index_path)
    deltas = _committed_deltas(index_path)
    if not deltas:
        return {"deltas_folded": 0}
    max_epoch = max(int(os.path.basename(d)[1:]) for d in deltas)
    banded, docs = read_dedup_index(spark, index_path)
    base = os.path.join(index_path, "base")
    old = os.path.join(index_path, "_base_old")
    tmp = os.path.join(index_path, "_base_compact_tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    banded.repartition("band", "bsig").sortWithinPartitions(
        "band", "bsig"
    ).write.mode("overwrite").parquet(tmp + "/banded")
    docs.write.mode("overwrite").parquet(tmp + "/docs")
    if os.path.isdir(base + "/meta"):
        # sizing/hash-family meta is invariant under compaction
        # (signatures are folded, never recomputed) — carry it into
        # the replacement base so the swap preserves validation
        shutil.copytree(base + "/meta", tmp + "/meta")
    marker = os.path.join(index_path, COMPACT_MARKER)
    with open(marker + ".tmp", "w") as f:
        f.write(str(max_epoch))
    os.replace(marker + ".tmp", marker)
    os.rename(base, old)
    os.rename(tmp, base)
    for d in deltas:
        shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    os.remove(marker)
    return {"deltas_folded": len(deltas)}


def dedup_maintenance_query(
    new_docs: DataFrame,
    index_path: str,
    pairs_out: str,
    checkpoint_dir: str,
    num_hashes: int | None = None,
    bands: int | None = None,
    rows: int | None = None,
    threshold: float = 0.5,
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
    derived batch sizing minhash_plan(0.5) = (54, 18, 3) sustains
    ~0.49x the docs/s of the old (16, 4, 4) fixture sizing (which
    missed ~77 % of boundary pairs) at ~2.2x the index bytes/doc. A
    latency-sensitive deployment can run the maintainer at a DERIVED
    streaming profile — minhash_plan(threshold, target_miss=0.2)
    = (39, 13, 3) at t=0.5, ~1.55x the derived throughput — accepting
    a 20 % per-batch boundary-miss budget, and restore the full bound
    by periodically re-running the batch pipeline at the default plan
    over the compacted corpus. Build the index and the maintainer
    with the SAME plan either way (the meta validation enforces it).
    """
    from cdc_via_flink_spark.operators.dedup import (
        _banded_signatures,
        check_minhash_meta,
        incremental_neardup_pairs,
        resolve_banding,
    )

    num_hashes, bands, rows = resolve_banding(num_hashes, bands, rows, threshold)
    check_minhash_meta(
        new_docs.sparkSession, index_path + "/base/meta", num_hashes, bands, rows
    )
    run_key = os.path.abspath(checkpoint_dir)
    droot = os.path.join(index_path, "deltas")

    def sink(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        committed = _read_ptr(index_path)
        if committed is not None and committed[1] not in ("", run_key):
            raise RuntimeError(
                f"dedup index {index_path!r} is maintained by checkpoint "
                f"{committed[1]!r}; refusing epochs from {run_key!r} — "
                "epoch ids are checkpoint-scoped."
            )
        if committed is not None and epoch_id <= committed[0]:
            return  # replayed epoch already committed — skip
        os.makedirs(droot, exist_ok=True)
        os.makedirs(pairs_out, exist_ok=True)
        for root in (droot, pairs_out):
            for d in os.listdir(root):
                if d.startswith("_tmp_"):
                    shutil.rmtree(os.path.join(root, d), ignore_errors=True)

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
        ptmp = os.path.join(pairs_out, f"_tmp_{uuid.uuid4().hex}")
        pairs.write.mode("overwrite").parquet(ptmp)
        pfinal = os.path.join(pairs_out, f"e{epoch_id}")
        if os.path.isdir(pfinal):
            shutil.rmtree(pfinal)  # crash between renames: rewrite
        os.replace(ptmp, pfinal)

        banded, _sh = _banded_signatures(
            batch, "text", "doc_id", num_hashes, bands, rows
        )
        dtmp = os.path.join(droot, f"_tmp_{uuid.uuid4().hex}")
        banded.write.mode("overwrite").parquet(dtmp + "/banded")
        batch.select("doc_id", "text").write.mode("overwrite").parquet(
            dtmp + "/docs"
        )
        dfinal = os.path.join(droot, f"e{epoch_id}")
        if os.path.isdir(dfinal):
            shutil.rmtree(dfinal)
        os.replace(dtmp, dfinal)
        _write_ptr(index_path, epoch_id, run_key)

    return (
        new_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_emitted_pairs(spark: SparkSession, pairs_out: str) -> DataFrame:
    """Union of all committed epochs' pair outputs."""
    dirs = sorted(
        os.path.join(pairs_out, d)
        for d in os.listdir(pairs_out)
        if d.startswith("e") and d[1:].isdigit()
    )
    out = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        out = out.unionByName(spark.read.parquet(d))
    return out
