"""Streaming winnow-index maintenance (streaming/winnow_maintenance.py):
the union of per-epoch pair outputs equals the sum of per-epoch
incremental gates (= the monolithic restriction when no fingerprint
crosses the cap between epochs, as at fixture scale); epochs are
replay-idempotent, foreign checkpoints refused, compaction is a pure
physical rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.winnow import (
    WINNOW_MIN_SHARED,
    winnow_fingerprints,
)
from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.winnow_maintenance import (
    _committed_deltas,
    compact_winnow_index,
    read_emitted_pairs,
    read_winnow_index,
    save_streaming_winnow_index,
    winnow_maintenance_query,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"


def _corpus(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    new = d.filter(F.col("doc_id") % 5 == 0)
    old = d.filter(F.col("doc_id") % 5 != 0)
    return d, old, new


def _monolithic_restricted(spark, d, new):
    """Monolithic winnow pairs over d, restricted to new-involving —
    the expected union at fixture scale (no cap crossing between
    epochs)."""
    fp = winnow_fingerprints(d)
    keep = (
        fp.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= 256))
        .select("fh")
    )
    pruned = fp.join(keep, "fh", "left_semi")
    mono = (
        pruned.alias("a")
        .join(
            pruned.alias("b"),
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )
    new_ids = {r.doc_id for r in new.collect()}
    return sorted(
        tuple(r)
        for r in mono.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    )


def _run(spark, tmp_path, old, new, name):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_pairs")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_winnow_index(old, idx)
    frames = [
        new.filter(F.pmod(F.col("doc_id"), 3) == k).orderBy("doc_id")
        for k in range(3)
    ]
    dest = os.path.join(STAGE_ROOT, f"winnow_maint_{name}")
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    winnow_maintenance_query(stream, idx, out, ckpt).awaitTermination()
    return idx, out, ckpt, dest


def test_epoch_union_replay_and_foreign_checkpoint(spark, tmp_path):
    d, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "main")

    got = sorted(tuple(r) for r in read_emitted_pairs(spark, out).collect())
    expected = _monolithic_restricted(spark, d, new)
    assert got == expected and len(got) > 0
    assert len(_committed_deltas(idx)) == 3

    # replay idempotency: a fresh query on the SAME checkpoint and
    # source has nothing new — outputs and committed epochs unchanged
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    winnow_maintenance_query(stream, idx, out, ckpt).awaitTermination()
    assert sorted(os.listdir(out)) == before
    got2 = sorted(tuple(r) for r in read_emitted_pairs(spark, out).collect())
    assert got2 == expected

    # foreign checkpoint refused
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = winnow_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_winnow_compaction_pure_physical_rewrite(spark, tmp_path):
    """Folding deltas into base changes no reader-visible state: fp
    rows and per-fh count sums survive, meta survives, folded epochs
    stay skipped on replay, and a crashed fold (marker + tmp, swap not
    applied) aborts with the deltas intact."""
    d, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "compact")

    fp_before, cnt_before = read_winnow_index(spark, idx)
    nf = fp_before.count()
    cnt_map = {r.fh: r.n_docs for r in cnt_before.collect()}
    assert len(_committed_deltas(idx)) == 3

    # crashed-fold state: marker + tmp, swap not applied -> abort
    os.makedirs(os.path.join(idx, "_base_compact_tmp"))
    with open(os.path.join(idx, "_COMPACTING"), "w") as f:
        f.write("2")
    fp_rec, _ = read_winnow_index(spark, idx)  # recovery runs
    assert not os.path.exists(os.path.join(idx, "_COMPACTING"))
    assert len(_committed_deltas(idx)) == 3
    assert fp_rec.count() == nf

    res = compact_winnow_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert _committed_deltas(idx) == []
    fp_after, cnt_after = read_winnow_index(spark, idx)
    assert fp_after.count() == nf
    assert {r.fh: r.n_docs for r in cnt_after.collect()} == cnt_map
    # meta preserved -> a fresh maintainer still validates
    from cdc_via_flink_spark.operators.winnow import check_winnow_meta

    check_winnow_meta(spark, idx + "/base")

    # replay after compaction: folded epochs still skip, output stable
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    winnow_maintenance_query(stream, idx, out, ckpt).awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_maintainer_rejects_mismatched_index(spark, tmp_path):
    _, old, _ = _corpus(spark)
    idx = str(tmp_path / "mm_idx")
    save_streaming_winnow_index(old.limit(20), idx)
    src = tmp_path / "mm_src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    from cdc_via_flink_spark.operators import winnow

    orig = winnow.WINNOW_VERSION
    winnow.WINNOW_VERSION = orig + 1
    try:
        with pytest.raises(ValueError, match="stores"):
            winnow_maintenance_query(
                stream, idx, str(tmp_path / "mm_out"), str(tmp_path / "mm_ckpt")
            )
    finally:
        winnow.WINNOW_VERSION = orig


def test_reingested_batch_doc_counts_once(spark):
    """Round-8 ADVICE: a re-ingested document (present in both the
    index and the batch) must count ONCE per fingerprint in the
    common-fingerprint cut. With fp_cap=2 and a corpus of two
    overlapping docs, re-ingesting one used to push every shared
    fingerprint to nd=3 (> cap) and silently drop the (A, B) pair."""
    from cdc_via_flink_spark.operators.winnow import incremental_pairs_against

    a_words = " ".join(f"t{i:03d}" for i in range(30))
    b_words = a_words + " " + " ".join(f"u{i:03d}" for i in range(6))
    old = spark.createDataFrame(
        [(1, a_words), (2, b_words)], "doc_id long, text string"
    )
    fp_old = winnow_fingerprints(old)
    cnt_old = fp_old.groupBy("fh").agg(F.count(F.lit(1)).alias("n_docs"))
    batch = spark.createDataFrame([(1, a_words)], "doc_id long, text string")
    got = incremental_pairs_against(fp_old, cnt_old, batch, fp_cap=2).collect()
    assert [(r.id_a, r.id_b) for r in got] == [(1, 2)]
    # and nd counting matches the monolithic corpus {1, 2}: the pair's
    # shared_fps equals the docs' true kept-fingerprint intersection
    inter = (
        fp_old.alias("x")
        .join(fp_old.alias("y"), "fh")
        .filter("x.doc_id = 1 and y.doc_id = 2")
        .count()
    )
    assert got[0].shared_fps == inter


def test_stored_policy_survives_constant_change(spark, tmp_path):
    """Round-8 ADVICE: fp_cap/min_shared are read from the index's
    meta, so a module-constant change neither errors the index nor
    silently shifts its policy."""
    from cdc_via_flink_spark.operators import winnow
    from cdc_via_flink_spark.operators.winnow import (
        incremental_winnow_pairs,
        save_winnow_index,
    )

    d, old, new = _corpus(spark)
    path = str(tmp_path / "policy_idx")
    save_winnow_index(old, path)
    batch = new.limit(20)
    before = sorted(tuple(r) for r in incremental_winnow_pairs(batch, path).collect())
    orig_cap, orig_min = winnow.WINNOW_FP_CAP, winnow.WINNOW_MIN_SHARED
    winnow.WINNOW_FP_CAP, winnow.WINNOW_MIN_SHARED = 1, 99
    try:
        after = sorted(
            tuple(r) for r in incremental_winnow_pairs(batch, path).collect()
        )
    finally:
        winnow.WINNOW_FP_CAP, winnow.WINNOW_MIN_SHARED = orig_cap, orig_min
    assert after == before and len(before) > 0


def test_read_emitted_pairs_committed_filter_and_empty(spark, tmp_path):
    """Empty output -> empty typed frame; with index_path, an epoch
    published past the committed pointer is excluded (round-8 ADVICE:
    no IndexError, no uncommitted reads)."""
    from cdc_via_flink_spark.streaming.winnow_maintenance import PAIRS_SCHEMA

    empty = read_emitted_pairs(spark, str(tmp_path / "void"))
    assert empty.count() == 0
    assert empty.schema == spark.createDataFrame([], PAIRS_SCHEMA).schema

    d, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "ptrfilter")
    committed = read_emitted_pairs(spark, out, index_path=idx).count()
    assert committed == read_emitted_pairs(spark, out).count()
    spark.createDataFrame([(111_111, 222_222, 5)], PAIRS_SCHEMA).write.parquet(
        os.path.join(out, "e99")
    )
    assert read_emitted_pairs(spark, out).count() == committed + 1
    assert read_emitted_pairs(spark, out, index_path=idx).count() == committed
