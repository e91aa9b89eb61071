"""Streaming BM25 index maintainer (streaming/textindex_maintenance,
the eleventh kernel adapter): maintained index equals a monolithic
build (postings, doclen, probe results), derived stats never drift,
compaction is a pure physical rewrite, replay is idempotent, and a
foreign checkpoint is refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.textindex_maintenance import (
    TEXT_PTR,
    _postings_and_doclen,
    compact_text_index,
    probe_maintained_text_index,
    read_maintained_text_index,
    save_streaming_text_index,
    text_maintenance_query,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"
TERMS = ("spark", "join", "window")


def _split(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 2 == 0)
    strm = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", ((F.col("doc_id") / 2).cast("long") % 2).alias("ep")
    )
    return d, base, strm


def _run(spark, tmp_path, base, strm, name):
    idx = str(tmp_path / f"{name}_idx")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_text_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("doc_id", "text").orderBy("doc_id")
        for k in range(2)
    ]
    dest = os.path.join(STAGE_ROOT, f"bm25_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = text_maintenance_query(stream, idx, ckpt)
    q.awaitTermination()
    return idx, ckpt, dest


def test_maintained_equals_monolithic(spark, tmp_path):
    d, base, strm = _split(spark)
    idx, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    postings, dl = read_maintained_text_index(spark, idx)
    mono_p, mono_dl = _postings_and_doclen(d)
    assert {
        (r["term"], r["doc_id"], r["tf"]) for r in postings.collect()
    } == {(r["term"], r["doc_id"], r["tf"]) for r in mono_p.collect()}
    assert {(r["doc_id"], r["dl"]) for r in dl.collect()} == {
        (r["doc_id"], r["dl"]) for r in mono_dl.collect()
    }

    # derived stats match the full-corpus truth
    _tf, df, _dl, stats = probe_maintained_text_index(spark, idx, TERMS)
    srow = stats.head()
    n_docs = d.count()
    assert srow["n_docs"] == float(n_docs)
    got_df = {r["term"]: r["df"] for r in df.collect()}
    for t in TERMS:
        want = (
            mono_p.filter(F.col("term") == t)
            .select("doc_id")
            .distinct()
            .count()
        )
        assert got_df.get(t, 0.0) == float(want), t

    # replay idempotency + foreign checkpoint refusal
    from cdc_via_flink_spark.streaming import index_kernel as ik

    n_deltas = len(ik.committed_deltas(idx, TEXT_PTR))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = text_maintenance_query(stream, idx, ckpt)
    q2.awaitTermination()
    assert len(ik.committed_deltas(idx, TEXT_PTR)) == n_deltas

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = text_maintenance_query(stream, idx, ckpt + "_other")
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_pure_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik

    _d, base, strm = _split(spark)
    idx, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")
    before_p, before_dl = read_maintained_text_index(spark, idx)
    snap_p = {(r["term"], r["doc_id"], r["tf"]) for r in before_p.collect()}
    snap_dl = {(r["doc_id"], r["dl"]) for r in before_dl.collect()}
    assert len(ik.committed_deltas(idx, TEXT_PTR)) == 2

    res = compact_text_index(spark, idx)
    assert res == {"deltas_folded": 2}
    assert ik.committed_deltas(idx, TEXT_PTR) == []
    after_p, after_dl = read_maintained_text_index(spark, idx)
    assert {
        (r["term"], r["doc_id"], r["tf"]) for r in after_p.collect()
    } == snap_p
    assert {(r["doc_id"], r["dl"]) for r in after_dl.collect()} == snap_dl
    # meta survives the swap (copy_meta) so probes keep validating
    meta = spark.read.parquet(idx + "/base/meta").head()
    assert int(meta["n_buckets"]) > 0

    # folded epochs still skip on replay
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = text_maintenance_query(stream, idx, ckpt)
    q.awaitTermination()
    assert ik.committed_deltas(idx, TEXT_PTR) == []
