"""Maintained-index kernel on scheme'd paths (round-9 VERDICT #4):
the pointer/marker/rename protocol must work through the Hadoop
FileSystem API when the index lives at a URI (file:/ here, standing
in for hdfs:// where rename is equally atomic), while schemeless
local paths keep the original os-module fast path. Covers the
primitive ops, a full bloom-maintainer lifecycle on file: URIs, and
compaction recovery semantics on the Hadoop path."""

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
from cdc_via_flink_spark.streaming import index_kernel as ik
from cdc_via_flink_spark.streaming.bloom_maintenance import (
    BLOOM_PTR,
    bloom_maintenance_query,
    compact_bloom_index,
    read_bloom_bitmap,
    read_verdicts,
    save_streaming_bloom_index,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"
M, K = 1 << 14, 5


def test_fs_adapter_selection(spark):
    assert ik._fs_for("/tmp/x") is ik._OS_FS
    assert ik._fs_for("relative/x") is ik._OS_FS
    assert isinstance(ik._fs_for("file:/tmp/x"), ik._HadoopFs)
    assert isinstance(ik._fs_for("hdfs://nn/x"), ik._HadoopFs)


def test_hadoop_fs_primitives(spark, tmp_path):
    root = "file:" + str(tmp_path / "prim")
    fs = ik._fs_for(root)
    assert not fs.exists(root + "/a")
    fs.mkdirs(root + "/a/b")
    assert fs.isdir(root + "/a/b")
    fs.write_text(root + "/a/p", "1\tk")
    assert fs.read_text(root + "/a/p") == "1\tk"
    assert not fs.isdir(root + "/a/p")  # file, not dir
    fs.write_text(root + "/a/p2", "2\tk2")
    fs.replace(root + "/a/p2", root + "/a/p")  # overwrite-atomic
    assert fs.read_text(root + "/a/p") == "2\tk2"
    assert not fs.exists(root + "/a/p2")
    fs.rename(root + "/a/b", root + "/a/c")
    assert fs.isdir(root + "/a/c") and not fs.exists(root + "/a/b")
    fs.write_text(root + "/a/c/m", "meta")
    fs.copytree(root + "/a/c", root + "/a/d")
    assert fs.read_text(root + "/a/d/m") == "meta"
    assert sorted(fs.listdir(root + "/a")) == ["c", "d", "p"]
    fs.delete(root + "/a/c")
    assert not fs.exists(root + "/a/c")
    fs.delete(root + "/a/nonexistent")  # no-op, no raise


def test_ptr_roundtrip_on_uri(spark, tmp_path):
    idx = "file:" + str(tmp_path / "ptr_idx")
    ik._fs_for(idx).mkdirs(idx)
    assert ik.read_ptr(idx, "_PTR") is None
    ik.write_ptr(idx, "_PTR", 3, "ck")
    assert ik.read_ptr(idx, "_PTR") == (3, "ck")
    ik.write_ptr(idx, "_PTR", 7, "ck")  # overwrite path
    assert ik.read_ptr(idx, "_PTR") == (7, "ck")
    # the same pointer is readable through the os path too (file: URI
    # and the local path address the same bytes)
    assert ik.read_ptr(str(tmp_path / "ptr_idx"), "_PTR") == (7, "ck")


def test_bloom_lifecycle_on_file_uri(spark, tmp_path):
    """Full maintainer lifecycle with index/verdicts/checkpoint all at
    file: URIs: probe-before-insert verdicts, replay skip, compaction
    fold — the exact sequence the local-path tests pin, now through
    the Hadoop adapter."""
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 5 != 0).limit(60)
    redeliver = old.limit(10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx = "file:" + str(tmp_path / "uri_idx")
    out = "file:" + str(tmp_path / "uri_verdicts")
    ckpt = "file:" + str(tmp_path / "uri_ckpt")
    save_streaming_bloom_index(old, idx, m_bits=M, k=K)
    frames = [redeliver.filter(F.pmod(F.col("doc_id"), 2) == k) for k in range(2)]
    dest = os.path.join(STAGE_ROOT, "kernel_uri_test")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)

    def start():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(dest)
        )
        return bloom_maintenance_query(stream, idx, out, ckpt)

    start().awaitTermination()
    got = {r.doc_id: r.bloom_hit for r in read_verdicts(spark, out, index_path=idx).collect()}
    assert len(got) == redeliver.count()
    assert all(got.values())  # every redelivery must read hit

    ptr = ik.read_ptr(idx, BLOOM_PTR)
    assert ptr is not None and ptr[1] == ckpt  # scheme'd run key kept verbatim
    assert len(ik.committed_deltas(idx, BLOOM_PTR)) == 2

    merged_before = {(r.word, r.bits) for r in read_bloom_bitmap(spark, idx).collect()}
    assert compact_bloom_index(spark, idx) == {"deltas_folded": 2}
    assert ik.committed_deltas(idx, BLOOM_PTR) == []
    merged_after = {(r.word, r.bits) for r in read_bloom_bitmap(spark, idx).collect()}
    assert merged_after == merged_before

    # replay after compaction: folded epochs skip (pointer survives)
    fs = ik._fs_for(out)
    before = sorted(fs.listdir(out))
    start().awaitTermination()
    assert sorted(fs.listdir(out)) == before

    # foreign checkpoint refused on the URI lineage too
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = bloom_maintenance_query(stream, idx, out, "file:" + str(tmp_path / "other"))
    with pytest.raises(Exception, match="refusing epochs"):
        q.awaitTermination()


def test_recover_compaction_on_uri(spark, tmp_path):
    """Crash-state recovery through the Hadoop adapter: the
    'old + tmp, no base' state (crash between the two renames) must
    finish the swap."""
    idx = "file:" + str(tmp_path / "rec_idx")
    fs = ik._fs_for(idx)
    fs.mkdirs(idx + "/_base_old")
    fs.mkdirs(idx + "/_base_compact_tmp")
    fs.write_text(idx + "/_base_compact_tmp/payload", "new")
    fs.mkdirs(idx + "/deltas/e1")
    fs.write_text(idx + "/" + ik.COMPACT_MARKER, "1")
    ik.recover_compaction(idx, "base")
    assert fs.read_text(idx + "/base/payload") == "new"
    assert not fs.exists(idx + "/_base_old")
    assert not fs.exists(idx + "/_base_compact_tmp")
    assert not fs.exists(idx + "/deltas/e1")
    assert not fs.exists(idx + "/" + ik.COMPACT_MARKER)
