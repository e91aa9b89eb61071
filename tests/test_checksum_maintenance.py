"""Streaming corpus-checksum maintainer (streaming/
checksum_maintenance.py, the twelfth kernel adapter — the SUM-fold
class): maintained total == monolithic batch recompute at every
epoch, replay cannot double-count (the non-idempotent fold rides the
committed pointer), compaction folds to one row, and a foreign
checkpoint is refused."""

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
from cdc_via_flink_spark.streaming.checksum_maintenance import (
    CKS_PTR,
    checksum_cols,
    checksum_maintenance_query,
    compact_checksum,
    read_checksum,
    read_outputs,
    save_streaming_checksum,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"


def _split(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 2 == 0)
    strm = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", ((F.col("doc_id") / 2).cast("long") % 3).alias("ep")
    )
    return d, base, strm


def _run(spark, tmp_path, base, strm, name):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_checksum(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("doc_id", "text").orderBy("doc_id")
        for k in range(3)
    ]
    dest = os.path.join(STAGE_ROOT, f"cksum_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = checksum_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def test_maintained_equals_monolithic_and_no_double_count(spark, tmp_path):
    d, base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    mono = checksum_cols(d).head()
    got = read_checksum(spark, idx).head()
    assert (got["n_docs"], got["checksum"]) == (mono["n_docs"], mono["checksum"])

    # per-epoch outputs == cumulative recompute
    eps = {
        r["ep"]: (r["n_docs"], r["checksum"])
        for r in read_outputs(spark, out, idx).collect()
    }
    assert set(eps) == {0, 1, 2}
    for e in range(3):
        upto = base.unionByName(
            strm.filter(F.col("ep") <= e).select("doc_id", "text")
        )
        want = checksum_cols(upto).head()
        assert eps[e] == (want["n_docs"], want["checksum"]), e

    # replay: the SUM fold is NOT idempotent — totals must not move
    before = read_checksum(spark, idx).head()
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = checksum_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    after = read_checksum(spark, idx).head()
    assert (after["n_docs"], after["checksum"]) == (
        before["n_docs"],
        before["checksum"],
    )

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = checksum_maintenance_query(stream, idx, out, str(tmp_path / "other"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_folds_to_one_row(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik

    _d, base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")
    before = read_checksum(spark, idx).head()
    assert len(ik.committed_deltas(idx, CKS_PTR)) == 3

    res = compact_checksum(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, CKS_PTR) == []
    assert spark.read.parquet(idx + "/base/state").count() == 1
    after = read_checksum(spark, idx).head()
    assert (after["n_docs"], after["checksum"]) == (
        before["n_docs"],
        before["checksum"],
    )

    # folded epochs still skip on replay
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = checksum_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert ik.committed_deltas(idx, CKS_PTR) == []
