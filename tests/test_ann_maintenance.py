"""Streaming ANN index maintenance (streaming/ann_maintenance.py):
multi-batch appends, probe parity with a monolithic rebuild, replay
idempotency, crash-window self-heal, and foreign-checkpoint refusal."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.ivf import (
    load_index,
    probe_index,
    save_index,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.ann_maintenance import (
    _read_maint_ptr,
    ann_maintenance_query,
    committed_delta_dirs,
    read_maintained_index,
)
from tests.conftest import SF0001

SCHEMA_DDL = "vec_id long, embedding array<float>"


def _emb(spark):
    return load_table(spark, SF0001, "embeddings").select("vec_id", "embedding")


def _stage(spark, frames, dest):
    import glob

    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for i, frame in enumerate(frames):
        tmp = dest + f"_w{i}"
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        out = os.path.join(dest, f"{i:04d}.parquet")
        shutil.copy(part, out)
        os.utime(out, (1_000_000_000 + i, 1_000_000_000 + i))
        shutil.rmtree(tmp)


def _run(spark, src, path, ckpt):
    from pyspark.sql.types import StructType

    stream = (
        spark.readStream.schema(StructType.fromDDL(SCHEMA_DDL))
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ann_maintenance_query(stream, path, ckpt).awaitTermination()


def _probe_rows(spark, path):
    assigned, cents = read_maintained_index(spark, path)
    return sorted(
        (r.query_id, r.vec_id, r.cos, r.rn)
        for r in probe_index(assigned, cents, 5, 2, 5).collect()
    )


def test_maintained_probe_equals_monolithic_rebuild(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "idx")
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    _stage(
        spark,
        [e.filter(F.col("vec_id") % 4 == 1), e.filter(F.col("vec_id") % 4 == 3)],
        str(tmp_path / "in"),
    )
    _run(spark, str(tmp_path / "in"), path, str(tmp_path / "ckpt"))

    assert len(committed_delta_dirs(path)) == 2  # one per micro-batch
    got = _probe_rows(spark, path)

    mono = str(tmp_path / "mono")
    save_index(e, mono, every_k=40)  # same centroids: stride-40 ⊂ evens
    a2, c2 = load_index(spark, mono)
    want = sorted(
        (r.query_id, r.vec_id, r.cos, r.rn)
        for r in probe_index(a2, c2, 5, 2, 5).collect()
    )
    assert got == want and len(got) == 25


def test_replay_is_idempotent_and_crash_dir_heals(spark, tmp_path):
    e = _emb(spark)
    path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    _stage(
        spark,
        [e.filter(F.col("vec_id") % 4 == 1), e.filter(F.col("vec_id") % 4 == 3)],
        str(tmp_path / "in"),
    )
    _run(spark, str(tmp_path / "in"), path, ckpt)
    before = _probe_rows(spark, path)
    n_before = read_maintained_index(spark, path)[0].count()

    # full replay (checkpoint wiped, same path => same run identity):
    # committed epochs must be skipped — no duplicate vectors
    shutil.rmtree(ckpt)
    _run(spark, str(tmp_path / "in"), path, ckpt)
    assert read_maintained_index(spark, path)[0].count() == n_before
    assert _probe_rows(spark, path) == before

    # crash window: delta dir renamed but pointer not advanced —
    # roll the pointer back one epoch; the replay must rewrite the
    # orphaned deterministic dir, not double it
    ptr = _read_maint_ptr(path)
    with open(os.path.join(path, "_MAINT_COMMITTED"), "w") as f:
        f.write(f"{ptr[0] - 1}\t{ptr[1]}")
    shutil.rmtree(ckpt)
    _run(spark, str(tmp_path / "in"), path, ckpt)
    assert read_maintained_index(spark, path)[0].count() == n_before
    assert _probe_rows(spark, path) == before


def test_compaction_folds_deltas_and_preserves_probe(spark, tmp_path):
    from cdc_via_flink_spark.streaming.ann_maintenance import (
        compact_maintained_index,
    )

    e = _emb(spark)
    path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    _stage(
        spark,
        [e.filter(F.col("vec_id") % 4 == 1), e.filter(F.col("vec_id") % 4 == 3)],
        str(tmp_path / "in"),
    )
    _run(spark, str(tmp_path / "in"), path, ckpt)
    before = _probe_rows(spark, path)
    n = read_maintained_index(spark, path)[0].count()

    assert compact_maintained_index(spark, path)["deltas_folded"] == 2
    assert committed_delta_dirs(path) == []
    assert read_maintained_index(spark, path)[0].count() == n
    assert _probe_rows(spark, path) == before
    # epoch high-water survives: replaying the whole input must skip
    shutil.rmtree(ckpt)
    _run(spark, str(tmp_path / "in"), path, ckpt)
    assert read_maintained_index(spark, path)[0].count() == n
    # idempotent no-op on an already-compacted index
    assert compact_maintained_index(spark, path)["deltas_folded"] == 0


def test_compaction_crash_windows_recover(spark, tmp_path):
    from cdc_via_flink_spark.streaming.ann_maintenance import (
        COMPACT_MARKER,
        _read_maint_ptr,
        _recover_compaction,
        compact_maintained_index,
    )

    e = _emb(spark)
    path = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    _stage(spark, [e.filter(F.col("vec_id") % 2 == 1)], str(tmp_path / "in"))
    _run(spark, str(tmp_path / "in"), path, ckpt)
    before = _probe_rows(spark, path)
    n = read_maintained_index(spark, path)[0].count()
    max_epoch = _read_maint_ptr(path)[0]

    def marker(val):
        with open(os.path.join(path, COMPACT_MARKER), "w") as f:
            f.write(str(val))

    lists, old, tmp = (
        os.path.join(path, d)
        for d in ("lists", "_lists_old", "_lists_compact_tmp")
    )

    # window A: tmp written, marker set, swap not started -> abort,
    # deltas intact, fold still applies on the next run
    shutil.copytree(lists, tmp)
    marker(max_epoch)
    _recover_compaction(path)
    assert not os.path.exists(tmp)
    assert len(committed_delta_dirs(path)) == 1
    assert _probe_rows(spark, path) == before

    # window B: crashed between the two renames (no lists dir)
    a2, _ = read_maintained_index(spark, path)
    a2.write.mode("overwrite").partitionBy("cluster_id").parquet(tmp)
    marker(max_epoch)
    os.rename(lists, old)
    _recover_compaction(path)
    assert os.path.isdir(lists) and not os.path.isdir(old)
    assert committed_delta_dirs(path) == []
    assert read_maintained_index(spark, path)[0].count() == n
    assert _probe_rows(spark, path) == before
    assert compact_maintained_index(spark, path)["deltas_folded"] == 0


def test_foreign_checkpoint_refused(spark, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    e = _emb(spark)
    path = str(tmp_path / "idx")
    save_index(e.filter(F.col("vec_id") % 2 == 0), path, every_k=40)
    _stage(spark, [e.filter(F.col("vec_id") % 4 == 1)], str(tmp_path / "in"))
    _run(spark, str(tmp_path / "in"), path, str(tmp_path / "ckpt1"))
    n = read_maintained_index(spark, path)[0].count()

    with pytest.raises(StreamingQueryException, match="checkpoint"):
        _run(spark, str(tmp_path / "in"), path, str(tmp_path / "ckpt2"))
    assert read_maintained_index(spark, path)[0].count() == n


def test_batch_append_index_equals_monolithic(spark, tmp_path):
    """append_index (the batch FAISS-add analog, caller-managed
    idempotency): save over half the corpus, append the other half,
    probe — must be value-identical to probing a monolithic index
    built over the full corpus with the SAME centroid set (even
    vec_ids hold the stride-40 centroids, so both builds derive
    identical centroids)."""
    from cdc_via_flink_spark.operators.ivf import append_index

    e = _emb(spark)
    base = e.filter(F.col("vec_id") % 2 == 0)
    rest = e.filter(F.col("vec_id") % 2 == 1)

    grown = str(tmp_path / "grown_idx")
    save_index(base, grown, every_k=40)
    append_index(spark, rest, grown)
    a1, c1 = load_index(spark, grown)
    got = sorted(
        tuple(r) for r in probe_index(a1, c1, 5, 2, 5).collect()
    )

    mono = str(tmp_path / "mono_idx")
    save_index(e, mono, every_k=40)
    a2, c2 = load_index(spark, mono)
    want = sorted(
        tuple(r) for r in probe_index(a2, c2, 5, 2, 5).collect()
    )
    assert got == want and len(got) > 0
