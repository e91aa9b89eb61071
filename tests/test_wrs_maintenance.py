"""Streaming weighted-reservoir maintainer (streaming/
wrs_maintenance.py, the tenth kernel adapter): maintained sample
equals a fresh batch build (the bottom-k fold is lossless/
idempotent), per-epoch outputs equal the cumulative recompute, the
weighted-inclusion property holds (longer docs overrepresented vs a
uniform sample), compaction is a pure physical rewrite, replay is
idempotent, and layout metadata refuses drift."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.wrs_maintenance import (
    _LAT,
    _MULT,
    _OFF,
    WRS_K,
    _sample,
    compact_wrs_index,
    read_outputs,
    read_wrs_state,
    save_streaming_wrs_index,
    wrs_maintenance_query,
    wrs_sample,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, w long"


def _split(spark):
    d = load_table(spark, SF0001, "documents").select(
        "doc_id", (F.col("n_chars") + 1).alias("w")
    )
    base = d.filter(F.col("doc_id") % 2 == 0)
    strm = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "w", ((F.col("doc_id") / 2).cast("long") % 3).alias("ep")
    )
    return base, strm


def _run(spark, tmp_path, base, strm, name, epochs=3):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_out")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_wrs_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("doc_id", "w").orderBy("doc_id")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"wrs_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = wrs_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def _py_pri(doc_id: int, w: int) -> float:
    h = ((doc_id % _LAT) * _MULT + _OFF) % _LAT
    return -math.log((h + 1.0) / _LAT) / float(w)


def _py_bottomk(rows):
    pris = sorted((_py_pri(i, w), i, w) for i, w in rows)
    return pris[:WRS_K]


def test_sample_lossless_and_python_reference(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    all_rows = [
        (r["doc_id"], r["w"])
        for r in base.unionByName(strm.select("doc_id", "w")).collect()
    ]
    want = _py_bottomk(all_rows)
    got = wrs_sample(spark, idx).collect()
    assert [r["id"] for r in got] == [i for _, i, _ in want]
    assert [r["w"] for r in got] == [w for _, _, w in want]
    for r, (p, _, _) in zip(got, want):
        assert abs(r["pri"] - round(p, 9)) < 1e-9

    # fold == fresh batch build
    fresh = {
        (r["id"], r["w"])
        for r in _sample(
            base.unionByName(strm.select("doc_id", "w")), "doc_id", "w"
        ).collect()
    }
    maintained = {
        (r["id"], r["w"]) for r in read_wrs_state(spark, idx).collect()
    }
    assert maintained == fresh

    # per-epoch outputs == cumulative recompute
    eps = {
        r["ep"]: (r["n_state"], r["kth_pri"], r["total_w"])
        for r in read_outputs(spark, out, idx).collect()
    }
    assert set(eps) == {0, 1, 2}
    base_rows = [(r["doc_id"], r["w"]) for r in base.collect()]
    for e in range(3):
        upto = base_rows + [
            (r["doc_id"], r["w"])
            for r in strm.filter(F.col("ep") <= e)
            .select("doc_id", "w")
            .collect()
        ]
        sel = _py_bottomk(upto)
        assert eps[e][0] == len(sel)
        assert abs(eps[e][1] - round(sel[-1][0], 9)) < 1e-9
        assert eps[e][2] == sum(w for _, _, w in sel)

    # weighted-inclusion property: the sample's mean weight must
    # exceed the corpus mean (inclusion prob ~ weight)
    mean_sample = sum(w for _, _, w in want) / len(want)
    mean_corpus = sum(w for _, w in all_rows) / len(all_rows)
    assert mean_sample > mean_corpus, (mean_sample, mean_corpus)

    # replay idempotency + foreign checkpoint refusal
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = wrs_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = wrs_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.wrs_maintenance import WRS_PTR

    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")
    before_state = {
        (r["id"], r["w"]) for r in read_wrs_state(spark, idx).collect()
    }
    assert len(ik.committed_deltas(idx, WRS_PTR)) == 3

    res = compact_wrs_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, WRS_PTR) == []
    assert {
        (r["id"], r["w"]) for r in read_wrs_state(spark, idx).collect()
    } == before_state

    # folded epochs still skip on replay
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = wrs_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.wrs_maintenance import read_wrs_meta

    base, _ = _split(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_wrs_index(base.limit(20), idx)
    assert read_wrs_meta(spark, idx + "/base/meta") == WRS_K
    with pytest.raises(ValueError, match="predates layout"):
        read_wrs_meta(spark, str(tmp_path / "nonexistent/meta"))
    sess = base.sparkSession
    sess.createDataFrame(
        [(8, _LAT, _MULT, 1)], "k bigint, lattice bigint, mult bigint, version bigint"
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/base/meta")
    with pytest.raises(ValueError, match="uses k=8"):
        read_wrs_meta(spark, idx + "/base/meta")


def test_batch_face_is_take_ordered(spark):
    """q_weighted_reservoir must plan as TakeOrderedAndProject —
    never a global sort."""
    from cdc_via_flink_spark.plans.registry import load_all

    df = load_all()["q_weighted_reservoir"].fn(spark, SF0001)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "TakeOrderedAndProject" in plan, plan
