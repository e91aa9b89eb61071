"""Streaming KMV bottom-k maintainer (streaming/kmv_maintenance.py,
the ninth kernel adapter): maintained sketch equals a fresh batch
build (the bottom-k fold is lossless/idempotent), per-epoch estimates
equal the cumulative recompute, the sample IS the true bottom-k,
compaction is a pure physical rewrite, replay is idempotent, and
layout metadata refuses drift."""

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
from cdc_via_flink_spark.streaming.kmv_maintenance import (
    KMV_K,
    _LAT,
    _MULT,
    _OFF,
    _sketch,
    compact_kmv_index,
    kmv_estimate,
    kmv_maintenance_query,
    kmv_sample,
    read_estimates,
    read_kmv_sketch,
    save_streaming_kmv_index,
)
from tests.conftest import SF0001

SCHEMA = "user_id long"


def _split(spark):
    ev = load_table(spark, SF0001, "events").select("event_id", "user_id")
    base = ev.filter(F.col("event_id") % 2 == 0).select("user_id")
    strm = ev.filter(F.col("event_id") % 2 == 1).select(
        "user_id", ((F.col("event_id") / 2).cast("long") % 3).alias("ep")
    )
    return base, strm


def _run(spark, tmp_path, base, strm, name, epochs=3):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_est")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_kmv_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("user_id").orderBy("user_id")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"kmv_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = kmv_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def _py_bottomk(ids):
    hs = sorted({((i % _LAT) * _MULT + _OFF) % _LAT for i in ids})
    return hs[:KMV_K]


def test_sketch_lossless_estimates_and_sample(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    all_ids = [
        r["user_id"]
        for r in base.unionByName(strm.select("user_id")).collect()
    ]
    # maintained sketch == python bottom-k over everything
    got_h = [r["h"] for r in kmv_sample(spark, idx).collect()]
    assert got_h == _py_bottomk(all_ids)

    # fold == fresh batch build
    fresh = {
        (r["h"], r["id"])
        for r in _sketch(base.unionByName(strm.select("user_id"))).collect()
    }
    maintained = {
        (r["h"], r["id"]) for r in read_kmv_sketch(spark, idx).collect()
    }
    assert maintained == fresh

    # per-epoch estimate == cumulative recompute; sane accuracy
    got = {
        r["ep"]: (r["est_distinct"], r["kth_hash"], r["n_state"])
        for r in read_estimates(spark, out, idx).collect()
    }
    assert set(got) == {0, 1, 2}
    base_ids = [r["user_id"] for r in base.collect()]
    for e in range(3):
        upto = base_ids + [
            r["user_id"]
            for r in strm.filter(F.col("ep") <= e).select("user_id").collect()
        ]
        hs = _py_bottomk(upto)
        want = (
            float(len(hs))
            if len(hs) < KMV_K
            else round((KMV_K - 1) * _LAT / hs[-1], 4)
        )
        assert got[e][0] == want, (e, got[e], want)
        assert got[e][1] == hs[-1]
    exact = len(set(all_ids))
    est = kmv_estimate(spark, idx).head()["est_distinct"]
    assert abs(est - exact) / exact < 0.5, (est, exact)

    # replay idempotency (bottom-k fold) + foreign checkpoint refusal
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = kmv_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = kmv_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.kmv_maintenance import KMV_PTR

    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")
    before_sketch = {
        (r["h"], r["id"]) for r in read_kmv_sketch(spark, idx).collect()
    }
    est_before = kmv_estimate(spark, idx).head()["est_distinct"]
    assert len(ik.committed_deltas(idx, KMV_PTR)) == 3

    res = compact_kmv_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, KMV_PTR) == []
    assert {
        (r["h"], r["id"]) for r in read_kmv_sketch(spark, idx).collect()
    } == before_sketch
    assert kmv_estimate(spark, idx).head()["est_distinct"] == est_before

    # folded epochs still skip on replay
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = kmv_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.kmv_maintenance import read_kmv_meta

    base, _ = _split(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_kmv_index(base.limit(20), idx)
    assert read_kmv_meta(spark, idx + "/base/meta") == KMV_K
    with pytest.raises(ValueError, match="predates layout"):
        read_kmv_meta(spark, str(tmp_path / "nonexistent/meta"))
    sess = base.sparkSession
    sess.createDataFrame(
        [(32, _LAT, 1)], "k bigint, lattice bigint, version bigint"
    ).coalesce(1).write.mode("overwrite").parquet(idx + "/base/meta")
    with pytest.raises(ValueError, match="uses k=32"):
        read_kmv_meta(spark, idx + "/base/meta")


def test_small_index_estimate_is_exact_count(spark, tmp_path):
    """With fewer distinct ids than k, every distinct hash fits in
    the sketch and the estimator must return the EXACT count (the
    n_state < k branch of estimate_expr), not the (k-1)M/h_(k)
    extrapolation."""
    base, _ = _split(spark)
    small = base.distinct().limit(20)
    idx = str(tmp_path / "small_idx")
    save_streaming_kmv_index(small, idx)
    n = len({r["user_id"] for r in small.collect()})
    # ids may collide on the lattice; the sketch's truth is distinct h
    hs = {((r["user_id"] % _LAT) * _MULT + _OFF) % _LAT for r in small.collect()}
    est = kmv_estimate(spark, idx).head()["est_distinct"]
    assert est == float(len(hs)), (est, n, len(hs))
