"""Streaming HLL-register maintainer (streaming/hll_maintenance.py,
the seventh kernel adapter): maintained registers equal a fresh batch
build over everything (max fold is lossless), per-epoch estimates
equal the cumulative recompute, the estimator is within its
theoretical error of exact, compaction is a pure physical rewrite,
replay is idempotent, and layout metadata refuses drift."""

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
from cdc_via_flink_spark.streaming.hll_maintenance import (
    _registers,
    compact_hll_index,
    hll_estimate,
    hll_maintenance_query,
    read_estimates,
    read_hll_registers,
    save_streaming_hll_index,
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
    save_streaming_hll_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("user_id").orderBy("user_id")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"hll_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = hll_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def test_registers_exact_and_estimates_cumulative(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    # max fold is lossless: maintained registers == fresh batch build
    maintained = {
        (r.reg, r.rho) for r in read_hll_registers(spark, idx).collect()
    }
    fresh = {
        (r.reg, r.rho)
        for r in _registers(base.unionByName(strm.select("user_id"))).collect()
    }
    assert maintained == fresh

    # per-epoch estimate == recompute over base ∪ epochs ≤ e
    got = {
        r.ep: (r.est_users, r.n_regs_changed, r.n_zero_regs)
        for r in read_estimates(spark, out, idx).collect()
    }
    assert set(got) == {0, 1, 2}
    for e in range(3):
        upto = base.unionByName(
            strm.filter(F.col("ep") <= e).select("user_id")
        )
        regs = {r.reg: r.rho for r in _registers(upto).collect()}
        num = sum(1 << (48 - v) for v in regs.values()) + (256 - len(regs)) * (
            1 << 48
        )
        alpha = 0.7213 / (1.0 + 1.079 / 256.0)
        e_raw = alpha * 65536.0 * float(1 << 48) / float(num)
        n_zero = 256 - len(regs)
        import math

        est = (
            256.0 * math.log(256.0 / n_zero)
            if (e_raw <= 640.0 and n_zero > 0)
            else e_raw
        )
        assert abs(got[e][0] - round(est, 4)) < 1e-6, (e, got[e], est)
        assert got[e][2] == n_zero

    # the estimate is actually a cardinality estimate: within 4 sigma
    # of the exact distinct count (rsd = 1.04/sqrt(256) = 6.5%)
    exact = (
        base.unionByName(strm.select("user_id")).distinct().count()
    )
    assert abs(got[2][0] - exact) / exact < 0.26, (got[2][0], exact)

    # replay idempotency + foreign checkpoint refusal
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = hll_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = hll_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.hll_maintenance import HLL_PTR

    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")

    merged_before = {
        (r.reg, r.rho) for r in read_hll_registers(spark, idx).collect()
    }
    est_before = hll_estimate(spark, idx).head()["est_users"]
    assert len(ik.committed_deltas(idx, HLL_PTR)) == 3

    res = compact_hll_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, HLL_PTR) == []
    merged_after = {
        (r.reg, r.rho) for r in read_hll_registers(spark, idx).collect()
    }
    assert merged_after == merged_before  # max fold is lossless
    assert hll_estimate(spark, idx).head()["est_users"] == est_before

    # folded epochs still skip on replay (pointer high-water survives)
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = hll_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.hll_maintenance import (
        M_REGS,
        read_hll_meta,
    )

    base, _ = _split(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_hll_index(base.limit(20), idx)
    assert read_hll_meta(spark, idx + "/base/meta") == M_REGS
    with pytest.raises(ValueError, match="predates layout"):
        read_hll_meta(spark, str(tmp_path / "nonexistent/meta"))
