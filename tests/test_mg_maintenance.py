"""Streaming Misra-Gries maintainer (streaming/mg_maintenance.py, the
eighth kernel adapter — the state-snapshot variant): maintained state
equals an independently-written sequential Python MG fold, the
est <= true <= est + err guarantee holds against exact counts,
replay is pointer-guarded (the fold is NOT idempotent), compaction
promotes the newest snapshot, and capacity metadata refuses drift."""

from __future__ import annotations

import collections
import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _STAGED_DESTS,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.mg_maintenance import (
    MG_K,
    compact_mg_index,
    mg_maintenance_query,
    read_heavy_hitters,
    read_mg_state,
    save_streaming_mg_index,
)
from tests.conftest import SF0001

SCHEMA = "token string"


def _split(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    tok = F.explode(
        F.split(
            F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " "))), " "
        )
    ).alias("token")
    base = d.filter(F.col("doc_id") % 2 == 0).select(tok)
    strm = d.filter(F.col("doc_id") % 2 == 1).select(
        ((F.col("doc_id") / 2).cast("long") % 3).alias("ep"), tok
    )
    return base, strm


def _run(spark, tmp_path, base, strm, name, epochs=3):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_hh")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_mg_index(base, idx)
    frames = [
        strm.filter(F.col("ep") == k).select("token").orderBy("token")
        for k in range(epochs)
    ]
    dest = os.path.join(STAGE_ROOT, f"mg_maint_test_{name}")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = mg_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def _python_mg(counts_per_stage):
    """Sequential MG over a list of Counter stages → (state, err)."""
    state: dict[str, int] = {}
    err = 0
    for cnt in counts_per_stage:
        comb = collections.Counter(state)
        comb.update(cnt)
        if len(comb) > MG_K:
            s = sorted(comb.values(), reverse=True)[MG_K]
        else:
            s = 0
        state = {t: c - s for t, c in comb.items() if c - s > 0}
        err += s
    return state, err


def test_sequential_fold_matches_python_and_guarantee(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "main")

    base_cnt = collections.Counter(
        r["token"] for r in base.collect()
    )
    stage_cnts = [base_cnt] + [
        collections.Counter(
            r["token"]
            for r in strm.filter(F.col("ep") == e).select("token").collect()
        )
        for e in range(3)
    ]

    # per-epoch emitted snapshots == python sequential fold
    hh = read_heavy_hitters(spark, out, index_path=idx).collect()
    for e in range(3):
        want_state, want_err = _python_mg(stage_cnts[: e + 2])
        got = {r["token"]: (r["est"], r["err"]) for r in hh if r["ep"] == e}
        assert got == {
            t: (c, want_err) for t, c in want_state.items()
        }, (e, got, want_state, want_err)
        assert len(got) <= MG_K

    # maintained state == final python state; guarantee vs exact
    summary, err = read_mg_state(spark, idx)
    state = {r["token"]: r["cnt"] for r in summary.collect()}
    err_v = err.head()["err"]
    want_state, want_err = _python_mg(stage_cnts)
    assert state == want_state
    assert err_v == want_err
    exact = collections.Counter()
    for c in stage_cnts:
        exact.update(c)
    for t, est in state.items():
        assert est <= exact[t] <= est + err_v, (t, est, exact[t], err_v)
    # and the universal lower-bound side for absent tokens
    head = exact.most_common(1)[0]
    assert head[0] in state, "true heaviest token must survive (c_max > err gap)"


def test_replay_pointer_guard_and_foreign_ckpt(spark, tmp_path):
    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "replay")
    state_before = sorted(
        (r["token"], r["cnt"]) for r in read_mg_state(spark, idx)[0].collect()
    )
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = mg_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before
    state_after = sorted(
        (r["token"], r["cnt"]) for r in read_mg_state(spark, idx)[0].collect()
    )
    assert state_after == state_before  # non-idempotent fold never re-applied

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = mg_maintenance_query(stream, idx, out, str(tmp_path / "other_ckpt"))
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_promotes_snapshot(spark, tmp_path):
    from cdc_via_flink_spark.streaming import index_kernel as ik
    from cdc_via_flink_spark.streaming.mg_maintenance import MG_PTR

    base, strm = _split(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, base, strm, "compact")
    summary, err = read_mg_state(spark, idx)
    state_before = sorted((r["token"], r["cnt"]) for r in summary.collect())
    err_before = err.head()["err"]
    assert len(ik.committed_deltas(idx, MG_PTR)) == 3

    res = compact_mg_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert ik.committed_deltas(idx, MG_PTR) == []
    summary, err = read_mg_state(spark, idx)
    assert sorted((r["token"], r["cnt"]) for r in summary.collect()) == state_before
    assert err.head()["err"] == err_before

    # folded epochs still skip on replay
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = mg_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before


def test_meta_validation(spark, tmp_path):
    from cdc_via_flink_spark.streaming.mg_maintenance import read_mg_meta

    base, _ = _split(spark)
    idx = str(tmp_path / "meta_idx")
    save_streaming_mg_index(base.limit(200), idx)
    assert read_mg_meta(spark, idx + "/base/meta") == MG_K
    with pytest.raises(ValueError, match="predates capacity"):
        read_mg_meta(spark, str(tmp_path / "nonexistent/meta"))
    # capacity drift refused
    sess = base.sparkSession
    sess.createDataFrame([(4, 1)], "k bigint, version bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(idx + "/base/meta")
    with pytest.raises(ValueError, match="uses k=4"):
        read_mg_meta(spark, idx + "/base/meta")
