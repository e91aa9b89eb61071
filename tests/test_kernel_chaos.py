"""Chaos test: kill every index-kernel maintainer mid-epoch-commit at
each crash window of the kernel protocol (VERDICT r10 #6 — the
bespoke bloom/dedup/winnow recovery tests, generalized to ONE
parametrized contract test over all 12 adapters).

Crash windows (run_maintenance sink, kill at epoch 1 of 3):

  pre_publish   — the adapter staged its delta under deltas/_tmp_*
                  (and may already have PUBLISHED its side output,
                  the documented published-but-uncommitted window),
                  but the process dies BEFORE the atomic delta
                  rename. Recovery contract: replay GCs the orphan
                  _tmp_, rewrites the delta and the side output.
  post_publish  — the delta dir deltas/e1 is renamed into place but
                  the process dies BEFORE the pointer commit.
                  Recovery contract: replay observes pointer < 1,
                  deletes the deterministic dir and rewrites it.

Injection is at the KERNEL seams (index_kernel._fs_for rename /
index_kernel.write_ptr), so every adapter is killed at exactly the
same protocol step — no adapter-specific harness. After the kill, the
maintainer restarts on the SAME checkpoint and source; the final
index tree, side outputs, and committed pointer epoch must be
byte-equivalent (sorted-row equivalent) to an uninterrupted control
run of the same inputs.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F  # noqa: F401  (adapters' shapes)

from cdc_via_flink_spark.streaming import index_kernel as ik


DOCS_DDL = "doc_id long, text string"


def _doc_rows(ids):
    return [
        (
            i,
            " ".join(
                f"w{(i * 7 + j) % 19}" for j in range(12)
            )
            + f" tail{i}",
        )
        for i in ids
    ]


def _adapters():
    """name -> (stream_ddl, save(base_df, idx), maker(stream, idx,
    out, ckpt), base_rows, batch_rows[3], ptr_name)."""
    from cdc_via_flink_spark.streaming import (
        bitmap_maintenance as bm,
        bloom_maintenance as bl,
        checksum_maintenance as ck,
        counting_bloom_maintenance as cb,
        dedup_maintenance as dd,
        hll_maintenance as hl,
        kmv_maintenance as km,
        mg_maintenance as mg,
        textindex_maintenance as tx,
        winnow_maintenance as wn,
        wrs_maintenance as wr,
    )

    docs_base = _doc_rows(range(0, 40, 2))
    docs_batches = [
        _doc_rows(range(100, 106)),
        _doc_rows([1, 3, 101]) ,  # redeliveries + overlap
        _doc_rows(range(200, 204)),
    ]
    ev_ddl = "user_id long"
    ev_base = [(i,) for i in range(50)]
    ev_batches = [
        [(i,) for i in range(40, 60)],
        [(i,) for i in range(55, 70)],
        [(i,) for i in range(300, 310)],
    ]
    return {
        "bloom": (
            DOCS_DDL,
            lambda b, idx: bl.save_streaming_bloom_index(
                b, idx, m_bits=1 << 14, k=5
            ),
            lambda st, idx, out, ck_: bl.bloom_maintenance_query(
                st, idx, out, ck_
            ),
            docs_base,
            docs_batches,
            bl.BLOOM_PTR,
        ),
        "counting_bloom": (
            "doc_id long, text string, op string",
            lambda b, idx: cb.save_streaming_counting_bloom_index(
                b, idx, m_bits=1 << 14, k=5
            ),
            lambda st, idx, out, ck_: cb.counting_bloom_maintenance_query(
                st, idx, out, ck_
            ),
            [(i, t, "c") for i, t in docs_base],
            [[(i, t, "c") for i, t in rows] for rows in docs_batches],
            cb.CB_PTR,
        ),
        "dedup": (
            DOCS_DDL,
            lambda b, idx: dd.save_streaming_dedup_index(
                b, idx, threshold=0.5
            ),
            lambda st, idx, out, ck_: dd.dedup_maintenance_query(
                st, idx, out, ck_
            ),
            docs_base,
            docs_batches,
            dd.DEDUP_PTR,
        ),
        "winnow": (
            DOCS_DDL,
            lambda b, idx: wn.save_streaming_winnow_index(b, idx),
            lambda st, idx, out, ck_: wn.winnow_maintenance_query(
                st, idx, out, ck_
            ),
            docs_base,
            docs_batches,
            wn.WINNOW_PTR,
        ),
        "checksum": (
            DOCS_DDL,
            lambda b, idx: ck.save_streaming_checksum(b, idx),
            lambda st, idx, out, ck_: ck.checksum_maintenance_query(
                st, idx, out, ck_
            ),
            docs_base,
            docs_batches,
            ck.CKS_PTR,
        ),
        "textindex": (
            DOCS_DDL,
            lambda b, idx: tx.save_streaming_text_index(b, idx),
            lambda st, idx, out, ck_: tx.text_maintenance_query(
                st, idx, ck_
            ),
            docs_base,
            docs_batches,
            tx.TEXT_PTR,
        ),
        "hll": (
            ev_ddl,
            lambda b, idx: hl.save_streaming_hll_index(b, idx),
            lambda st, idx, out, ck_: hl.hll_maintenance_query(
                st, idx, out, ck_
            ),
            ev_base,
            ev_batches,
            hl.HLL_PTR,
        ),
        "kmv": (
            ev_ddl,
            lambda b, idx: km.save_streaming_kmv_index(b, idx),
            lambda st, idx, out, ck_: km.kmv_maintenance_query(
                st, idx, out, ck_
            ),
            ev_base,
            ev_batches,
            km.KMV_PTR,
        ),
        "mg": (
            "token string",
            lambda b, idx: mg.save_streaming_mg_index(b, idx),
            lambda st, idx, out, ck_: mg.mg_maintenance_query(
                st, idx, out, ck_
            ),
            [(f"t{i % 9}",) for i in range(60)],
            [
                [(f"t{i % 5}",) for i in range(20)],
                [(f"t{i % 7}",) for i in range(15)],
                [(f"x{i % 3}",) for i in range(10)],
            ],
            mg.MG_PTR,
        ),
        "wrs": (
            "doc_id long, w double",
            lambda b, idx: wr.save_streaming_wrs_index(b, idx),
            lambda st, idx, out, ck_: wr.wrs_maintenance_query(
                st, idx, out, ck_
            ),
            [(i, 1.0 + (i % 7)) for i in range(40)],
            [
                [(i, 2.0 + (i % 3)) for i in range(100, 112)],
                [(i, 0.5) for i in range(150, 158)],
                [(i, 3.0) for i in range(200, 206)],
            ],
            wr.WRS_PTR,
        ),
        "bitmap": (
            "user_id long, day date",
            lambda b, idx: bm.save_streaming_bitmap_index(b, idx),
            lambda st, idx, out, ck_: bm.bitmap_maintenance_query(
                st, idx, out, ck_
            ),
            None,  # built via _mk_bitmap_frame
            None,
            bm.BITMAP_PTR,
        ),
        "ann": (
            "vec_id long, embedding array<float>",
            None,  # built via save_index over sf0.001 embeddings
            lambda st, idx, out, ck_: __import__(
                "cdc_via_flink_spark.streaming.ann_maintenance",
                fromlist=["ann_maintenance_query"],
            ).ann_maintenance_query(st, idx, ck_),
            None,
            None,
            "_MAINT_COMMITTED",
        ),
    }


def _stage(spark, ddl, batches, dest):
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest)
    for i, rows in enumerate(batches):
        tmp = dest + f"_w{i}"
        spark.createDataFrame(rows, ddl).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        out = os.path.join(dest, f"{i:04d}.parquet")
        shutil.copy(os.path.join(tmp, part), out)
        os.utime(out, (1_000_000_000 + i, 1_000_000_000 + i))
        shutil.rmtree(tmp)


def _dataset_roots(path):
    """Leaf parquet datasets under ``path`` (a dir with part files, or
    a dir whose subdirs are all partition dirs), skipping staging."""
    if not os.path.isdir(path):
        return
    entries = [e for e in os.listdir(path) if not e.startswith("_tmp_")]
    files = [e for e in entries if e.endswith(".parquet")]
    subdirs = [
        e for e in entries if os.path.isdir(os.path.join(path, e))
    ]
    if files or (subdirs and all("=" in d for d in subdirs)):
        yield path
        return
    for d in sorted(subdirs):
        yield from _dataset_roots(os.path.join(path, d))


def _tree_snapshot(spark, root):
    """{relpath: (sorted dtypes, sorted rows)} over every parquet
    dataset under root — the uniform 'index trees are equivalent'
    check (pointer files are plain text, compared separately)."""
    snap = {}
    for ds in _dataset_roots(root):
        df = spark.read.parquet(ds)
        cols = sorted(df.columns)
        rows = sorted(
            (tuple(repr(r[c]) for c in cols) for r in df.collect())
        )
        snap[os.path.relpath(ds, root)] = (
            tuple(sorted(df.dtypes)),
            rows,
        )
    return snap


def _run_maintained(spark, maker, src_dest, ddl, idx, out, ckpt):
    stream = (
        spark.readStream.schema(ddl)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dest)
    )
    maker(stream, idx, out, ckpt).awaitTermination()


def _setup(spark, name, root):
    """Stage inputs + base index under root; returns (ddl, maker,
    src, idx, out, ckpt, ptr)."""
    spec = _adapters()[name]
    ddl, save, maker, base_rows, batches, ptr = spec
    idx = os.path.join(root, "idx")
    out = os.path.join(root, "out")
    ckpt = os.path.join(root, "ckpt")
    src = os.path.join(root, "src")
    if name == "ann":
        from cdc_via_flink_spark.operators.ivf import save_index
        from cdc_via_flink_spark.sources.tables import load_table
        from tests.conftest import SF0001

        e = load_table(spark, SF0001, "embeddings").select(
            "vec_id", "embedding"
        )
        save_index(e.filter(F.col("vec_id") % 2 == 0), idx, every_k=40)
        odd = e.filter(F.col("vec_id") % 2 == 1)
        frames = [
            [tuple(r) for r in odd.filter(
                F.pmod(F.col("vec_id"), 6) == 2 * k + 1
            ).orderBy("vec_id").limit(8).collect()]
            for k in range(3)
        ]
        _stage(spark, ddl, frames, src)
    elif name == "bitmap":
        import datetime as dt

        d0 = dt.date(2024, 1, 1)
        base = [
            (i % 20, d0 + dt.timedelta(days=i % 5)) for i in range(60)
        ]
        spec_batches = [
            [(i % 25, d0 + dt.timedelta(days=i % 6)) for i in range(20)],
            [(i % 10, d0 + dt.timedelta(days=2)) for i in range(15)],
            [(i + 30, d0 + dt.timedelta(days=7)) for i in range(8)],
        ]
        _adapters()["bitmap"][1](
            spark.createDataFrame(base, ddl), idx
        )
        _stage(spark, ddl, spec_batches, src)
    else:
        save(spark.createDataFrame(base_rows, ddl), idx)
        _stage(spark, ddl, batches, src)
    return ddl, maker, src, idx, out, ckpt, ptr


KILL_EPOCH = 1
PHASES = ("pre_publish", "post_publish")
NAMES = sorted(_adapters())

# control runs are deterministic per adapter — share one across both
# kill phases (it is the expensive third streaming run per case)
_CONTROL_CACHE: dict = {}


def _control(spark, tmp_path_factory, name):
    if name not in _CONTROL_CACHE:
        root = str(tmp_path_factory.mktemp(f"chaos_control_{name}"))
        c_ddl, maker, c_src, c_idx, c_out, c_ckpt, ptr = _setup(
            spark, name, root
        )
        _run_maintained(spark, maker, c_src, c_ddl, c_idx, c_out, c_ckpt)
        _CONTROL_CACHE[name] = (
            ik.read_ptr(c_idx, ptr),
            sorted(
                os.path.basename(d)
                for d in ik.committed_deltas(c_idx, ptr)
            ),
            _tree_snapshot(spark, c_idx),
            _tree_snapshot(spark, c_out),
        )
    return _CONTROL_CACHE[name]


@pytest.mark.parametrize("phase", PHASES)
@pytest.mark.parametrize("name", NAMES)
def test_kill_mid_epoch_then_recover(
    spark, tmp_path, tmp_path_factory, name, phase
):
    # ---- control: uninterrupted run over the same inputs (cached
    # across the two phases)
    cp, c_deltas, c_idx_snap, c_out_snap = _control(
        spark, tmp_path_factory, name
    )

    # ---- chaos: same inputs, kill at epoch 1 in the given phase
    ddl, maker2, src, idx, out, ckpt, ptr = _setup(
        spark, name, str(tmp_path / "chaos")
    )
    state = {"tripped": False}
    real_fs_for = ik._fs_for
    real_write_ptr = ik.write_ptr
    if phase == "pre_publish":

        def fake_fs_for(path):
            fs = real_fs_for(path)

            class _Killer:
                def __getattr__(self, n):
                    return getattr(fs, n)

                def rename(self, s, d):
                    if (
                        not state["tripped"]
                        and d.rstrip("/").endswith(f"/deltas/e{KILL_EPOCH}")
                    ):
                        state["tripped"] = True
                        raise RuntimeError("chaos kill: pre-publish")
                    fs.rename(s, d)

            return _Killer()

        ik._fs_for = fake_fs_for
    else:

        def fake_write_ptr(index_path, ptr_name, epoch, run):
            if not state["tripped"] and epoch == KILL_EPOCH:
                state["tripped"] = True
                raise RuntimeError("chaos kill: post-publish pre-pointer")
            real_write_ptr(index_path, ptr_name, epoch, run)

        ik.write_ptr = fake_write_ptr
    try:
        with pytest.raises(Exception, match="chaos kill"):
            _run_maintained(spark, maker2, src, ddl, idx, out, ckpt)
    finally:
        ik._fs_for = real_fs_for
        ik.write_ptr = real_write_ptr
    assert state["tripped"], "fault was never reached — test is vacuous"

    # the kill really landed mid-protocol: pointer must still be at 0
    p = ik.read_ptr(idx, ptr)
    assert p is not None and p[0] == KILL_EPOCH - 1, p

    # ---- recovery: restart on the SAME checkpoint and source
    _run_maintained(spark, maker2, src, ddl, idx, out, ckpt)

    # ---- contract: pointer, delta set, and full tree equivalence
    xp = ik.read_ptr(idx, ptr)
    assert cp is not None and xp is not None and cp[0] == xp[0]
    x_deltas = sorted(
        os.path.basename(d) for d in ik.committed_deltas(idx, ptr)
    )
    assert c_deltas == x_deltas
    assert _tree_snapshot(spark, idx) == c_idx_snap
    assert _tree_snapshot(spark, out) == c_out_snap
