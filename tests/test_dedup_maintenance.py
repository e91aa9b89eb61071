"""Streaming dedup maintenance (streaming/dedup_maintenance.py): the
union of per-epoch pair outputs equals the one-shot batch incremental
run — and the monolithic full-corpus LSH restricted to new-involving
pairs; epochs are replay-idempotent and foreign checkpoints refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.dedup import minhash_lsh_neardup
from cdc_via_flink_spark.plans.streaming_queries import (
    STAGE_ROOT,
    _stage_ordered_files,
)
from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.streaming.dedup_maintenance import (
    dedup_maintenance_query,
    read_emitted_pairs,
    save_streaming_dedup_index,
)
from tests.conftest import SF0001

SCHEMA = "doc_id long, text string"


def _corpus(spark):
    d = load_table(spark, SF0001, "documents").select("doc_id", "text")
    extra = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(extra)
    new = corpus.filter(
        (F.col("doc_id") % 5 == 0) | (F.col("doc_id") >= 500_000)
    )
    old = corpus.subtract(new)
    return corpus, old, new


def _run(spark, tmp_path, old, new, name):
    idx = str(tmp_path / f"{name}_idx")
    out = str(tmp_path / f"{name}_pairs")
    ckpt = str(tmp_path / f"{name}_ckpt")
    save_streaming_dedup_index(old, idx)
    frames = [
        new.filter(F.pmod(F.col("doc_id"), 3) == k).orderBy("doc_id")
        for k in range(3)
    ]
    dest = os.path.join(STAGE_ROOT, f"dedup_maint_{name}")
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = dedup_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    return idx, out, ckpt, dest


def test_epoch_union_equals_monolithic_restricted(spark, tmp_path):
    corpus, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "main")

    got = sorted(tuple(r) for r in read_emitted_pairs(spark, out).collect())
    full = minhash_lsh_neardup(corpus, "text", "doc_id")
    new_ids = {r.doc_id for r in new.collect()}
    expected = sorted(
        tuple(r)
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    )
    assert got == expected and len(got) > 0

    # replay idempotency: a fresh query on the SAME checkpoint and
    # source has nothing new — outputs and committed epochs unchanged
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q2 = dedup_maintenance_query(stream, idx, out, ckpt)
    q2.awaitTermination()
    assert sorted(os.listdir(out)) == before
    got2 = sorted(tuple(r) for r in read_emitted_pairs(spark, out).collect())
    assert got2 == expected

    # foreign checkpoint refused: same index, different checkpoint
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q3 = dedup_maintenance_query(
        stream, idx, out, str(tmp_path / "other_ckpt")
    )
    with pytest.raises(Exception, match="refusing epochs"):
        q3.awaitTermination()


def test_compaction_is_pure_physical_rewrite(spark, tmp_path):
    """compact_dedup_index folds deltas into base without changing
    what later batches see: a post-compaction batch's pairs equal the
    never-compacted run's, folded epochs stay skipped on replay, and a
    crashed fold (marker + tmp present, swap not applied) recovers by
    aborting with the deltas intact."""
    import shutil as sh

    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        _committed_deltas,
        compact_dedup_index,
        read_dedup_index,
    )

    corpus, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "compact")

    banded_before, docs_before = read_dedup_index(spark, idx)
    nb, nd = banded_before.count(), docs_before.count()
    assert len(_committed_deltas(idx)) == 3

    # crashed-fold state: marker + tmp, swap not applied -> abort
    tmp = os.path.join(idx, "_base_compact_tmp")
    os.makedirs(tmp)
    with open(os.path.join(idx, "_COMPACTING"), "w") as f:
        f.write("2")
    banded_rec, _ = read_dedup_index(spark, idx)  # recovery runs
    assert not os.path.exists(os.path.join(idx, "_COMPACTING"))
    assert len(_committed_deltas(idx)) == 3  # deltas intact
    assert banded_rec.count() == nb

    res = compact_dedup_index(spark, idx)
    assert res == {"deltas_folded": 3}
    assert _committed_deltas(idx) == []
    banded_after, docs_after = read_dedup_index(spark, idx)
    assert banded_after.count() == nb and docs_after.count() == nd

    # replay after compaction: folded epochs still skip (pointer
    # high-water preserved), outputs unchanged
    before = sorted(os.listdir(out))
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = dedup_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()
    assert sorted(os.listdir(out)) == before

    # a NEW batch after compaction sees the same corpus: its pairs
    # equal the never-compacted (monolithic) run restricted to it
    late = corpus.filter(F.col("doc_id") % 11 == 3).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    extra_file = late.orderBy("doc_id")
    tmp_stage = dest + "_w_late"
    extra_file.coalesce(1).write.mode("overwrite").parquet(tmp_stage)
    import glob as g

    part = g.glob(f"{tmp_stage}/part-*.parquet")[0]
    sh.copy(part, os.path.join(dest, "0099.parquet"))
    os.utime(os.path.join(dest, "0099.parquet"), (2_000_000_000, 2_000_000_000))
    sh.rmtree(tmp_stage)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    q = dedup_maintenance_query(stream, idx, out, ckpt)
    q.awaitTermination()

    all_docs = corpus.unionByName(late)
    full = minhash_lsh_neardup(all_docs, "text", "doc_id")
    new_ids = {r.doc_id for r in new.collect()} | {
        r.doc_id for r in late.collect()
    }
    expected = sorted(
        tuple(r)
        for r in full.collect()
        if r.id_a in new_ids or r.id_b in new_ids
    )
    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        read_emitted_pairs,
    )

    got = sorted(tuple(r) for r in read_emitted_pairs(spark, out).collect())
    assert got == expected


def test_maintenance_rejects_mismatched_index_sizing(spark, tmp_path):
    """A maintainer whose resolved sizing disagrees with the index's
    stored meta must fail LOUDLY at query construction (ADVICE r7):
    mismatched banding joins on disjoint (band, bsig) keys — zero
    candidates, no error, recall silently gone."""
    _, old, _ = _corpus(spark)
    idx = str(tmp_path / "mm_idx")
    save_streaming_dedup_index(old.limit(30), idx, threshold=0.5)
    src = tmp_path / "mm_src"
    src.mkdir()
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    with pytest.raises(ValueError, match="stores banding"):
        dedup_maintenance_query(
            stream, idx, str(tmp_path / "mm_out"), str(tmp_path / "mm_ckpt"),
            threshold=0.9,
        )
    with pytest.raises(ValueError, match="stores banding"):
        dedup_maintenance_query(
            stream, idx, str(tmp_path / "mm_out"), str(tmp_path / "mm_ckpt"),
            num_hashes=16, bands=4, rows=4,
        )
    # an index saved by a pre-metadata build (no base/meta) also fails
    import shutil

    shutil.rmtree(os.path.join(idx, "base", "meta"))
    with pytest.raises(ValueError, match="predates"):
        dedup_maintenance_query(
            stream, idx, str(tmp_path / "mm_out"), str(tmp_path / "mm_ckpt"),
        )


def test_compaction_preserves_index_meta(spark, tmp_path):
    """compact_dedup_index's base swap must carry the sizing meta into
    the replacement base — post-compaction probes still validate."""
    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        compact_dedup_index,
    )

    _, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "metakeep")
    assert compact_dedup_index(spark, idx)["deltas_folded"] > 0
    m = spark.read.parquet(os.path.join(idx, "base", "meta")).head()
    from cdc_via_flink_spark.functions.hashing import MINHASH_FAMILY
    from cdc_via_flink_spark.operators.dedup import minhash_plan

    assert (m.num_hashes, m.bands, m.rows) == minhash_plan(0.5)
    assert m.hash_family == MINHASH_FAMILY


def test_profile_sizing_resolution():
    """profile='streaming' derives minhash_plan(t, target_miss=0.2);
    explicit pins win; unknown profile rejected."""
    from cdc_via_flink_spark.operators.dedup import minhash_plan
    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        resolve_profile_banding,
    )

    assert resolve_profile_banding(None, None, None, 0.5, "exact") == minhash_plan(0.5)
    assert resolve_profile_banding(None, None, None, 0.5, "streaming") == minhash_plan(
        0.5, target_miss=0.2
    )
    assert resolve_profile_banding(None, None, None, 0.5, "streaming") == (39, 13, 3)
    # explicit pins win over the profile
    assert resolve_profile_banding(16, 4, 4, 0.5, "streaming") == (16, 4, 4)
    with pytest.raises(ValueError, match="profile"):
        resolve_profile_banding(None, None, None, 0.5, "fast")


def _boundary_corpus(spark, n_pairs=30, n_background=120):
    """Constructed exact-J=0.5 pairs (the bench_minhash_recall recipe:
    m=42 shared words + s=20 fresh per side -> 40/80 word-3-shingle
    Jaccard) split so one member is indexed and the other arrives in
    the batch; background docs are all-unique words."""
    docs, truth, uid = [], set(), 0

    def words(n):
        nonlocal uid
        out = [f"w{uid + i:07d}" for i in range(n)]
        uid += n
        return out

    for i in range(n_pairs):
        block = words(42)
        docs.append((2 * i, " ".join(block + words(20)), "old"))
        docs.append((2 * i + 1, " ".join(block + words(20)), "new"))
        truth.add((2 * i, 2 * i + 1))
    base = 2 * n_pairs
    for k in range(n_background):
        side = "old" if k % 2 == 0 else "new"
        docs.append((base + k, " ".join(words(40)), side))
    df = spark.createDataFrame(docs, "doc_id long, text string, side string")
    old = df.filter("side = 'old'").select("doc_id", "text")
    new = df.filter("side = 'new'").select("doc_id", "text")
    return old, new, truth


def test_streaming_profile_compaction_restores_recall(spark, tmp_path):
    """VERDICT r8 #8: the streaming profile's 20 % per-batch
    boundary-miss budget is real (it misses constructed exact-J=0.5
    pairs the exact plan catches), and re-running the batch pipeline
    at the exact plan over the COMPACTED corpus recovers them — the
    documented restore path, now pinned. Also pins the meta guard:
    an index built at one profile refuses a maintainer at the other."""
    from cdc_via_flink_spark.streaming.dedup_maintenance import (
        compact_dedup_index,
        read_dedup_index,
    )

    old, new, truth = _boundary_corpus(spark)
    idx = str(tmp_path / "prof_idx")
    out = str(tmp_path / "prof_pairs")
    ckpt = str(tmp_path / "prof_ckpt")
    save_streaming_dedup_index(old, idx, profile="streaming")

    frames = [
        new.filter(F.pmod(F.col("doc_id"), 2) == k).orderBy("doc_id")
        for k in range(2)
    ]
    dest = os.path.join(STAGE_ROOT, "dedup_maint_profile")
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    # profile mismatch is refused BEFORE the stream starts
    with pytest.raises(ValueError, match="banding"):
        dedup_maintenance_query(stream, idx, out + "_x", ckpt + "_x")
    dedup_maintenance_query(
        stream, idx, out, ckpt, profile="streaming"
    ).awaitTermination()

    emitted = {
        (r.id_a, r.id_b)
        for r in read_emitted_pairs(spark, out, index_path=idx).collect()
    }
    missed = truth - emitted
    # the 20 % miss budget bites at the exact boundary (deterministic
    # hashing: this construction's miss set is fixed)
    assert missed, "streaming profile missed no boundary pair — fixture too easy"

    # restore: compact, then the batch pipeline at the EXACT plan over
    # the compacted corpus docs
    compact_dedup_index(spark, idx)
    _banded, docs = read_dedup_index(spark, idx)
    found = {
        (min(r.id_a, r.id_b), max(r.id_a, r.id_b))
        for r in minhash_lsh_neardup(docs, "text", "doc_id", threshold=0.5).collect()
    }
    recovered = missed & found
    assert recovered, "exact-plan rerun recovered none of the streaming misses"
    assert len(found & truth) > len(emitted & truth)


def test_read_emitted_pairs_committed_filter_and_empty(spark, tmp_path):
    """read_emitted_pairs returns an empty TYPED frame when nothing
    was emitted, and with index_path excludes an epoch published past
    the committed pointer (crash-before-commit debris)."""
    from cdc_via_flink_spark.streaming.dedup_maintenance import PAIRS_SCHEMA

    empty = read_emitted_pairs(spark, str(tmp_path / "nothing_here"))
    assert empty.count() == 0
    assert empty.schema == spark.createDataFrame([], PAIRS_SCHEMA).schema

    corpus, old, new = _corpus(spark)
    idx, out, ckpt, dest = _run(spark, tmp_path, old, new, "ptrfilter")
    committed = read_emitted_pairs(spark, out, index_path=idx).count()
    assert committed == read_emitted_pairs(spark, out).count()
    # fabricate a published-but-uncommitted epoch (pointer never moved)
    spark.createDataFrame(
        [(111_111, 222_222, 1, 1, 1, 1.0)], PAIRS_SCHEMA
    ).write.parquet(os.path.join(out, "e99"))
    assert read_emitted_pairs(spark, out).count() == committed + 1
    assert read_emitted_pairs(spark, out, index_path=idx).count() == committed
