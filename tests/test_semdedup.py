"""SemDeDup invariants (operators/dedup.py::semantic_dedup): the drop
policy is exactly 'any lower-id cluster-mate at cosine >= tau', dup_of
is the lowest such mate, and the whole pipeline is deterministic."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from cdc_via_flink_spark.operators.dedup import semantic_dedup
from cdc_via_flink_spark.sources.tables import load_table

from .conftest import SF0001

TAU = 0.4


def _decisions(spark):
    e = load_table(spark, SF0001, "embeddings")
    dec = semantic_dedup(e, tau=TAU).join(
        e.select("vec_id", "embedding"), "vec_id"
    )
    return {
        r["vec_id"]: (
            r["cluster_id"],
            r["kept"],
            r["dup_of"],
            r["pair_cos"],
            np.array(r["embedding"], dtype=np.float64),
        )
        for r in dec.collect()
    }


def _cos(u, v):
    return round(float(u @ v / (np.sqrt(u @ u) * np.sqrt(v @ v))), 6)


def test_semantic_dedup_drop_policy_exact(spark):
    decs = _decisions(spark)
    assert len(decs) == 500
    by_cluster: dict[int, list[int]] = {}
    for vid, (cid, *_rest) in decs.items():
        by_cluster.setdefault(cid, []).append(vid)

    for vid, (cid, kept, dup_of, pair_cos, v) in decs.items():
        close_lower = sorted(
            a
            for a in by_cluster[cid]
            if a < vid and _cos(decs[a][4], v) >= TAU
        )
        if kept:
            assert not close_lower, f"{vid} kept but has close mates {close_lower}"
            assert dup_of == -1 and pair_cos == -1.0
        else:
            assert close_lower, f"{vid} dropped with no close lower-id mate"
            assert dup_of == close_lower[0]
            assert pair_cos == _cos(decs[dup_of][4], v)


def test_semantic_dedup_deterministic(spark):
    e = load_table(spark, SF0001, "embeddings")
    a = semantic_dedup(e, tau=TAU).orderBy("vec_id").collect()
    b = semantic_dedup(e, tau=TAU).orderBy("vec_id").collect()
    assert a == b
    assert any(not r["kept"] for r in a)  # fixture actually exercises drops


def test_auto_coarse_stride_matches_explicit(spark):
    """semantic_dedup(coarse_every_k=None) derives the coarse stride
    from the corpus via two_level_plan and must equal the explicitly
    sized run (r6 auto-sizing path)."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.dedup import semantic_dedup
    from cdc_via_flink_spark.operators.kmeans import two_level_plan
    from cdc_via_flink_spark.sources.tables import load_table
    from tests.conftest import SF0001

    e = load_table(spark, SF0001, "embeddings")
    n = e.count()
    ck, fk = two_level_plan(n, 100)
    auto = sorted(tuple(r) for r in semantic_dedup(e, coarse_every_k=None).collect())
    explicit = sorted(
        tuple(r)
        for r in semantic_dedup(e, every_k=fk, coarse_every_k=ck).collect()
    )
    assert auto == explicit and len(auto) > 0
