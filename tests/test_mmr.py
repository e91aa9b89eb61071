"""MMR rerank (sim_mmr_rerank): independent pure-Python greedy
reference + the one plan property the 100 TB claim rests on (the
corpus-sized stage is a single WindowGroupLimit-capped scoring pass;
everything above operates on pool-bounded rows)."""

from __future__ import annotations

from cdc_via_flink_spark.plans.registry import load_all

from .conftest import SF0001

SPECS = load_all()


def test_mmr_matches_python_reference(spark):
    import duckdb
    from decimal import Decimal

    vecs = dict(
        duckdb.connect()
        .execute(
            f"""SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
            FROM '{SF0001}/embeddings.parquet'"""
        )
        .fetchall()
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return round(d / (na * nb), 6)

    expected = []
    for qid in range(5):
        qv = vecs[qid]
        rel = {
            vid: cos(v, qv) for vid, v in vecs.items() if vid != qid
        }
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:20]
        sims = {
            (a, b): cos(vecs[a], vecs[b])
            for a in pool
            for b in pool
            if a != b
        }
        sel = []
        for step in range(1, 6):
            if not sel:
                cands = {
                    c: (Decimal(7) * Decimal(str(rel[c])))
                    * Decimal("0.1")
                    for c in pool
                }
            else:
                cands = {}
                for c in pool:
                    if c in sel:
                        continue
                    ms = max(sims[(c, s)] for s in sel)
                    cands[c] = (
                        Decimal(7) * Decimal(str(rel[c]))
                        - Decimal(3) * Decimal(str(ms))
                    ) * Decimal("0.1")
            pick = min(cands, key=lambda c: (-cands[c], c))
            sel.append(pick)
            expected.append((qid, step, pick, float(cands[pick])))

    rows = SPECS["sim_mmr_rerank"].fn(spark, SF0001).collect()
    got = sorted(
        (r["query_id"], r["step"], r["vec_id"], r["score"]) for r in rows
    )
    assert sorted(expected) == got, (sorted(expected)[:6], got[:6])


def test_mmr_single_corpus_scan_with_group_limit(spark):
    """The query localCheckpoints the pool (the greedy chain would
    otherwise inline the corpus scan O(K) times — measured 13.5 s vs
    ~3 s), so the pin targets stage 1 itself: the same
    brute_force_topk(k=POOL) call the query makes must carry the
    WindowGroupLimit rank pushdown."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.operators.similarity import brute_force_topk
    from cdc_via_flink_spark.sources.tables import load_table

    e = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = brute_force_topk(e, qs, k=20)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan
