"""sim_pca_top_component: independent numpy reference + plan shape."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cdc_via_flink_spark.plans.registry import load_all

SPECS = load_all()
SF001 = "/root/testdata/sf0.01"


def test_pca_matches_numpy_eigh(spark):
    """The 8-iteration decimal-folded power iteration must land on
    numpy's exact top eigenvector of the same rounded-input
    covariance (up to sign), with matching Rayleigh eigenvalue and
    variance share."""
    out = SPECS["sim_pca_top_component"].fn(spark, SF001).collect()
    v = np.array([r["loading"] for r in sorted(out, key=lambda r: r["dim"])])
    lam = out[0]["eigenvalue"]
    share = out[0]["var_share"]

    emb = pd.read_parquet(f"{SF001}/embeddings.parquet")["embedding"]
    x = np.round(np.stack(emb.to_numpy()).astype(np.float64), 6)
    c = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(c)
    top = evecs[:, -1]
    if np.dot(top, v) < 0:
        top = -top
    # rounding in the decimal chain perturbs at ~1e-6 scale; the
    # eigengap at this fixture is orders larger
    assert np.linalg.norm(v - top) < 1e-3, np.linalg.norm(v - top)
    assert abs(lam - evals[-1]) < 1e-3 * max(1.0, abs(evals[-1]))
    assert abs(share - evals[-1] / np.trace(c)) < 1e-4
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6


def test_pca_plan_covariance_once_iterations_local(spark):
    """The expensive covariance reduce must appear ONCE: the
    iteration side runs on LocalRelation (collected model), so the
    physical plan has exactly one vec_id self-join and no cartesian
    products; the d^2 aggregate keeps a partial (map-side) phase."""
    df = SPECS["sim_pca_top_component"].fn(spark, SF001)
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "CartesianProduct" not in plan, plan
    # model-side lineage only: LocalTableScan (collected covariance)
    # and checkpointed squaring levels (Scan ExistingRDD)
    assert "LocalTableScan" in plan or "ExistingRDD" in plan, plan
    # the parquet scan does NOT appear in the returned frame's plan
    # (covariance was collected upstream, squarings checkpointed)
    assert "parquet" not in plan.lower(), plan


def test_pca_scores_match_numpy_projection(spark):
    """sim_pca_scores top outliers == numpy projection onto the eigh
    top component (up to global sign), same ranking."""
    out = SPECS["sim_pca_scores"].fn(spark, SF001).collect()
    comp = SPECS["sim_pca_top_component"].fn(spark, SF001).collect()
    v = np.array([r["loading"] for r in sorted(comp, key=lambda r: r["dim"])])

    df = pd.read_parquet(f"{SF001}/embeddings.parquet")
    x = np.round(np.stack(df["embedding"].to_numpy()).astype(np.float64), 6)
    ids = df["vec_id"].to_numpy()
    scores = (x - x.mean(0)) @ v
    order = np.argsort(-np.abs(scores))[: len(out)]
    assert [r["vec_id"] for r in out] == list(ids[order])
    for r, k in zip(out, order):
        assert abs(r["pc_score"] - scores[k]) < 1e-3, (r, scores[k])


def test_effective_rank_matches_numpy_spectrum(spark):
    """sim_effective_rank == (sum eigvals)^2 / sum(eigvals^2) from
    numpy's spectrum of the same rounded-input covariance; isotropy
    near 1 on this near-isotropic corpus (the documented reason the
    component query needs gap-free squaring)."""
    row = SPECS["sim_effective_rank"].fn(spark, SF001).collect()[0]
    df = pd.read_parquet(f"{SF001}/embeddings.parquet")
    x = np.round(np.stack(df["embedding"].to_numpy()).astype(np.float64), 6)
    c = np.cov(x, rowvar=False, ddof=1)
    ev = np.linalg.eigvalsh(c)
    er = ev.sum() ** 2 / (ev**2).sum()
    assert abs(row["trace"] - np.trace(c)) < 1e-3
    assert abs(row["effective_rank"] - er) < 0.05, (row, er)
    assert row["isotropy"] > 0.7  # near-isotropic fixture
