"""Top principal component over a model-sized covariance matrix by
LOG-STEP MATRIX SQUARING
(plans/similarity_queries.py::sim_pca_top_component).

The DISTRIBUTED part — per-dimension means and the d x d covariance
Gram reduce over the embedding corpus — happens in the plans layer
(one shuffle on vec_id, then a d^2-key aggregate with map-side
combine). What lives here is the MODEL-sized step: the d x d matrix
(d^2 rows, corpus-size-INDEPENDENT) is collected once, rebuilt as a
LocalRelation, and SQUARED ``t`` times with max-element normalization
— C -> C^2 -> C^4 -> ... -> C^(2^t), whose columns converge to the
dominant eigenvector direction with effective power 2^t. Squaring
instead of plain power iteration is load-bearing here: a
near-isotropic embedding corpus has eigengap ratios ~0.99, where
k-step iteration needs k in the thousands but 11 squarings deliver
(lambda2/lambda1)^2048 ~ 1e-12 suppression for 11 tiny self-joins.
Keeping the arithmetic in Spark expressions (not driver Python)
reuses the engine/oracle round-parity contract; the LocalRelation
keeps the expensive covariance subtree OUT of the 2^t-duplicated
squaring lineage (the exponential-inlining trap the oracle avoids
with AS MATERIALIZED).

Numeric contract per squaring (identical CTEs in the oracle):
products run in DOUBLE, are rounded half-up to 14 dp and folded as
DECIMAL(30,14) (association-order independent); the matrix is then
rescaled by its max |entry| (exact decimal max, one double divide)
and rounded to 12 dp DECIMAL. The eigenvector is the column at the
largest diagonal entry (its own component made positive by
construction), unit-normalized; the eigenvalue is the Rayleigh
quotient against the ORIGINAL covariance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _matmul(a: DataFrame, b: DataFrame) -> DataFrame:
    """(i,k,s) x (k,j,s) -> (i,j,p) with the 14-dp decimal fold."""
    left = a.select(F.col("i"), F.col("j").alias("k"), F.col("s").alias("sa"))
    right = b.select(F.col("i").alias("k"), F.col("j"), F.col("s").alias("sb"))
    return (
        left.join(right, "k")
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.round(
                    F.col("sa").cast("double") * F.col("sb").cast("double"), 14
                ).cast("decimal(30,14)")
            )
            .cast("decimal(32,14)")
            .alias("p")
        )
    )


def _rescaled(p: DataFrame) -> DataFrame:
    """Divide by max |entry| (exact decimal max) and round to 12 dp."""
    mx = p.agg(F.max(F.abs(F.col("p"))).cast("double").alias("mx"))
    return p.crossJoin(F.broadcast(mx)).select(
        "i",
        "j",
        F.round(F.col("p").cast("double") / F.col("mx"), 12)
        .cast("decimal(14,12)")
        .alias("s"),
    )


def top_vector(
    spark: SparkSession, cov_df: DataFrame, d: int, squarings: int
) -> tuple[DataFrame, DataFrame]:
    """(cov LocalRelation, unit top eigenvector (i int,
    v decimal(14,12))) via ``squarings`` normalized matrix squarings
    (effective power 2^squarings) — the shared model step of
    sim_pca_top_component and sim_pca_scores. ``d`` is load-bearing:
    the collected covariance must be the dense d x d matrix (d*d
    rows), or the squaring silently operates on a ragged frame."""
    rows = cov_df.collect()
    if len(rows) != d * d:
        raise ValueError(
            f"covariance frame has {len(rows)} rows, expected d*d={d * d}"
        )
    cov = spark.createDataFrame(rows, "i int, j int, cv decimal(16,12)")
    # localCheckpoint per level: the squaring references its input
    # TWICE, so an un-truncated lineage is a 2^t-leaf binary tree —
    # each level is materialized (4096 rows, model-sized) before the
    # next squaring, keeping the plan linear in t.
    s = _rescaled(
        cov.select("i", "j", F.col("cv").cast("decimal(32,14)").alias("p"))
    ).localCheckpoint(eager=True)
    for _ in range(squarings):
        s = _rescaled(_matmul(s, s)).localCheckpoint(eager=True)
    jstar = (
        s.filter(F.col("i") == F.col("j"))
        .orderBy(F.col("s").desc(), F.col("i").asc())
        .limit(1)
        .select(F.col("j").alias("jsel"))
    )
    vraw = s.join(F.broadcast(jstar), s.j == F.col("jsel")).select("i", "s")
    nrm = vraw.agg(
        F.sqrt(
            F.sum(
                F.round(
                    F.col("s").cast("double") * F.col("s").cast("double"), 14
                ).cast("decimal(30,14)")
            ).cast("double")
        ).alias("nrm")
    )
    v = vraw.crossJoin(F.broadcast(nrm)).select(
        "i",
        F.round(F.col("s").cast("double") / F.col("nrm"), 12)
        .cast("decimal(14,12)")
        .alias("v"),
    )
    return cov, v


def top_component(
    spark: SparkSession, cov_df: DataFrame, d: int, squarings: int
) -> DataFrame:
    """Dominant eigenvector/eigenvalue/variance-share output frame
    (dim, loading, eigenvalue, var_share)."""
    cov, v = top_vector(spark, cov_df, d, squarings)
    w = (
        cov.join(v.select(F.col("i").alias("j"), F.col("v")), "j")
        .groupBy("i")
        .agg(
            F.sum(
                F.round(
                    F.col("cv").cast("double") * F.col("v").cast("double"), 14
                ).cast("decimal(30,14)")
            )
            .cast("decimal(32,14)")
            .alias("w")
        )
    )
    lam = (
        v.join(w, "i")
        .agg(
            F.sum(
                F.round(
                    F.col("v").cast("double") * F.col("w").cast("double"), 14
                ).cast("decimal(30,14)")
            )
            .cast("double")
            .alias("l")
        )
    )
    tr = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum("cv").cast("double").alias("t")
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(tr))
        .select(
            F.col("i").cast("long").alias("dim"),
            F.round(F.col("v").cast("double"), 6).alias("loading"),
            F.round(F.col("l"), 6).alias("eigenvalue"),
            F.round(F.col("l") / F.col("t"), 6).alias("var_share"),
        )
        .orderBy("dim")
    )
