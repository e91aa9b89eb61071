"""Deterministic splitting and sampling (training-pipeline surface;
extension per BASELINE.json's north star — the reference has no
sampling operators).

Everything here is hash-bucketed, never RNG-based: ``rand()``-style
sampling changes under task retries, partition counts, and cluster
sizes, which breaks data lineage audits and makes train/test leakage
undetectable. An md5-prefix bucket of the row's id is reproducible
bit-for-bit anywhere (including in the DuckDB oracles, which state the
identical expression), and is pure map-side work — a 100 TB split is
one scan at I/O speed, no shuffle.

Buckets are the first 2 hex chars of md5(salt || id) → 256 uniform
buckets; rates are expressed as k/256. Different concerns use
different salts so e.g. the eval split and a downsample are
statistically independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_bucket", "hash_split", "stratified_sample"]


def hash_bucket(id_col: Column, salt: str = "") -> Column:
    """First 2 hex chars of md5(salt || id): 256 uniform buckets.
    DuckDB twin: ``substr(md5(<salt> || CAST(id AS VARCHAR)), 1, 2)``."""
    s = id_col.cast("string")
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.substring(F.md5(s), 1, 2)


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, int],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a deterministic split label: ``splits`` maps name → number
    of 256ths (e.g. ``{"train": 204, "valid": 26, "test": 26}`` ≈
    80/10/10). Bucket counts must sum to 256."""
    if sum(splits.values()) != 256:
        raise ValueError(f"split buckets must sum to 256, got {sum(splits.values())}")
    b = hash_bucket(F.col(id_col), salt)
    names = list(splits)
    expr = None
    cum = 0
    for name in names[:-1]:  # last name is the otherwise-branch
        cum += splits[name]
        threshold = f"{cum:02x}"
        expr = F.when(b < threshold, name) if expr is None else expr.when(b < threshold, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 256,
    salt: str = "s:",
) -> DataFrame:
    """Keep each row with a per-stratum rate (in 256ths): e.g.
    ``rates={"en": 64}, default_rate=192`` keeps 25% of English rows
    and 75% of everything else. Pure filter — reproducible and
    shuffle-free."""
    for name, r in {**rates, "default": default_rate}.items():
        if not 0 <= r <= 256:
            raise ValueError(f"rate for {name!r} must be in [0, 256], got {r}")
    # rate==256 means keep-all: 'zz' sorts after every 2-char hex bucket.
    # (f"{256:02x}" would be the 3-char '100', which lexicographically
    # keeps only buckets 00-10 — ~6.6% instead of 100%.)
    def hex_thr(rate: int) -> str:
        return f"{rate:02x}" if rate < 256 else "zz"

    thr = F.lit(hex_thr(default_rate))
    for value, rate in rates.items():
        thr = F.when(F.col(strata_col) == value, hex_thr(rate)).otherwise(thr)
    return df.filter(hash_bucket(F.col(id_col), salt) < thr)
