"""Deterministic cross-engine hashing for dedup sketches (SURVEY.md X1).

Both engines need bit-identical token hashes, so murmur/xxhash (engine-
specific) are out; instead: token -> md5 hex -> first 15 hex chars ->
BIGINT (fits: 15 hex digits < 2^60), then universal-hash family
h_j(t) = (a_j * (t mod P) + b_j) mod P over prime P = 1e9+7.

Spark side: conv(substring(md5(tok),1,15),16,10) cast bigint.
DuckDB side: ('0x' || substring(md5(tok),1,15))::BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

P = 1_000_000_007

# Version tag of the MinHash universal-hash family, persisted in every
# saved dedup index (operators/dedup.py::save_dedup_index,
# streaming/dedup_maintenance.py) and validated at probe time: band
# signatures computed under DIFFERENT (a_j, b_j) coefficients join on
# disjoint (band, bsig) keys and silently yield near-zero candidates —
# no error, just recall collapse (ADVICE r7). Bump whenever a_j/b_j/
# token_int change semantics: v1 = the pre-r7 linear-ramp a_j = 2j+3;
# v2 = splitmix64-mixed coefficients (current).
MINHASH_FAMILY = 2


def _mix64(x: int) -> int:
    """splitmix64 finalizer — full-avalanche mixing, the same family
    the SRP projections use (operators/similarity.py::proj_vector,
    the round-6 fix for near-collinear linear-ramp projections)."""
    mask = (1 << 64) - 1
    x = (x * 0x9E3779B97F4A7C15 + 0x94D049BB133111EB) & mask
    x ^= x >> 30
    x = (x * 0xBF58476D1CE4E5B9) & mask
    x ^= x >> 27
    x = (x * 0x94D049BB133111EB) & mask
    x ^= x >> 31
    return x


def a_j(j: int) -> int:
    """Multiplier of the j-th universal hash, mixed into [1, P-1].

    The pre-r7 family was the linear ramp 2j+3 — the same defect
    class as the r6 SRP sawtooth projections: small correlated
    multipliers make h_j and h_{j+1} differ by the LINEAR term
    (2t+5) mod P, so adjacent hash functions rank small token sets
    similarly and r-row band collisions deviate from the
    independent-hash model (measured on constructed exact-Jaccard
    pairs: 98.75 % recall where the model says ~100 % at j = 0.75).
    Mixed multipliers restore statistical independence across j; the
    SQL oracle twins inline the emitted literals, never the formula,
    so both engines move in lockstep. Product bound: (P-1)·(P-1)
    ≈ 1e18 < 2^63 — BIGINT-safe in both engines."""
    return _mix64(2 * j) % (P - 1) + 1


def b_j(j: int) -> int:
    """Offset of the j-th universal hash, mixed into [0, P-1]."""
    return _mix64(2 * j + 1) % P


def token_int(col: Column) -> Column:
    """BIGINT hash of a string token, identical in DuckDB (see module doc)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


SQL_TOKEN_INT = "CAST(('0x' || substring(md5({col}), 1, 15)) AS BIGINT)"


def minhash_expr(tok_int: Column, j: int) -> Column:
    """h_j applied to a token-int column (use under F.min for minhash)."""
    return (F.lit(a_j(j)) * (tok_int % F.lit(P)) + F.lit(b_j(j))) % F.lit(P)


def sql_minhash(expr: str, j: int) -> str:
    return f"({a_j(j)} * ({expr} % {P}) + {b_j(j)}) % {P}"
