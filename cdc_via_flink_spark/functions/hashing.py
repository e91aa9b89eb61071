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


def a_j(j: int) -> int:
    return 2 * j + 3


def b_j(j: int) -> int:
    return 5 * j + 7


def token_int(col: Column) -> Column:
    """BIGINT hash of a string token, identical in DuckDB (see module doc)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


SQL_TOKEN_INT = "CAST(('0x' || substring(md5({col}), 1, 15)) AS BIGINT)"


def minhash_expr(tok_int: Column, j: int) -> Column:
    """h_j applied to a token-int column (use under F.min for minhash)."""
    return (F.lit(a_j(j)) * (tok_int % F.lit(P)) + F.lit(b_j(j))) % F.lit(P)


def sql_minhash(expr: str, j: int) -> str:
    return f"({a_j(j)} * ({expr} % {P}) + {b_j(j)}) % {P}"
