"""Cross-engine numeric parity helpers (see plans/registry.py policy).

Double-precision SUMs are association-order dependent, so a Spark
partial-aggregate tree and DuckDB's sequential sum can differ in late
bits. Both engines' DECIMAL arithmetic is exact, so every money/metric
sum is computed over DECIMAL(18,s)-cast inputs and only the final
result is cast back to DOUBLE — bit-identical across engines and
across partitionings (also across cluster sizes: a 1000-executor sum
equals the local one, which is a correctness property worth having at
100 TB, not just an oracle trick).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEC = "decimal(18,2)"


def dec(col: Column, scale: int = 2) -> Column:
    return col.cast(f"decimal(18,{scale})")


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact sum of a double column -> double."""
    return F.sum(dec(col, scale)).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum average: one double divide, identical in both engines."""
    return (F.sum(dec(col, scale)).cast("double") / F.count(col)).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return (
        f"CAST(CAST(sum(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / count({expr}) AS DOUBLE)"
    )


# TPC-H style discounted revenue: exact decimal product then sum.
def revenue_col() -> Column:
    return dec(F.col("l_extendedprice")) * (F.lit(1).cast(DEC) - dec(F.col("l_discount")))


SQL_REVENUE = (
    "CAST(l_extendedprice AS DECIMAL(18,2))"
    " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)
