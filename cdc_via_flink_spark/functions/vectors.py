"""Vector math over ARRAY<FLOAT> embedding columns (SURVEY.md X2) —
pure Catalyst expressions (zip_with + aggregate fold), no UDFs, so the
similarity hot path stays inside whole-stage codegen.

Cross-engine note: the fold is a sequential left-to-right double sum,
matching DuckDB's list functions; outputs are still rounded (6 d.p.)
before use as ordering keys, with id tie-breaks, so a final-ulp
difference can't flip results.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))

