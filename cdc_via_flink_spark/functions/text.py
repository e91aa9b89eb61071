"""Text-normalization and tokenization columns (SURVEY.md X3).

All pure built-in expressions (JVM codegen, no UDFs) with exact DuckDB
SQL twins — every helper documents its oracle form. Note DuckDB's
regexp_replace needs the 'g' flag to replace all matches; Spark always
replaces all.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Oracle twin: lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
def normalize_text(col: Column) -> Column:
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


SQL_NORMALIZE = "lower(trim(regexp_replace({col}, '\\s+', ' ', 'g')))"


# Oracle twin: string_split(<normalized>, ' ')
def tokens(col: Column) -> Column:
    return F.split(normalize_text(col), " ")


# Word k-shingles: array of 'w1 w2 w3' strings.
# Oracle twin: see dedup_queries.sql_shingles.
#
# PERFORMANCE: pass a MATERIALIZED array column (a plain column
# reference), not an inline tokens(text) expression — an expensive
# expression referenced inside the transform() lambda is re-evaluated
# per array element (the regex split would run O(n) times per row).
# Build tokens in their own projection first; CollapseProject keeps
# non-cheap multiply-referenced aliases materialized.
def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    n = F.size(toks)
    return F.when(n < k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )


def shingles(col: Column, k: int = 3) -> Column:
    """Convenience form over raw text — fine for one-shot use; hot
    paths should materialize tokens and use shingles_from_tokens."""
    return shingles_from_tokens(tokens(col), k)
