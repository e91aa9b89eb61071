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


# --------------------------------------------------------------------------
# Unicode / multilingual hardening (SURVEY X3 widening): a real
# pretraining corpus is not Latin-script — CJK text carries no spaces
# (the whitespace tokenizer above sees one giant token per sentence),
# and byte-distinct NFC/NFD representations of the SAME text defeat
# content fingerprinting unless normalized first.
# --------------------------------------------------------------------------

# Java regex (Spark) wants \p{IsHan}; RE2 (DuckDB) wants \p{Han}. Same
# scripts, two spellings — keep the class lists in lockstep.
CJK_CLASS_JAVA = r"\p{IsHan}\p{IsHiragana}\p{IsKatakana}\p{IsHangul}"
CJK_CLASS_RE2 = r"\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}"

# Oracle twin builder (a function, not a .format template — the regex
# class' own {braces} would collide with str.format placeholders):
def sql_segment_cjk(col: str) -> str:
    return "regexp_replace(" + col + ", '([" + CJK_CLASS_RE2 + "])', ' \\1 ', 'g')"


def segment_cjk(col: Column) -> Column:
    """Space-delimit CJK codepoints so the whitespace tokenizer treats
    each as its own token — the standard character-level fallback for
    unsegmented scripts (what CJK analyzers do absent a dictionary).
    Latin/space-delimited text passes through unchanged."""
    return F.regexp_replace(col, f"([{CJK_CLASS_JAVA}])", r" $1 ")


# Oracle twin: list-filter empty after string_split of the segmented,
# normalized text (see SQL_SEGMENT_CJK + SQL_NORMALIZE composition).
def tokens_unicode(col: Column) -> Column:
    """Script-aware tokens: CJK characters become single-char tokens,
    space-delimited scripts split as before. Pure built-in expressions
    (regexp + split), same JVM codegen path as tokens()."""
    return F.split(normalize_text(segment_cjk(col)), " ")


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization. Spark has no built-in normalizer, so
    this is a VECTORIZED Arrow pandas_udf (the sanctioned Python
    surface — never row-at-a-time); DuckDB twin: nfc_normalize(col).
    Apply before any content fingerprint/shingle: NFC and NFD spellings
    of the same text are byte-distinct and would never dedup."""
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s):
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    return _nfc(col)
