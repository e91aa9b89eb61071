"""Text-analysis declared queries (SURVEY.md X3) over `documents`:
token counting (whitespace + BPE-ish regex), quality scoring,
language-ID heuristic, fingerprinting, TF-IDF top terms.

Everything is built-in expressions (no UDFs): tokenizers are
regexp/split, scores are arithmetic — the whole X3 surface stays in
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.functions.hashing import SQL_TOKEN_INT, token_int
from cdc_via_flink_spark.functions.text import normalize_text, tokens
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table

SQL_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_token_stats",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split({SQL_NORM}, ' '))) AS BIGINT) AS ws_tokens,
       CAST(sum(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT)
         AS bpe_tokens,
       CAST(CAST(sum(len(string_split({SQL_NORM}, ' '))) AS DOUBLE)
            / count(*) AS DOUBLE) AS avg_ws_tokens
FROM documents GROUP BY lang
""",
    tags=("X3", "tokens"),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    segmentation (letters / digits / single punctuation)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(tokens(F.col("text"))).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).cast("long")
    return (
        d.select("lang", ws.alias("ws"), bpe.alias("bpe"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
            (F.sum("ws").cast("double") / F.count(F.lit(1))).alias("avg_ws_tokens"),
        )
    )


@query(
    "text_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, n_chars,
         string_split({SQL_NORM}, ' ') AS tk,
         {SQL_NORM} AS norm
  FROM documents
),
m AS (
  SELECT doc_id, lang, n_chars,
         len(tk) AS n_words,
         len(list_filter(tk, w -> w = 'the' OR w = 'a')) AS n_stop,
         length(norm) - length(replace(norm, ' ', '')) AS n_spaces
  FROM t
)
SELECT doc_id, lang, n_words,
       round(CAST(n_stop AS DOUBLE) / n_words, 6) AS stopword_ratio,
       round(CAST(n_chars AS DOUBLE) / n_words, 6) AS chars_per_word,
       CASE WHEN n_words >= 40 AND CAST(n_stop AS DOUBLE) / n_words < 0.2
            THEN 'good' ELSE 'short_or_stopwordy' END AS quality_class
FROM m WHERE doc_id % 5 = 0
""",
    tags=("X3", "quality"),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, stopword ratio, chars-per-word, bucket
    label — the standard pre-training corpus filters."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    n_words = F.size(tk).cast("long")
    n_stop = F.size(F.filter(tk, lambda w: (w == "the") | (w == "a"))).cast("long")
    stop_ratio = n_stop.cast("double") / n_words
    return (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(
            "doc_id",
            "lang",
            n_words.alias("n_words"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(F.col("n_chars").cast("double") / n_words, 6).alias(
                "chars_per_word"
            ),
            F.when((n_words >= 40) & (stop_ratio < 0.2), "good")
            .otherwise("short_or_stopwordy")
            .alias("quality_class"),
        )
    )


@query(
    "text_langid_confusion",
    oracle="""
WITH p AS (
  SELECT lang,
         CASE WHEN regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') THEN 'zh'
              WHEN regexp_matches(text, '[àâçéèêëîïôùûüÿñáíóúü]') THEN 'latin-acc'
              ELSE 'en-like' END AS predicted
  FROM documents
)
SELECT lang, predicted, count(*) AS n
FROM p GROUP BY lang, predicted
""",
    tags=("X3", "langid"),
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-class language-ID heuristic vs the labeled lang column
    (confusion counts). The fixture corpus is ASCII word-soup, so the
    heuristic collapses to 'en-like' — the query still validates the
    char-class plumbing both engines run."""
    d = load_table(spark, sf_dir, "documents")
    predicted = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(F.col("text").rlike("[àâçéèêëîïôùûüÿñáíóúü]"), "latin-acc")
        .otherwise("en-like")
    )
    return (
        d.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "text_fingerprint",
    oracle=f"""
SELECT doc_id,
       md5({SQL_NORM}) AS fp_md5,
       {SQL_TOKEN_INT.format(col=SQL_NORM)} AS fp64,
       {SQL_TOKEN_INT.format(col=SQL_NORM)} % 1024 AS fp_bucket
FROM documents WHERE doc_id % 7 = 0
""",
    tags=("X3", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 digest + 60-bit integer fingerprint
    + shard bucket (the id you'd partition a 100 TB dedup store by)."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    fp64 = token_int(norm)
    return d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        fp64.alias("fp64"),
        (fp64 % 1024).alias("fp_bucket"),
    )


@query(
    "text_tfidf_top_terms",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, unnest(string_split({SQL_NORM}, ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM scored
)
SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3 AND doc_id < 50
""",
    tags=("X3", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (first 50 docs): explode → tf,
    df aggregates, ln(N/df) weighting, window top-k."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tk.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    # corpus size as a broadcast 1-row aggregate (no driver action —
    # the plans/-wide AST guard bans .count() in builder bodies)
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # idf precomputed on the TERM-sized df frame (VERDICT r12 #7 —
    # the model-side precompute recipe): log(n_docs/df) depends only
    # on the term model, so the corpus-sized (doc, term) pass
    # multiplies a joined double instead of paying a div+log per row.
    # Same expression inputs -> bit-identical double.
    idf = df.crossJoin(F.broadcast(nd)).select(
        "term", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 50))
        .select("doc_id", "term", "tfidf", "rn")
    )


@query(
    "text_top_bigrams",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS t
  FROM documents
),
bg AS (
  SELECT lang,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM tk
),
c AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram),
r AS (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
  FROM c
)
SELECT lang, bigram, n, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
""",
    tags=("X3", "ngrams"),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language: tokens materialized once, the
    bigram transform() runs over the array column (no regex re-eval
    per element), explode → count → window top-k. The groupBy keys
    (lang, bigram) are high-cardinality enough to spread; the final
    per-lang window touches only the aggregated counts."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("lang", tokens(F.col("text")).alias("t"))
    n = F.size(F.col("t"))
    bg = tk.select(
        "lang",
        F.explode(
            F.when(n < 2, F.array().cast("array<string>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("bigram"),
    )
    c = bg.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram"))
    return (
        c.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 5)
        .select("lang", "bigram", "n", "rn")
    )


# Tiny deterministic sentiment lexicon (SURVEY.md X3: "sentiment =
# lexicon join") — stands in for AFINN/VADER-style tables, which is
# exactly how a real lexicon ships: a small dim table broadcast to the
# corpus scan.
LEXICON = [
    ("good", 2), ("great", 3), ("love", 3), ("happy", 2), ("best", 3),
    ("bad", -2), ("terrible", -3), ("hate", -3), ("sad", -2), ("worst", -3),
    # fixture-vocabulary terms (VERDICT r6 #4): the synthetic corpus
    # contains none of the classic AFINN words above, so the check
    # hash-matched two empty results — verifying nothing. "fast" and
    # "slow" are real sentiment-bearing terms that DO occur at every
    # shipped SF (sf0.01: 854/918 hits), making the oracle load-bearing.
    ("fast", 2), ("slow", -2),
]
_SQL_LEXICON = ", ".join(f"('{w}', {s})" for w, s in LEXICON)


@query(
    "text_sentiment_lexicon",
    oracle=f"""
WITH lex(term, score) AS (VALUES {_SQL_LEXICON}),
tk AS (
  SELECT doc_id, lang, unnest(string_split({SQL_NORM}, ' ')) AS term
  FROM documents
),
hits AS (
  SELECT t.doc_id, t.lang, l.score
  FROM tk t JOIN lex l ON t.term = l.term
)
SELECT lang,
       count(DISTINCT doc_id) AS n_docs_scored,
       CAST(sum(score) AS BIGINT) AS total_score,
       CAST(CAST(sum(score) AS DOUBLE) / count(*) AS DOUBLE) AS mean_hit_score
FROM hits GROUP BY lang
""",
    tags=("X3", "sentiment", "lexicon"),
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-join sentiment (SURVEY X3): tokenize → broadcast join
    against the scored term table → per-language aggregate. At 100 TB
    the lexicon is a classic broadcast dim; the token explosion never
    shuffles — only the final small aggregate does."""
    d = load_table(spark, sf_dir, "documents")
    lex = spark.createDataFrame(LEXICON, "term string, score long")
    tk = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term"))
    hits = tk.join(F.broadcast(lex), "term")
    return hits.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs_scored"),
        F.sum("score").alias("total_score"),
        (F.sum("score").cast("double") / F.count(F.lit(1)))
        .cast("double")
        .alias("mean_hit_score"),
    )


@query(
    "text_sentences_udtf",
    oracle="""
WITH p AS (
  SELECT doc_id, string_split(text, '.') AS parts
  FROM documents WHERE doc_id % 13 = 0
),
x AS (
  SELECT doc_id,
         unnest(range(1, len(parts) + 1)) - 1 AS sent_idx,
         trim(unnest(parts)) AS piece
  FROM p
)
SELECT doc_id, CAST(sent_idx AS INT) AS sent_idx,
       length(piece) AS n_chars
FROM x WHERE piece <> ''
""",
    tags=("X3", "udtf"),
)
def text_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation through a Spark-4 Python UDTF (lateral
    table function — the last UDF surface in SURVEY §2.6's matrix).
    Row-at-a-time Python, so NOT a hot-path tool (the plan-shape test
    pins the sanctioned surfaces); it exists to prove the engine's
    table-function extension point with an oracle-checked result."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, sent_idx int, n_chars bigint")
    class SplitSentences:
        def eval(self, doc_id, text):
            for i, piece in enumerate(text.split(".")):
                piece = piece.strip()
                if piece:
                    yield doc_id, i, len(piece)

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 13 == 0
    ).createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT s.doc_id, s.sent_idx, s.n_chars "
        "FROM _docs_udtf d, LATERAL split_sentences(d.doc_id, d.text) s"
    )


@query(
    "text_repetition_filter",
    oracle=f"""
WITH w AS (
  SELECT doc_id, lang, unnest(string_split({SQL_NORM}, ' ')) AS word
  FROM documents
),
wc AS (
  SELECT doc_id, lang, word, count(*) AS cnt
  FROM w GROUP BY doc_id, lang, word
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(sum(cnt) AS BIGINT) AS n_words,
         count(*) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS top_cnt
  FROM wc GROUP BY doc_id, lang
),
scored AS (
  SELECT lang,
         round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_ratio,
         round(CAST(top_cnt AS DOUBLE) / n_words, 6) AS top_frac
  FROM per_doc
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN dup_ratio > 0.6 OR top_frac > 0.2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flagged,
       CAST(CAST(sum(CAST(dup_ratio AS DECIMAL(18,6))) AS DOUBLE) / count(*)
            AS DOUBLE) AS avg_dup_ratio
FROM scored GROUP BY lang
""",
    tags=("X3", "quality", "repetition"),
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: per document, the duplicate-word
    ratio (1 - distinct/total) and the most-frequent-word fraction;
    documents breaching either threshold are flagged as low-quality
    boilerplate. Per-language rollup of flag counts + mean dup ratio.

    Spark-first shape is the scalable wordcount: explode -> two-level
    aggregate (doc,word) then (doc), both map-side combinable, instead
    of any per-row Python. The mean of ratios sums DECIMAL(18,6)-cast
    values so the rollup is association-order independent (parity
    policy), and the per-doc ratios themselves are integer-derived —
    deterministic in both engines."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("word")
    )
    wc = w.groupBy("doc_id", "lang", "word").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = wc.groupBy("doc_id", "lang").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
    )
    scored = per_doc.select(
        "lang",
        F.round(
            1.0 - F.col("n_distinct").cast("double") / F.col("n_words"), 6
        ).alias("dup_ratio"),
        F.round(F.col("top_cnt").cast("double") / F.col("n_words"), 6).alias(
            "top_frac"
        ),
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when((F.col("dup_ratio") > 0.6) | (F.col("top_frac") > 0.2), 1)
            .otherwise(0)
            .cast("long")
        ).alias("n_flagged"),
        (
            F.sum(F.col("dup_ratio").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("avg_dup_ratio"),
    )


# --------------------------------------------------------------------------
# Unicode / multilingual hardening (VERDICT r3 #9): the corpus tables
# are Latin-script, so these queries derive a deterministic
# mixed-script fixture IN-QUERY (translate vowels -> Han codepoints —
# identical positional semantics in both engines) and run the
# script-aware tokenizer over it with full DuckDB oracles.
# --------------------------------------------------------------------------

from cdc_via_flink_spark.functions.text import (  # noqa: E402
    CJK_CLASS_JAVA,
    CJK_CLASS_RE2,
    sql_segment_cjk,
    tokens_unicode,
)

_CJK_MIX_SQL = "translate(substr(text, 1, 120), 'aeiou', '深度学习模')"
_SQL_UNI_TOKENS = (
    "string_split(lower(trim(regexp_replace("
    + sql_segment_cjk("mx")
    + ", '\\s+', ' ', 'g'))), ' ')"
)


@query(
    "text_cjk_token_stats",
    oracle=f"""
WITH m AS (
  SELECT lang, {_CJK_MIX_SQL} AS mx FROM documents
),
t AS (
  SELECT lang, {_SQL_UNI_TOKENS} AS tk FROM m
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(tk)) AS BIGINT) AS n_tokens,
       CAST(sum(len(list_filter(tk,
            x -> regexp_matches(x, '^[{CJK_CLASS_RE2}]')))) AS BIGINT)
         AS n_cjk_tokens
FROM t GROUP BY lang
""",
    tags=("X3", "unicode", "cjk"),
)
def text_cjk_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-aware tokenization over mixed CJK/Latin text: CJK
    codepoints carry no spaces, so the whitespace tokenizer sees one
    giant token per run — tokens_unicode() space-delimits each CJK
    character first (the dictionary-less character-level fallback),
    leaving Latin runs intact. All regexp/split built-ins, zero
    Python; the CJK fixture is derived deterministically in-query."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.translate(
        F.substring(F.col("text"), 1, 120), "aeiou", "深度学习模"
    )
    tk = d.select("lang", tokens_unicode(mixed).alias("tk"))
    is_cjk = lambda t: t.rlike(f"^[{CJK_CLASS_JAVA}]")  # noqa: E731
    return tk.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("tk")).cast("long").alias("n_tokens"),
        F.sum(F.size(F.filter(F.col("tk"), is_cjk)))
        .cast("long")
        .alias("n_cjk_tokens"),
    )


@query(
    "text_tfidf_cjk",
    oracle=f"""
WITH m AS (
  SELECT doc_id, {_CJK_MIX_SQL} AS mx FROM documents
),
tk AS (
  SELECT doc_id, unnest({_SQL_UNI_TOKENS}) AS term FROM m
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tk GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (
  SELECT tf.doc_id, tf.term,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tfidf DESC, term) AS rn
  FROM s
)
SELECT doc_id, term, tfidf, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 3 AND doc_id < 30
""",
    tags=("X3", "tfidf", "unicode", "cjk"),
)
def text_tfidf_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF over the mixed CJK/Latin fixture with the script-aware
    tokenizer — single CJK characters participate as first-class terms
    (character-unigram TF-IDF, the standard segmentation-free CJK
    weighting). Same explode → tf/df → ln(N/df) → window-top-k shape
    as text_tfidf_top_terms."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.translate(
        F.substring(F.col("text"), 1, 120), "aeiou", "深度学习模"
    )
    tk = d.select(
        "doc_id", F.explode(tokens_unicode(mixed)).alias("term")
    )
    tf = tk.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfr = tk.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    # idf precomputed on the TERM-sized frame (the tfidf_top_terms
    # recipe, VERDICT r12 #7) — bit-identical double, one fewer
    # div+log per corpus (doc, term) row
    idf = dfr.crossJoin(F.broadcast(nd)).select(
        "term", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    scored = tf.join(idf, "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 30))
        .select("doc_id", "term", "tfidf", "rn")
    )


# SHJ A/B switch for the nb-classify slp join (see site comment)
_NB_SLP_SHJ = True


@query(
    "text_nb_classify",
    bench2=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(string_split({SQL_NORM}, ' ')) AS t
  FROM documents
),
cnt AS (SELECT lang, t, count(*) AS c FROM tok GROUP BY lang, t),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tc FROM cnt GROUP BY lang),
vocab AS (SELECT count(DISTINCT t) AS v FROM tok),
prior AS (
  SELECT lang, count(*) AS nd,
         CAST(sum(count(*)) OVER () AS BIGINT) AS ndt
  FROM documents GROUP BY lang
),
pairs AS (
  SELECT k.doc_id, k.actual_lang, p.lang,
         CAST(round(ln(CAST(p.nd AS DOUBLE) / p.ndt), 6)
              AS DECIMAL(28,6)) AS prior_lp,
         p.lang AS plang
  FROM (SELECT DISTINCT doc_id, lang AS actual_lang FROM tok) k
  CROSS JOIN prior p
),
terms AS (
  SELECT tk.doc_id, p.lang,
         CAST(round(ln((COALESCE(c.c, 0) + 1.0) / (tot.tc + vocab.v)), 6)
              AS DECIMAL(28,6)) AS lp
  FROM tok tk
  CROSS JOIN (SELECT lang FROM tot) p
  LEFT JOIN cnt c ON c.lang = p.lang AND c.t = tk.t
  JOIN tot ON tot.lang = p.lang
  CROSS JOIN vocab
),
scored AS (
  SELECT pr.doc_id, pr.actual_lang, pr.lang,
         pr.prior_lp + COALESCE(s.slp, CAST(0 AS DECIMAL(28,6))) AS score
  FROM pairs pr
  LEFT JOIN (SELECT doc_id, lang, sum(lp) AS slp
             FROM terms GROUP BY doc_id, lang) s
    ON s.doc_id = pr.doc_id AND s.lang = pr.lang
),
pred AS (
  SELECT doc_id, actual_lang,
         min({{'ns': -score, 'lang': lang}}) AS best
  FROM scored GROUP BY doc_id, actual_lang
)
SELECT actual_lang, best.lang AS pred_lang, count(*) AS n_docs
FROM pred GROUP BY actual_lang, best.lang
""",
    tags=("X3", "classifier", "naive-bayes"),
)
def text_nb_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED text classifier in one declarative DAG — multinomial
    Naive Bayes with add-1 smoothing, self-trained on the corpus's
    lang labels and scored back over it (the fastText-classifier slot
    of a pretraining pipeline: lang-ID / quality gating). Everything
    is count aggregation + joins + argmax; training is NOT iterative,
    so the full pipeline carries an exact SQL oracle.

    Cross-engine float policy: each token's log-likelihood is rounded
    to 6 dp and cast DECIMAL(28,6) BEFORE summation, so per-doc scores
    are EXACT decimal sums (order-independent across partitions and
    engines — a raw double sum would be neither); argmax ties break to
    the lexicographically first lang via struct-min.

    Scale shape: the model (lang × token counts + totals + vocab) is
    dimension-sized — broadcast; the scoring join is corpus-tokens ×
    L langs map-side, then ONE (doc, lang) aggregation and ONE doc
    argmax. The corpus is never shuffled by token."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("lang", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").cast("long").alias("tc"))
    vocab = tok.agg(F.countDistinct("t").alias("v"))
    prior = d.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    ndt = d.agg(F.count(F.lit(1)).alias("ndt"))

    dec6 = "decimal(28,6)"
    # r12 (guide §1.2 "per-task work"): the token log-likelihood
    # round(log((c+1)/(tc+v))) depends only on the MODEL-sized
    # (lang, term) pair — precompute it on the model frames (hit side
    # per (lang, term), miss side one constant per lang) so the
    # corpus-tokens x L scoring pass does a pure coalesce of two
    # joined decimals instead of a log+round+decimal-cast per row
    # (interleaved A/B at sf0.1: 3.4-4.0 s -> 2.9-3.0 s warm,
    # 11.9 -> 3.8 s cold; identical output row set).
    mod = cnt.join(tot, "lang").crossJoin(vocab)
    cnt2 = mod.select(
        F.col("lang").alias("clang"),
        F.col("t").alias("ct"),
        F.round(
            F.log((F.col("c") + F.lit(1.0)) / (F.col("tc") + F.col("v"))), 6
        )
        .cast(dec6)
        .alias("lp"),
    )
    miss = tot.crossJoin(vocab).select(
        F.col("lang").alias("plang"),
        F.round(F.log(F.lit(1.0) / (F.col("tc") + F.col("v"))), 6)
        .cast(dec6)
        .alias("miss_lp"),
    )
    terms = (
        tok.crossJoin(F.broadcast(miss))
        .join(
            F.broadcast(cnt2),
            (F.col("plang") == F.col("clang")) & (F.col("t") == F.col("ct")),
            "left",
        )
        .select(
            "doc_id",
            "plang",
            F.coalesce(F.col("lp"), F.col("miss_lp")).alias("lp"),
        )
    )
    slp = terms.groupBy("doc_id", "plang").agg(F.sum("lp").alias("slp"))
    # r13 (same recipe, VERDICT r12 #7): the prior log-probability
    # round(log(nd/ndt)) depends only on the LANG-sized prior frame —
    # precompute it there instead of once per (doc x lang) row
    prior_lp = prior.crossJoin(F.broadcast(ndt)).select(
        F.col("lang").alias("plang"),
        F.round(F.log(F.col("nd").cast("double") / F.col("ndt")), 6)
        .cast(dec6)
        .alias("prior_lp"),
    )
    pairs = (
        d.select("doc_id", F.col("lang").alias("actual_lang"))
        .crossJoin(F.broadcast(prior_lp))
        .select("doc_id", "actual_lang", "plang", "prior_lp")
    )
    # slp join as SHUFFLED HASH (r13, guide §3.1): both sides are
    # (doc x lang)-sized so neither broadcasts, and the default
    # SortMergeJoin pays two corpus-sized sorts the hash build
    # doesn't; LeftOuter BuildRight is SHJ-eligible. (_NB_SLP_SHJ is
    # the interleaved-A/B switch; ships at the measured winner.)
    slp_side = slp.hint("shuffle_hash") if _NB_SLP_SHJ else slp
    scored = pairs.join(
        slp_side, ["doc_id", "plang"], "left"
    ).select(
        "doc_id",
        "actual_lang",
        "plang",
        (F.col("prior_lp") + F.coalesce(F.col("slp"), F.lit(0).cast(dec6))).alias(
            "score"
        ),
    )
    pred = scored.groupBy("doc_id", "actual_lang").agg(
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("plang").alias("lang"))).alias(
            "best"
        )
    )
    return pred.groupBy(
        "actual_lang", F.col("best.lang").alias("pred_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "text_unigram_ppl_buckets",
    bench2=True,
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split({SQL_NORM}, ' ')) AS t
  FROM documents
),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS tc, count(*) AS v FROM cnt),
nll AS (
  SELECT tk.doc_id, tk.lang,
         CAST(sum(CAST(round(-ln((c.c + 1.0) / (tot.tc + tot.v)), 6)
                       AS DECIMAL(28,6))) AS DOUBLE)
         / count(*) AS doc_nll
  FROM tok tk JOIN cnt c ON c.t = tk.t CROSS JOIN tot
  GROUP BY tk.doc_id, tk.lang
)
SELECT lang,
       CAST(floor(doc_nll * 2) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       min(round(doc_nll, 6)) AS min_nll,
       max(round(doc_nll, 6)) AS max_nll
FROM nll GROUP BY lang, bucket
""",
    tags=("X3", "quality", "perplexity"),
)
def text_unigram_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter (the CCNet idiom: score docs
    under a corpus LM, bucket, keep the low-perplexity tail) with a
    self-trained add-1-smoothed UNIGRAM LM — training is one count
    aggregation, so unlike a neural LM the whole filter carries an
    exact SQL oracle. Per-token negative log-likelihoods are rounded
    and summed as exact decimals (engine/order-independent; the
    text_nb_classify policy), then averaged per doc and histogrammed
    into 0.5-nat buckets per lang.

    Scale shape: the LM (token→count + one totals row) broadcasts;
    scoring is a map-side join over corpus tokens; ONE doc aggregation
    and ONE (lang, bucket) aggregation. Every doc token exists in the
    self-trained vocab, so the join is inner without loss (unseen
    tokens would take the +1 smoothing mass in a train/test split)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(
        F.sum("c").cast("long").alias("tc"), F.count(F.lit(1)).alias("v")
    )
    # r12: the per-token NLL depends only on the MODEL-sized (term,
    # totals) pair — precompute it on the broadcast LM frame so the
    # corpus scoring pass sums a joined decimal instead of running
    # log+round+cast per token (the text_nb_classify recipe)
    cnt2 = cnt.crossJoin(tot).select(
        F.col("t").alias("ct"),
        F.round(
            -F.log((F.col("c") + F.lit(1.0)) / (F.col("tc") + F.col("v"))), 6
        )
        .cast("decimal(28,6)")
        .alias("nll_t"),
    )
    nll = (
        tok.join(F.broadcast(cnt2), F.col("t") == F.col("ct"))
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum("nll_t").cast("double") / F.count(F.lit(1))
            ).alias("doc_nll")
        )
    )
    return nll.groupBy(
        "lang", F.floor(F.col("doc_nll") * 2).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.round("doc_nll", 6)).alias("min_nll"),
        F.max(F.round("doc_nll", 6)).alias("max_nll"),
    )


@query(
    "q_bpe_first_merges",
    oracle=f"""
WITH w AS (
  SELECT unnest(string_split({SQL_NORM}, ' ')) AS w FROM documents
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(w)), i -> substring(w, i, 2)))
           AS pair
  FROM w WHERE len(w) >= 2
),
c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair),
r AS (
  SELECT pair, n,
         row_number() OVER (ORDER BY n DESC, pair) AS rn
  FROM c
)
SELECT pair, n, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 20
""",
    tags=("X3", "tokenizer", "bpe"),
)
def q_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer induction, round one: the first BPE merge decisions —
    corpus-frequency counts of adjacent character pairs within words
    (occurrence-weighted, exactly what the first iteration of
    byte-pair encoding training ranks). Top-20 by count with
    lexicographic tie-break. The full BPE loop is sequential by
    nature (each merge changes the next round's pair stream); the
    per-round counting shown here is the distributed part — a
    production trainer alternates this map/agg pass with a
    driver-side merge-table update of vocabulary size, not corpus
    size. One explode + one aggregation; the window top-k rides
    Catalyst's WindowGroupLimit pushdown."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(F.explode(tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    c = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    win = W.orderBy(F.col("n").desc(), F.col("pair"))
    return (
        c.select(
            "pair", "n", F.row_number().over(win).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= 20)
    )


@query(
    "text_hashing_tf",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split({SQL_NORM}, ' ')) AS t
  FROM documents WHERE doc_id < 50
),
b AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(t), 1, 15)) AS BIGINT) % 64 AS bucket
  FROM tok
),
tf AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY doc_id, bucket)
SELECT doc_id,
       count(*) AS nnz,
       CAST(sum(c) AS BIGINT) AS l1,
       round(sqrt(CAST(sum(c * c) AS DOUBLE)), 6) AS l2_norm,
       min({{'nc': -c, 'b': bucket}}).b AS top_bucket
FROM tf GROUP BY doc_id
""",
    tags=("X3", "X2", "vectorizer", "hashing-tf"),
)
def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FEATURE-HASHING vectorizer (the HashingTF idiom, DataFrame-
    native): each doc becomes a DENSE 64-dim term-frequency vector —
    token -> deterministic 60-bit hash -> bucket = hash % 64, counts
    assembled into a positional array via map_from_entries + a
    sequence transform. This is the text -> embedding bridge that
    feeds the similarity/dedup stack without an external model: the
    output vectors drop straight into brute_force_topk / IVF / PQ.

    The declared stats (nnz, L1, L2, argmax bucket) are derived FROM
    the materialized array — not recomputed from the token stream —
    so the oracle (which re-derives them relationally) hash-verifies
    the vector assembly itself. Scale: one token explode, one
    (doc, bucket) agg, one per-doc map build; no UDFs, everything in
    whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    tf = (
        tok.select("doc_id", (token_int(F.col("t")) % 64).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vec = tf.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "c"))).alias("m")
    ).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i.cast("long")), F.lit(0)),
        ).alias("v"),
    )
    v = F.col("v")
    entries = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: F.struct(
            (-F.element_at(v, (i + 1).cast("int"))).alias("nc"), i.alias("b")
        ),
    )
    return vec.select(
        "doc_id",
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("nnz"),
        F.aggregate(v, F.lit(0).cast("long"), lambda a, x: a + x).alias("l1"),
        F.round(
            F.sqrt(
                F.aggregate(
                    v, F.lit(0).cast("long"), lambda a, x: a + x * x
                ).cast("double")
            ),
            6,
        ).alias("l2_norm"),
        F.array_min(entries).getField("b").cast("long").alias("top_bucket"),
    )


@query(
    "text_bigram_surprisal",
    oracle=f"""
WITH tokp AS (
  SELECT doc_id, lang, CAST(p.p AS BIGINT) AS pos, tk[p.p] AS t
  FROM (SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS tk
        FROM documents),
       unnest(generate_series(1, len(tk))) AS p(p)
),
uni AS (SELECT t, count(*) AS c FROM tokp GROUP BY t),
utot AS (SELECT CAST(sum(c) AS BIGINT) AS tc, count(*) AS v FROM uni),
bi AS (
  SELECT a.t AS t1, b.t AS t2, count(*) AS c
  FROM tokp a JOIN tokp b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.t, b.t
),
scored AS (
  SELECT b.doc_id, b.lang,
         CAST(round(-ln((COALESCE(bg.c, 0) + 1.0)
                        / (uni.c + utot.v)), 6) AS DECIMAL(28,6)) AS s
  FROM tokp b
  JOIN tokp a ON a.doc_id = b.doc_id AND a.pos = b.pos - 1
  LEFT JOIN bi bg ON bg.t1 = a.t AND bg.t2 = b.t
  JOIN uni ON uni.t = a.t
  CROSS JOIN utot
),
per_doc AS (
  SELECT doc_id, lang,
         CAST(sum(s) AS DOUBLE) / count(*) AS surprisal
  FROM scored GROUP BY doc_id, lang
)
SELECT lang,
       CAST(floor(surprisal * 2) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       min(round(surprisal, 6)) AS min_s,
       max(round(surprisal, 6)) AS max_s
FROM per_doc GROUP BY lang, bucket
""",
    tags=("X3", "quality", "lm", "bigram"),
)
def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BIGRAM-LM surprisal — the context-aware upgrade of
    text_unigram_ppl_buckets: each token's conditional negative
    log-likelihood -ln P(t|prev) with add-1 smoothing over the
    follower vocabulary (count(prev,t)+1)/(count(prev)+V), averaged
    per doc and bucketed per lang. Token ADJACENCY derives map-side
    from the token array (an in-row transform over sequence ordinals
    — no positional self-join; tokp feeds only the unigram model so
    counts stay bit-identical), and the same rounded-decimal
    summation policy keeps a context-conditioned LM exact-hash
    verifiable. Gibberish with plausible unigrams but
    broken word ORDER scores high here while passing the unigram
    filter — the reason real pipelines run both."""
    d = load_table(spark, sf_dir, "documents")
    tokp = d.select(
        "doc_id",
        "lang",
        F.posexplode(tokens(F.col("text"))).alias("pos0", "t"),
    ).select("doc_id", "lang", (F.col("pos0") + 1).alias("pos"), "t")
    uni = tokp.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    utot = uni.agg(
        F.sum("c").cast("long").alias("tc"), F.count(F.lit(1)).alias("v")
    )
    # r12: token ADJACENCY map-side from the token array (the
    # text_kn_bigram_ppl_buckets shape) instead of TWO positional
    # self-joins of the full token stream — the bigram counts and the
    # scoring pairs were each a corpus-sized shuffle join; now both
    # derive from one in-row transform. (tokp stays the source of the
    # unigram model so counts are bit-identical.)
    base = d.select(
        "doc_id", "lang", tokens(F.col("text")).alias("tks")
    ).filter(F.size("tks") >= 2)
    pairs = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tks)-2),"
                " i -> struct(tks[i] as t1, tks[i+1] as t2))"
            )
        ).alias("u"),
    ).select("doc_id", "lang", "u.t1", "u.t2")
    bi = pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c"))
    uni1 = uni.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    # per-bigram NLL precomputed on the MODEL frames (hit side per
    # (t1, t2), miss side one constant per t1 — the text_nb_classify
    # recipe): the corpus pair stream coalesces two joined decimals
    hit = (
        bi.join(uni1, "t1")
        .crossJoin(utot)
        .select(
            F.col("t1").alias("bt1"),
            F.col("t2").alias("bt2"),
            F.round(
                -F.log((F.col("c") + F.lit(1.0)) / (F.col("c1") + F.col("v"))),
                6,
            )
            .cast("decimal(28,6)")
            .alias("s_hit"),
        )
    )
    miss = uni1.crossJoin(utot).select(
        "t1",
        F.round(-F.log(F.lit(1.0) / (F.col("c1") + F.col("v"))), 6)
        .cast("decimal(28,6)")
        .alias("s_miss"),
    )
    scored = (
        pairs.join(
            F.broadcast(hit),
            (F.col("t1") == F.col("bt1")) & (F.col("t2") == F.col("bt2")),
            "left",
        )
        .join(F.broadcast(miss), "t1")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("s_hit"), F.col("s_miss")).alias("s"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        (F.sum("s").cast("double") / F.count(F.lit(1))).alias("surprisal")
    )
    return per_doc.groupBy(
        "lang", F.floor(F.col("surprisal") * 2).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.round("surprisal", 6)).alias("min_s"),
        F.max(F.round("surprisal", 6)).alias("max_s"),
    )


@query(
    "text_source_js_divergence",
    oracle=f"""
WITH tok AS (
  SELECT source, unnest(string_split({SQL_NORM}, ' ')) AS t
  FROM documents
),
cnt AS (SELECT source, t, count(*) AS c FROM tok GROUP BY source, t),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS tc FROM cnt GROUP BY source),
p AS (
  SELECT cnt.source, cnt.t, CAST(cnt.c AS DOUBLE) / tot.tc AS p
  FROM cnt JOIN tot ON cnt.source = tot.source
),
j AS (
  SELECT a.source AS s1, b.source AS s2,
         CAST(sum(CAST(round(a.p * ln(2 * a.p / (a.p + b.p)), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sa,
         CAST(sum(CAST(round(b.p * ln(2 * b.p / (a.p + b.p)), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS sb,
         CAST(sum(CAST(round(a.p, 9) AS DECIMAL(28,9))) AS DOUBLE) AS pc_a,
         CAST(sum(CAST(round(b.p, 9) AS DECIMAL(28,9))) AS DOUBLE) AS pc_b,
         count(*) AS n_common
  FROM p a JOIN p b ON a.t = b.t AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT s1, s2, n_common,
       round(0.5 * (sa + (1 - pc_a) * ln(2))
             + 0.5 * (sb + (1 - pc_b) * ln(2)), 6) AS jsd
FROM j
""",
    tags=("X3", "drift", "divergence"),
)
def text_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JENSEN-SHANNON DIVERGENCE between every pair of source token
    distributions — the corpus-drift diagnostic behind mixture
    decisions (a source whose distribution diverges is a different
    domain; JSD is symmetric and bounded by ln 2). Decomposition keeps
    it one equi-join on token: common-token terms p·ln(2p/(p+q))
    summed decimal-exact, and each side's EXCLUSIVE probability mass
    (1 - common mass) contributes ln 2 exactly — no outer join, no
    null-handling in the log. Pair space = sources², vocabulary join
    uniformly keyed."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(F.sum("c").cast("long").alias("tc"))
    p = cnt.join(tot, "source").select(
        "source", "t", (F.col("c").cast("double") / F.col("tc")).alias("p")
    )
    a = p.select(
        F.col("source").alias("s1"), F.col("t"), F.col("p").alias("pa")
    )
    b = p.select(
        F.col("source").alias("s2"), F.col("t").alias("tb"), F.col("p").alias("pb")
    )
    j = (
        a.join(b, (F.col("t") == F.col("tb")) & (F.col("s1") < F.col("s2")))
        .groupBy("s1", "s2")
        .agg(
            F.sum(
                F.round(
                    F.col("pa") * F.log(2 * F.col("pa") / (F.col("pa") + F.col("pb"))),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("sa"),
            F.sum(
                F.round(
                    F.col("pb") * F.log(2 * F.col("pb") / (F.col("pa") + F.col("pb"))),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("sb"),
            F.sum(F.round("pa", 9).cast("decimal(28,9)")).cast("double").alias("pc_a"),
            F.sum(F.round("pb", 9).cast("decimal(28,9)")).cast("double").alias("pc_b"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    ln2 = float(__import__("math").log(2.0))
    return j.select(
        "s1",
        "s2",
        "n_common",
        F.round(
            0.5 * (F.col("sa") + (1 - F.col("pc_a")) * F.lit(ln2))
            + 0.5 * (F.col("sb") + (1 - F.col("pc_b")) * F.lit(ln2)),
            6,
        ).alias("jsd"),
    )


@query(
    "text_zipf_fit",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split({SQL_NORM}, ' ')) AS t FROM documents
),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
r AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rank
  FROM cnt
),
xy AS (
  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
         CAST(round(ln(CAST(rank AS DOUBLE))
                    * ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xx,
         CAST(round(ln(CAST(rank AS DOUBLE))
                    * ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xy
  FROM r
),
s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(xx) AS DOUBLE) AS sxx, CAST(sum(xy) AS DOUBLE) AS sxy
  FROM xy
)
SELECT CAST(n AS BIGINT) AS vocab_size,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS intercept
FROM s
""",
    tags=("X3", "profiling", "zipf"),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF'S-LAW FIT — corpus-health diagnostic: least-squares slope
    of log frequency vs log rank over the full vocabulary (natural
    text sits near -1; template spam and synthetic word-soup flatten
    or steepen it). Closed-form regression from five decimal-exact
    moment sums (rounded log terms — the engine-exact policy), one
    global rank window over the vocabulary (vocab-sized, not
    corpus-sized), one tiny fold."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    r = cnt.select(
        "c",
        F.row_number()
        .over(W.orderBy(F.col("c").desc(), F.col("t")))
        .alias("rank"),
    )
    lx = F.log(F.col("rank").cast("double"))
    ly = F.log(F.col("c").cast("double"))
    dec = "decimal(28,9)"
    xy = r.select(
        F.round(lx, 9).cast(dec).alias("x"),
        F.round(ly, 9).cast(dec).alias("y"),
        F.round(lx * lx, 9).cast(dec).alias("xx"),
        F.round(lx * ly, 9).cast(dec).alias("xy"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("vocab_size"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "text_readability",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         len(string_split({SQL_NORM}, ' ')) AS n_words,
         len(regexp_extract_all({SQL_NORM}, '[aeiouy]+')) AS n_syl,
         greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS n_sent
  FROM documents
),
s AS (
  SELECT doc_id, lang, n_words, n_syl, n_sent,
         round(206.835
               - 1.015 * (CAST(n_words AS DOUBLE) / n_sent)
               - 84.6 * (CAST(n_syl AS DOUBLE) / n_words), 4) AS flesch
  FROM t WHERE n_words > 0
)
SELECT lang,
       count(*) AS n_docs,
       CAST(CAST(sum(CAST(flesch AS DECIMAL(18,4))) AS DOUBLE) / count(*)
            AS DOUBLE) AS mean_flesch,
       min(flesch) AS min_flesch,
       max(flesch) AS max_flesch,
       CAST(count(CASE WHEN flesch < 30 THEN 1 END) AS BIGINT)
         AS n_hard_docs
FROM s GROUP BY lang
""",
    tags=("X3", "quality", "readability"),
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH-STYLE READABILITY — the classic complexity score as a
    corpus filter feature: vowel-group counts proxy syllables,
    sentence terminators proxy sentences (floored at 1 for the
    fixture's run-on word soup), the standard 206.835 − 1.015·(w/s)
    − 84.6·(syl/w) formula rounded per doc and aggregated per lang
    with decimal-exact means. All regexp counting — no tokenizer
    beyond the shared normalizer, everything in codegen."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    n_words = F.size(F.split(norm, " "))
    n_syl = F.size(F.regexp_extract_all(norm, F.lit("[aeiouy]+"), 0))
    n_sent = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]"), 0)), F.lit(1)
    )
    flesch = F.round(
        F.lit(206.835)
        - 1.015 * (n_words.cast("double") / n_sent)
        - 84.6 * (n_syl.cast("double") / n_words),
        4,
    )
    s = d.select("lang", flesch.alias("flesch")).filter(n_words > 0)
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.col("flesch").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("double")
        .alias("mean_flesch"),
        F.min("flesch").alias("min_flesch"),
        F.max("flesch").alias("max_flesch"),
        F.count(F.when(F.col("flesch") < 30, 1)).alias("n_hard_docs"),
    )


@query(
    "text_heaps_growth",
    oracle=f"""
WITH n AS (SELECT count(*) AS nd FROM documents),
ft AS (
  SELECT t, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(string_split({SQL_NORM}, ' ')) AS t
        FROM documents)
  GROUP BY t
),
cks AS (
  SELECT k.k, CAST(ceil(n.nd * k.k / 10.0) AS BIGINT) AS n_docs
  FROM (SELECT unnest(range(1, 11)) AS k) k CROSS JOIN n
),
v AS (
  SELECT c.k, c.n_docs,
         CAST(count(CASE WHEN ft.first_doc < c.n_docs THEN 1 END) AS BIGINT)
           AS vocab
  FROM cks c CROSS JOIN ft
  GROUP BY c.k, c.n_docs
),
xy AS (
  SELECT CAST(round(ln(CAST(n_docs AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
         CAST(round(ln(CAST(vocab AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y,
         CAST(round(ln(CAST(n_docs AS DOUBLE))
                    * ln(CAST(n_docs AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xx,
         CAST(round(ln(CAST(n_docs AS DOUBLE))
                    * ln(CAST(vocab AS DOUBLE)), 9) AS DECIMAL(28,9)) AS xy
  FROM v
),
fit AS (
  SELECT count(*) AS np,
         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
         CAST(sum(xx) AS DOUBLE) AS sxx, CAST(sum(xy) AS DOUBLE) AS sxy
  FROM xy
)
SELECT v.k AS checkpoint, v.n_docs, v.vocab,
       round((fit.np * fit.sxy - fit.sx * fit.sy)
             / (fit.np * fit.sxx - fit.sx * fit.sx), 6) AS heaps_beta
FROM v CROSS JOIN fit
""",
    tags=("X3", "profiling", "heaps"),
)
def text_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HEAPS'-LAW VOCABULARY GROWTH — how the distinct-token count
    scales with corpus size (V ≈ K·n^β, natural text β ≈ 0.4-0.6):
    computed in ONE corpus pass via each token's FIRST document
    (min doc_id), bucketed against ten data-derived checkpoints, with
    the growth exponent from the closed-form log-log fit attached to
    every row. Deduplicated or template-heavy corpora bend this curve
    — it's the capacity-planning number for vocabulary-dependent
    stages (tokenizer training, hash sizing). Scale: the first-doc
    table is vocab-sized; checkpoints are 10 rows broadcast."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("nd"))
    ft = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    cks = (
        spark.range(1, 11)
        .select(F.col("id").alias("k"))
        .crossJoin(F.broadcast(n))
        .select(
            "k",
            F.ceil(F.col("nd") * F.col("k") / 10.0).cast("long").alias("n_docs"),
        )
    )
    v = (
        cks.crossJoin(ft)
        .groupBy("k", "n_docs")
        .agg(
            F.count(F.when(F.col("first_doc") < F.col("n_docs"), 1))
            .cast("long")
            .alias("vocab")
        )
    )
    lx = F.log(F.col("n_docs").cast("double"))
    ly = F.log(F.col("vocab").cast("double"))
    dec = "decimal(28,9)"
    xy = v.select(
        F.round(lx, 9).cast(dec).alias("x"),
        F.round(ly, 9).cast(dec).alias("y"),
        F.round(lx * lx, 9).cast(dec).alias("xx"),
        F.round(lx * ly, 9).cast(dec).alias("xy"),
    )
    fit = xy.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum("xx").cast("double").alias("sxx"),
        F.sum("xy").cast("double").alias("sxy"),
    )
    beta = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return v.crossJoin(F.broadcast(fit)).select(
        F.col("k").alias("checkpoint"),
        "n_docs",
        "vocab",
        F.round(beta, 6).alias("heaps_beta"),
    )


from cdc_via_flink_spark.operators.winnow import (  # noqa: E402
    WINNOW_FP_CAP as _WINNOW_FP_CAP,
    WINNOW_K as _WINNOW_K,
    WINNOW_MIN_SHARED as _WINNOW_MIN_SHARED,
    WINNOW_W as _WINNOW_W,
    winnow_selected as _winnow_selected_op,
)


def _winnow_selected(d, *extra_cols):
    """Back-compat shim over operators.winnow.winnow_selected (the
    operator home since the index/incremental surfaces landed)."""
    return _winnow_selected_op(d, "text", "doc_id", tuple(extra_cols))


@query(
    "text_winnow_fingerprints",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, lang, i AS pos,
         {SQL_TOKEN_INT.format(col=f"array_to_string(tk[i:i+{_WINNOW_K - 1}], ' ')")}
           % 1000000007 AS h
  FROM tok, unnest(range(1, greatest(len(tk) - {_WINNOW_K - 1}, 1) + 1)) AS t(i)
),
sel AS (
  SELECT DISTINCT doc_id, lang,
         min(h * 1024 + (1023 - pos % 1024))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS se
  FROM grams
),
fp AS (SELECT doc_id, lang, se // 1024 AS fh FROM sel),
shared AS (
  SELECT fh FROM fp GROUP BY fh HAVING count(DISTINCT doc_id) >= 2
)
SELECT f.lang, count(DISTINCT f.doc_id) AS n_docs,
       count(*) AS n_fps,
       count(DISTINCT f.fh) AS n_distinct_fps,
       count(DISTINCT CASE WHEN s.fh IS NOT NULL THEN f.doc_id END)
         AS docs_with_shared
FROM fp f LEFT JOIN shared s ON f.fh = s.fh
GROUP BY f.lang
""",
    tags=("X3", "X1", "fingerprint", "winnowing"),
)
def text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING local fingerprints (Schleimer/Wilkerson/Aiken 2003 —
    the MOSS algorithm; the local-fingerprinting scheme the whole-doc
    digest and k-gram Jaccard queries can't replace: it detects
    PARTIAL overlap with a guaranteed-density sketch). Per document:
    word {_WINNOW_K}-gram hashes with positions; every window of
    {_WINNOW_W} consecutive grams selects its MINIMUM hash (rightmost
    position on ties — encoded as h*1024 + (1023 - pos%1024) so one
    integer min does hash-then-rightmost ordering; the pos%1024
    tie-break aliases only beyond 1024-gram documents, where a
    deployment widens the encoding); the distinct selected
    fingerprints are the document's sketch, guaranteed to include at
    least one fingerprint from every {_WINNOW_W + _WINNOW_K - 1}-word
    stretch. Declared output: per language, docs / selected
    fingerprints / distinct fingerprint values / docs sharing at
    least one fingerprint with another doc (the plagiarism-candidate
    set).

    Scale shape: the ENTIRE selection is map-side higher-order
    expressions over the token array (_winnow_selected — winnowing is
    document-local, so no gram row ever shuffles by doc_id; the
    oracle's windowed-SQL formulation is the semantic twin, not the
    plan); only the ~2/(W+1)-dense selected fingerprints become rows,
    and the cross-doc sharing check joins on uniform fingerprint
    hashes reduced to distinct values first. Tail windows
    (< {_WINNOW_W} grams remaining) select suffix minima —
    deterministic and engine-identical, slightly denser than the
    paper's full-window form at document tails."""
    d = load_table(spark, sf_dir, "documents")
    sel = _winnow_selected(d, "lang")
    fp = sel.select("doc_id", "lang", F.expr("se DIV 1024").alias("fh"))
    shared = (
        fp.groupBy("fh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("fh", F.lit(1).alias("is_shared"))
    )
    return (
        fp.join(shared, "fh", "left")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_fps"),
            F.countDistinct("fh").alias("n_distinct_fps"),
            F.countDistinct(
                F.when(F.col("is_shared").isNotNull(), F.col("doc_id"))
            ).alias("docs_with_shared"),
        )
    )


@query(
    "text_winnow_pairs",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         {SQL_TOKEN_INT.format(col=f"array_to_string(tk[i:i+{_WINNOW_K - 1}], ' ')")}
           % 1000000007 AS h
  FROM tok, unnest(range(1, greatest(len(tk) - {_WINNOW_K - 1}, 1) + 1)) AS t(i)
),
sel AS (
  SELECT DISTINCT doc_id,
         min(h * 1024 + (1023 - pos % 1024))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS se
  FROM grams
),
fp AS (SELECT DISTINCT doc_id, se // 1024 AS fh FROM sel),
keep AS (
  SELECT fh FROM fp GROUP BY fh
  HAVING count(*) BETWEEN 2 AND {_WINNOW_FP_CAP}
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
  FROM fp a JOIN keep k ON a.fh = k.fh
            JOIN fp b ON a.fh = b.fh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared_fps FROM pairs
WHERE shared_fps >= {_WINNOW_MIN_SHARED}
""",
    tags=("X3", "X1", "fingerprint", "winnowing", "pairs"),
)
def text_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing PAIR detection — the MOSS output surface on top of
    text_winnow_fingerprints' sketch: document pairs sharing >=
    {_WINNOW_MIN_SHARED} selected fingerprints (each a localized
    {_WINNOW_K}-word match the density guarantee places within any
    {_WINNOW_W + _WINNOW_K - 1}-word overlap), ranked by the caller
    via shared_fps. Fingerprints shared by more than
    {_WINNOW_FP_CAP} documents are dropped BEFORE the pair join (the
    standard over-common-fingerprint cut: a boilerplate gram shared
    by thousands of docs is uninformative for overlap AND would land
    a quadratic bucket on the join — the cut bounds per-fingerprint
    pair work at C({_WINNOW_FP_CAP},2), the same per-task-bound
    philosophy as banding.BUCKET_CAP). Both sides of the pair join
    reduce to DISTINCT (doc, fingerprint) rows first; selection is
    the shuffle-free map-side _winnow_selected (see
    text_winnow_fingerprints' scale note)."""
    d = load_table(spark, sf_dir, "documents")
    fp = (
        _winnow_selected(d)
        .select("doc_id", F.expr("se DIV 1024").alias("fh"))
        .distinct()
    )
    keep = (
        fp.groupBy("fh")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= _WINNOW_FP_CAP))
        .select("fh")
    )
    pruned = fp.join(keep, "fh", "left_semi")
    a = pruned.select(F.col("doc_id").alias("id_a"), "fh")
    b = pruned.select(F.col("doc_id").alias("id_b"), "fh")
    return (
        a.join(b, ["fh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= _WINNOW_MIN_SHARED)
    )


@query(
    "text_winnow_incremental",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
),
grams AS (
  SELECT doc_id, i AS pos,
         {SQL_TOKEN_INT.format(col=f"array_to_string(tk[i:i+{_WINNOW_K - 1}], ' ')")}
           % 1000000007 AS h
  FROM tok, unnest(range(1, greatest(len(tk) - {_WINNOW_K - 1}, 1) + 1)) AS t(i)
),
sel AS (
  SELECT DISTINCT doc_id,
         min(h * 1024 + (1023 - pos % 1024))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING) AS se
  FROM grams
),
fp AS (SELECT DISTINCT doc_id, se // 1024 AS fh FROM sel),
keep AS (
  SELECT fh FROM fp GROUP BY fh
  HAVING count(*) BETWEEN 2 AND {_WINNOW_FP_CAP}
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_fps
  FROM fp a JOIN keep k ON a.fh = k.fh
            JOIN fp b ON a.fh = b.fh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, shared_fps FROM pairs
WHERE shared_fps >= {_WINNOW_MIN_SHARED}
  AND (id_a % 5 = 0 OR id_b % 5 = 0)
""",
    tags=("X3", "X1", "winnowing", "incremental", "index-maintenance"),
)
def text_winnow_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INGEST-TIME overlap gate, value-pinned: build the persisted
    winnowing fingerprint index (operators/winnow.py::
    save_winnow_index — distinct (doc, fh) clustered by fh, per-fh
    doc counts, validated sizing meta) over the corpus MINUS every
    5th document, then run the arriving batch (the held-out fifth)
    through incremental_winnow_pairs. The result must equal the
    MONOLITHIC text_winnow_pairs over the full corpus restricted to
    batch-involving pairs — the oracle computes exactly that, so a
    broken count merge (the common-fingerprint cut is recomputed over
    stored + batch counts), a double-counted new×new/new×old branch,
    or stale index rows all hash-mismatch. Only the batch is
    tokenized; the stored side joins by fh."""
    import os

    from cdc_via_flink_spark.operators.winnow import (
        incremental_winnow_pairs,
        save_winnow_index,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old = d.filter(F.pmod(F.col("doc_id"), 5) != 0)
    new = d.filter(F.pmod(F.col("doc_id"), 5) == 0)
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = f"/root/repo/.tmp/winnow_index_{sf_name}"
    save_winnow_index(old, path)
    return incremental_winnow_pairs(new, path)


# --- Repeated-span detection (Lee et al. 2022 substring dedup) ---

SPAN_N = 8  # tokens per gram; a repeated span is >= SPAN_N tokens

_SQL_SPAN_CORPUS = f"""
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         string_split({SQL_NORM}, ' ')[1:30] AS tk
  FROM documents WHERE doc_id % 10 = 0
"""


@query(
    "text_repeated_spans",
    oracle=f"""
WITH corpus AS ({_SQL_SPAN_CORPUS}),
grams AS (
  SELECT doc_id, CAST(u['pos'] AS BIGINT) AS pos,
         {SQL_TOKEN_INT.format(col="u['g']")} AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk)-{SPAN_N - 1}, 0)+1),
                  i -> {{'pos': i,
                        'g': array_to_string(tk[i:i+{SPAN_N - 1}], ' ')}})) AS u
    FROM corpus
  )
),
rep AS (
  SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN rep r ON g.h = r.h
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {SPAN_N} THEN 1 ELSE 0 END AS newgrp
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
)
SELECT doc_id, min(pos) AS span_start,
       max(pos) + {SPAN_N - 1} AS span_end,
       max(pos) + {SPAN_N - 1} - min(pos) + 1 AS span_tokens,
       count(*) AS n_grams
FROM grp GROUP BY doc_id, g
""",
    tags=("X1", "X3", "dedup", "spans"),
)
def text_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SPAN detection — the bounded-n-gram
    re-expression of Lee et al. 2022's suffix-array substring dedup
    ("Deduplicating Training Data Makes Language Models Better"):
    every repeated substring of >= 8 tokens is a maximal run of
    repeated 8-grams, so (1) explode word-8-grams with
    their token position, (2) keep grams seen in >= 2 distinct docs
    (one groupBy on the gram hash — map-side partial, no pair
    explosion), (3) merge each doc's hit positions into maximal spans
    with a gaps-and-islands window (new island when the gap exceeds
    the gram width). The corpus unions a 30-token prefix copy of every
    10th doc so true cross-doc spans exist at any SF.

    Scale shape: O(total tokens) gram rows, one hash-keyed groupBy,
    one semi-join (the repeated-gram set is tiny in a healthy corpus —
    broadcastable), one window partitioned BY DOC (no global sort).
    Nothing is quadratic in docs or corpus size; contrast the
    suffix-array construction this replaces, which needs a global
    sort of every suffix."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    corpus = d.select("doc_id", tk.alias("tk")).unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.slice(tk, 1, 30).alias("tk"),
        )
    )
    n = F.size(F.col("tk"))
    gram_arr = F.when(
        n >= SPAN_N,
        F.transform(
            F.sequence(F.lit(0), n - SPAN_N),
            lambda i: F.array_join(F.slice(F.col("tk"), i + 1, SPAN_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = corpus.select(
        "doc_id", F.posexplode(gram_arr).alias("p0", "g")
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        token_int(F.col("g")).alias("h"),
    )
    rep = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    ).filter(F.col("nd") >= 2)
    hits = grams.join(rep.select("h"), "h", "left_semi").select("doc_id", "pos")

    w = W.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "newgrp",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + SPAN_N),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grp = flagged.withColumn(
        "g",
        F.sum("newgrp").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return grp.groupBy("doc_id", "g").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (SPAN_N - 1)).alias("span_end"),
        (F.max("pos") + (SPAN_N - 1) - F.min("pos") + 1).alias("span_tokens"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("g")


# --- DSIR-style importance-weighted data selection ---

DSIR_B = 4096  # hashed feature buckets
DSIR_TOP = 50  # selected docs

# unigrams + word-bigrams, hashed into DSIR_B buckets (the bigram list
# degenerates to the single token for 1-token docs, matching
# shingles_from_tokens(k=2))
_SQL_DSIR_FEATS = f"""
  SELECT doc_id, {SQL_TOKEN_INT.format(col="t")} % {DSIR_B} AS b
  FROM (SELECT doc_id, unnest(string_split({SQL_NORM}, ' ')) AS t
        FROM documents)
  UNION ALL
  SELECT doc_id, {SQL_TOKEN_INT.format(col="g")} % {DSIR_B} AS b
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(tk)-1, 1)+1),
                      i -> array_to_string(tk[i:i+1], ' '))) AS g
        FROM (SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk
              FROM documents))
"""


@query(
    "text_dsir_selection",
    oracle=f"""
WITH feats AS ({_SQL_DSIR_FEATS}),
tgt_ids AS (SELECT doc_id FROM documents WHERE lang = 'en'),
cs AS (SELECT b, count(*) AS c_s FROM feats GROUP BY b),
ct AS (SELECT b, count(*) AS c_t FROM feats
       WHERE doc_id IN (SELECT doc_id FROM tgt_ids) GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM feats) AS s_tot,
         (SELECT count(*) FROM feats
          WHERE doc_id IN (SELECT doc_id FROM tgt_ids)) AS t_tot
),
ratio AS (
  SELECT cs.b,
         ln((COALESCE(ct.c_t, 0) + 1.0) * (tot.s_tot + {DSIR_B})
            / ((cs.c_s + 1.0) * (tot.t_tot + {DSIR_B}))) AS r
  FROM cs LEFT JOIN ct ON cs.b = ct.b CROSS JOIN tot
),
docfeat AS (SELECT doc_id, b, count(*) AS cd FROM feats GROUP BY doc_id, b),
score AS (
  SELECT d.doc_id,
         CAST(sum(CAST(round(d.cd * r.r, 9) AS DECIMAL(28,9))) AS DOUBLE)
           AS log_w
  FROM docfeat d JOIN ratio r ON d.b = r.b GROUP BY d.doc_id
)
SELECT s.doc_id, doc.lang, round(s.log_w, 6) AS log_w
FROM score s JOIN documents doc ON s.doc_id = doc.doc_id
ORDER BY round(s.log_w, 6) DESC, s.doc_id
LIMIT {DSIR_TOP}
""",
    tags=("X3", "dsir", "data-selection"),
)
def text_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every pool document by its log importance weight
    under hashed-n-gram (unigram + bigram, 4096 buckets) bag models of
    the TARGET domain (lang = 'en') vs the RAW POOL (all docs);
    select the top-50. log w(x) = sum over the doc's features of
    ln(p_target(b)/p_pool(b)) with add-one smoothing — exactly the
    paper's estimator, with the sampling step made deterministic
    (top-k by weight, doc_id tie-break) so both engines agree.

    Scale shape: feature extraction is O(total tokens) map-side; the
    two model tables are <= 4096 rows each (broadcastable); the doc
    scoring is one equi-join on bucket + a decimal-exact groupBy; the
    final top-k compiles to TakeOrderedAndProject (no global sort
    materialization). Per-term products are rounded to 9 d.p. before
    the exact decimal sum (the js_divergence parity recipe)."""
    from cdc_via_flink_spark.functions.text import shingles_from_tokens

    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", "lang", tokens(F.col("text")).alias("tk"))
    uni = tk.select(
        "doc_id", F.explode(F.col("tk")).alias("f")
    )
    bi = tk.select(
        "doc_id",
        F.explode(shingles_from_tokens(F.col("tk"), 2)).alias("f"),
    )
    feats = uni.unionAll(bi).select(
        "doc_id", (token_int(F.col("f")) % DSIR_B).alias("b")
    )
    tgt = feats.join(
        d.filter(F.col("lang") == "en").select("doc_id"), "doc_id", "left_semi"
    )
    cs = feats.groupBy("b").agg(F.count(F.lit(1)).alias("c_s"))
    ct = tgt.groupBy("b").agg(F.count(F.lit(1)).alias("c_t"))
    tot = feats.agg(F.count(F.lit(1)).alias("s_tot")).crossJoin(
        tgt.agg(F.count(F.lit(1)).alias("t_tot"))
    )
    ratio = (
        cs.join(ct, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.log(
                (F.coalesce(F.col("c_t"), F.lit(0)) + 1.0)
                * (F.col("s_tot") + DSIR_B)
                / ((F.col("c_s") + 1.0) * (F.col("t_tot") + DSIR_B))
            ).alias("r"),
        )
    )
    docfeat = feats.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("cd"))
    score = (
        docfeat.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.round(F.col("cd") * F.col("r"), 9).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("log_w")
        )
    )
    return (
        score.join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", F.round("log_w", 6).alias("log_w"))
        .orderBy(F.col("log_w").desc(), "doc_id")
        .limit(DSIR_TOP)
    )


@query(
    "dedup_onion_clean",
    oracle=f"""
WITH corpus AS ({_SQL_SPAN_CORPUS}),
grams AS (
  SELECT doc_id, CAST(u['pos'] AS BIGINT) AS pos,
         {SQL_TOKEN_INT.format(col="u['g']")} AS h
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk)-{SPAN_N - 1}, 0)+1),
                  i -> {{'pos': i,
                        'g': array_to_string(tk[i:i+{SPAN_N - 1}], ' ')}})) AS u
    FROM corpus
  )
),
rep AS (
  SELECT h FROM grams GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN rep r ON g.h = r.h
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {SPAN_N} THEN 1 ELSE 0 END AS newgrp
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS g
  FROM flagged
),
spans AS (
  SELECT doc_id,
         max(pos) + {SPAN_N - 1} - min(pos) + 1 AS span_tokens
  FROM grp GROUP BY doc_id, g
),
perdoc AS (
  SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS rep_tokens,
         count(*) AS n_spans
  FROM spans GROUP BY doc_id
)
SELECT c.doc_id, CAST(len(c.tk) AS BIGINT) AS n_tokens,
       COALESCE(p.rep_tokens, 0) AS rep_tokens,
       CAST(len(c.tk) AS BIGINT) - COALESCE(p.rep_tokens, 0) AS kept_tokens,
       COALESCE(p.n_spans, 0) AS n_spans,
       round(CAST(COALESCE(p.rep_tokens, 0) AS DOUBLE) / len(c.tk), 6)
         AS rep_frac
FROM corpus c LEFT JOIN perdoc p ON c.doc_id = p.doc_id
""",
    tags=("X1", "X3", "dedup", "spans", "onion"),
)
def dedup_onion_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONION-style repeated-span REMOVAL accounting — what a corpus
    keeps after cutting every cross-doc repeated span found by
    text_repeated_spans: per doc, total tokens, tokens inside repeated
    spans, kept tokens, span count and repeated fraction. This is the
    budget view of Lee et al. substring dedup — the number a 100 TB
    curation run reports per shard before committing the cut. Same
    scale shape as text_repeated_spans (shared pipeline: one gram
    groupBy, one semi-join, doc-partitioned windows) plus one
    doc-grain left join."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    corpus = d.select("doc_id", tk.alias("tk")).unionAll(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.slice(tk, 1, 30).alias("tk"),
        )
    )
    n = F.size(F.col("tk"))
    gram_arr = F.when(
        n >= SPAN_N,
        F.transform(
            F.sequence(F.lit(0), n - SPAN_N),
            lambda i: F.array_join(F.slice(F.col("tk"), i + 1, SPAN_N), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = corpus.select(
        "doc_id", F.posexplode(gram_arr).alias("p0", "g")
    ).select(
        "doc_id",
        (F.col("p0") + 1).cast("long").alias("pos"),
        token_int(F.col("g")).alias("h"),
    )
    rep = grams.groupBy("h").agg(
        F.count_distinct("doc_id").alias("nd")
    ).filter(F.col("nd") >= 2)
    hits = grams.join(rep.select("h"), "h", "left_semi").select("doc_id", "pos")
    w = W.partitionBy("doc_id").orderBy("pos")
    flagged = hits.withColumn(
        "newgrp",
        F.when(
            F.lag("pos").over(w).isNull()
            | (F.col("pos") > F.lag("pos").over(w) + SPAN_N),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grp = flagged.withColumn(
        "g",
        F.sum("newgrp").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    spans = grp.groupBy("doc_id", "g").agg(
        (F.max("pos") + (SPAN_N - 1) - F.min("pos") + 1).alias("span_tokens")
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.sum("span_tokens").cast("long").alias("rep_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    return (
        corpus.select("doc_id", n.cast("long").alias("n_tokens"))
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("rep_tokens", F.lit(0).cast("long")).alias("rep_tokens"),
            (
                F.col("n_tokens")
                - F.coalesce("rep_tokens", F.lit(0).cast("long"))
            ).alias("kept_tokens"),
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.round(
                F.coalesce("rep_tokens", F.lit(0).cast("long")).cast("double")
                / F.col("n_tokens"),
                6,
            ).alias("rep_frac"),
        )
    )


# --- BM25 keyword retrieval ---

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "join", "window")  # literal query (static oracle)
BM25_TOP = 20


def _bm25_scored_topk(tf, df, dl, stats):
    """Shared BM25 scoring tail (in-memory and persisted-index faces
    are value-identical and share one oracle): Lucene idf, k1/b
    saturation, 9-dp per-term rounds into the exact decimal sum,
    TakeOrderedAndProject top-k."""
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * (
                    (F.col("tf") * F.lit(BM25_K1 + 1.0))
                    / (
                        F.col("tf")
                        + F.lit(BM25_K1)
                        * (
                            F.lit(1.0 - BM25_B)
                            + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
                        )
                    )
                ),
                9,
            ).alias("st"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("st").cast("decimal(28,9)")).cast("double"), 6
        ).alias("score")
    )
    return agg.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOP)


@query(
    "text_bm25_topk",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS t FROM documents
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
terms AS (SELECT unnest(['spark', 'join', 'window']) AS term),
tf AS (
  SELECT x.doc_id, x.term, count(*) AS tf FROM (
    SELECT doc_id, unnest(t) AS term FROM tk
  ) x JOIN terms q ON x.term = q.term
  GROUP BY x.doc_id, x.term
),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
               * ((tf.tf * {BM25_K1 + 1.0}) /
                  (tf.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (d.dl / s.avgdl)))),
               9) AS st
  FROM tf JOIN df ON tf.term = df.term
  JOIN dl d ON tf.doc_id = d.doc_id
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(CAST(sum(CAST(st AS DECIMAL(28,9))) AS DOUBLE), 6) AS score
  FROM scored GROUP BY doc_id
)
SELECT doc_id, score FROM agg
ORDER BY score DESC, doc_id LIMIT {BM25_TOP}
""",
    tags=("X3", "bm25", "retrieval"),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval (Robertson–Spärck Jones; the scorer
    every large-corpus curation stack uses for keyword screens and
    contamination lookups): top-20 documents for the literal query
    {spark, join, window}, k1=1.2, b=0.75, Lucene idf
    ln(1 + (N−df+0.5)/(df+0.5)).

    Scale shape: tf touches only rows whose term is IN the (tiny,
    broadcast) query-term set — the posting scan is a semi-join, not
    a full term explosion shuffle; df/avgdl are scalar/3-row
    broadcast aggregates; the final top-k compiles to
    TakeOrderedAndProject. Per-term scores round to 9 d.p. before the
    exact decimal sum (the js_divergence float-parity recipe);
    avgdl is sum/count (NOT avg()) so both engines produce the
    identical double."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("t"))
    dl = tk.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    tf = (
        tk.select("doc_id", F.explode("t").alias("term"))
        .join(F.broadcast(terms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    return _bm25_scored_topk(tf, df, dl, stats)


# --- Gopher quality rules ---

GOPHER_STOPWORDS = (
    "the", "a", "and", "of", "to", "in", "be", "that", "have", "with",
)


@query(
    "text_gopher_filters",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS t FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(t) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE)
               / len(t), 6) AS mean_word_len,
         round(CAST(len(list_filter(t, w -> regexp_matches(w, '[a-z]')))
                    AS DOUBLE) / len(t), 6) AS frac_alpha,
         CAST(len(list_intersect(t,
              ['the','a','and','of','to','in','be','that','have','with']))
              AS BIGINT) AS stop_hits
  FROM tk
)
SELECT doc_id, n_words, mean_word_len, frac_alpha, stop_hits,
       (n_words BETWEEN 50 AND 100000) AS pass_words,
       (mean_word_len BETWEEN 3.0 AND 10.0) AS pass_mwl,
       (frac_alpha >= 0.8) AS pass_alpha,
       (stop_hits >= 2) AS pass_stop,
       ((n_words BETWEEN 50 AND 100000)
        AND (mean_word_len BETWEEN 3.0 AND 10.0)
        AND (frac_alpha >= 0.8) AND (stop_hits >= 2)) AS gopher_pass
FROM m
""",
    tags=("X3", "quality", "gopher"),
)
def text_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules (Rae et al. 2021 §A1.1 — the published
    heuristic set MassiveWeb was filtered with, and the template for
    every C4/FineWeb-style pipeline since): per doc, word count
    (50–100k), mean word length (3–10), fraction of words containing
    an alphabetic character (≥0.8), and presence of ≥2 common English
    stopwords (the ten-word screen); plus the per-rule flags and the
    conjunction. Complements text_quality_score (length/punct ratios)
    with the canonical published rule set.

    Scale shape: every metric is a per-row array expression (no
    explode, no shuffle at all beyond the scan) — higher-order
    functions keep the whole filter map-side, exactly what a 100 TB
    quality pass needs."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    base = d.select("doc_id", t.alias("t"))
    n = F.size("t").cast("long")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    m = base.select(
        "doc_id",
        n.alias("n_words"),
        F.round(
            F.expr("aggregate(t, 0L, (acc, w) -> acc + length(w))").cast("double")
            / F.size("t"),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.expr("filter(t, w -> w rlike '[a-z]')")).cast("double")
            / F.size("t"),
            6,
        ).alias("frac_alpha"),
        F.size(F.array_intersect("t", stop_arr)).cast("long").alias("stop_hits"),
    )
    pw = F.col("n_words").between(50, 100000)
    pm = F.col("mean_word_len").between(3.0, 10.0)
    pa = F.col("frac_alpha") >= 0.8
    ps = F.col("stop_hits") >= 2
    return m.select(
        "doc_id", "n_words", "mean_word_len", "frac_alpha", "stop_hits",
        pw.alias("pass_words"),
        pm.alias("pass_mwl"),
        pa.alias("pass_alpha"),
        ps.alias("pass_stop"),
        (pw & pm & pa & ps).alias("gopher_pass"),
    )


# --- PII screen / redaction accounting ---

PII_EMAIL = r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]{2,4}"
PII_PHONE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_SSN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"


def _pii_oracle() -> str:
    # injected PII mirrors the Spark side exactly (deterministic from
    # doc_id); the fixture corpus itself is PII-free word soup, so the
    # injection is what makes the screen non-degenerate
    inject = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 9 = 0
                 THEN ' contact u' || CAST(doc_id AS VARCHAR)
                      || '@mail.example.org' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                      || '-0199' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' ssn 078-05-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS text
  FROM documents
"""
    return f"""
WITH corpus AS ({inject}),
per AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS emails,
         CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS phones,
         CAST(len(regexp_extract_all(text, '{PII_SSN}')) AS BIGINT) AS ssns,
         CAST(length(text) AS BIGINT)
           - CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
               '{PII_EMAIL}', '[EMAIL]', 'g'),
               '{PII_PHONE}', '[PHONE]', 'g'),
               '{PII_SSN}', '[SSN]', 'g')) AS BIGINT) AS chars_delta
  FROM corpus
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(emails) AS BIGINT) AS emails,
       CAST(sum(phones) AS BIGINT) AS phones,
       CAST(sum(ssns) AS BIGINT) AS ssns,
       CAST(count(CASE WHEN emails + phones + ssns > 0 THEN 1 END) AS BIGINT)
         AS pii_docs,
       CAST(sum(chars_delta) AS BIGINT) AS redacted_chars_delta
FROM per GROUP BY source
""" 


@query(
    "text_pii_screen",
    oracle=_pii_oracle(),
    tags=("X3", "pii", "redaction", "quality"),
)
def text_pii_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII SCREEN + REDACTION ACCOUNTING — the compliance pass every
    published corpus runs before release: per source, documents and
    occurrences of email / phone / SSN patterns, and the exact
    character delta a three-pattern redaction would apply. The
    fixture corpus is PII-free word soup, so deterministic PII is
    INJECTED from doc_id (every 9th doc an email, 11th a phone, 13th
    an SSN — both engines inject identically), making the counts
    non-degenerate and the regex semantics fully exercised, including
    the disjointness of the phone (3-3-4) and SSN (3-2-4) patterns.

    Scale shape: pure per-row regexp expressions (JVM-side, no UDF)
    + one groupBy(source) with map-side combine — the same
    zero-extra-shuffle shape as text_gopher_filters."""
    d = load_table(spark, sf_dir, "documents")
    inj = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example.org"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                F.lit("-0199"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" ssn 078-05-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_SSN,
        "[SSN]",
    )
    per = d.select("source", inj.alias("t")).select(
        "source",
        F.regexp_count("t", F.lit(PII_EMAIL)).cast("long").alias("emails"),
        F.regexp_count("t", F.lit(PII_PHONE)).cast("long").alias("phones"),
        F.regexp_count("t", F.lit(PII_SSN)).cast("long").alias("ssns"),
        (F.length("t").cast("long") - F.length(redacted).cast("long")).alias(
            "chars_delta"
        ),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("emails").alias("emails"),
        F.sum("phones").alias("phones"),
        F.sum("ssns").alias("ssns"),
        F.count(
            F.when(F.col("emails") + F.col("phones") + F.col("ssns") > 0, 1)
        ).alias("pii_docs"),
        F.sum("chars_delta").alias("redacted_chars_delta"),
    )


# --- hybrid retrieval: reciprocal rank fusion ---

RRF_K = 60  # the canonical RRF constant (Cormack et al. 2009)
QL_MU = 2000.0  # Dirichlet smoothing (Zhai & Lafferty 2004)
RRF_TOP = 15


@query(
    "text_rrf_hybrid_topk",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS t FROM documents
),
dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM tk),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         CAST(sum(dl) AS DOUBLE) AS c_tot
  FROM dl
),
terms AS (SELECT unnest(['spark', 'join', 'window']) AS term),
alltok AS (SELECT doc_id, unnest(t) AS term FROM tk),
ctf AS (
  SELECT q.term, CAST(count(*) AS DOUBLE) AS ctf
  FROM alltok x JOIN terms q ON x.term = q.term GROUP BY q.term
),
tf AS (
  SELECT x.doc_id, x.term, count(*) AS tf
  FROM alltok x JOIN terms q ON x.term = q.term
  GROUP BY x.doc_id, x.term
),
cand AS (SELECT DISTINCT doc_id FROM tf),
df AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
grid AS (
  SELECT c.doc_id, t.term, COALESCE(f.tf, 0) AS tf
  FROM cand c CROSS JOIN terms t
  LEFT JOIN tf f ON c.doc_id = f.doc_id AND t.term = f.term
),
scored AS (
  SELECT g.doc_id,
         round(CASE WHEN g.tf > 0 THEN
           ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
           * ((g.tf * {BM25_K1 + 1.0}) /
              (g.tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * (d.dl / s.avgdl))))
           ELSE 0.0 END, 9) AS st_bm25,
         round(ln((g.tf + {QL_MU} * (c.ctf / s.c_tot)) / (d.dl + {QL_MU})), 9)
           AS st_ql
  FROM grid g
  JOIN ctf c ON g.term = c.term
  LEFT JOIN df ON g.term = df.term
  JOIN dl d ON g.doc_id = d.doc_id
  CROSS JOIN stats s
),
agg AS (
  SELECT doc_id,
         round(CAST(sum(CAST(st_bm25 AS DECIMAL(28,9))) AS DOUBLE), 6)
           AS bm25,
         round(CAST(sum(CAST(st_ql AS DECIMAL(28,9))) AS DOUBLE), 6) AS ql
  FROM scored GROUP BY doc_id
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY bm25 DESC, doc_id) AS bm25_rank,
         row_number() OVER (ORDER BY ql DESC, doc_id) AS ql_rank
  FROM agg
)
SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
       CAST(ql_rank AS BIGINT) AS ql_rank,
       round(1.0 / ({RRF_K} + bm25_rank) + 1.0 / ({RRF_K} + ql_rank), 9)
         AS rrf
FROM ranked
ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
""",
    tags=("X3", "retrieval", "rrf", "hybrid"),
)
def text_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL RANK FUSION of the two classic retrieval models
    (Cormack et al. 2009 — the fusion every hybrid-search / RAG stack
    runs): BM25 and Dirichlet-smoothed query likelihood (Zhai &
    Lafferty 2004, μ=2000) each rank the candidate documents for the
    literal query {spark, join, window}; RRF = Σ 1/(60 + rank) fuses
    them; top-15 returned with both component ranks.

    Scale shape: all statistics flow from the SAME query-term
    semi-join as text_bm25_topk (the posting scan never explodes the
    full vocabulary); the candidate×3-term grid comes from a 3-row
    broadcast cross join; the two ranking windows run over the
    CANDIDATE set — bounded by the query terms' posting lists, the
    standard retrieval working set — and the final top-k is
    TakeOrderedAndProject. Per-term scores fold decimal-exact."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("t"))
    dl = tk.select("doc_id", F.size("t").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        F.sum("dl").cast("double").alias("c_tot"),
    )
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    alltok = tk.select("doc_id", F.explode("t").alias("term"))
    hits = alltok.join(F.broadcast(terms), "term")
    ctf = hits.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("ctf"))
    tf = hits.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    cand = tf.select("doc_id").distinct()
    df = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    grid = (
        cand.crossJoin(F.broadcast(terms))
        .join(tf, ["doc_id", "term"], "left")
        .select("doc_id", "term", F.coalesce("tf", F.lit(0)).alias("tf"))
    )
    scored = (
        grid.join(F.broadcast(ctf), "term")
        .join(F.broadcast(df), "term", "left")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                F.when(
                    F.col("tf") > 0,
                    F.log(
                        F.lit(1.0)
                        + (F.col("n_docs") - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)
                    )
                    * (
                        (F.col("tf") * F.lit(BM25_K1 + 1.0))
                        / (
                            F.col("tf")
                            + F.lit(BM25_K1)
                            * (
                                F.lit(1.0 - BM25_B)
                                + F.lit(BM25_B) * (F.col("dl") / F.col("avgdl"))
                            )
                        )
                    ),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("st_bm25"),
            F.round(
                F.log(
                    (F.col("tf") + F.lit(QL_MU) * (F.col("ctf") / F.col("c_tot")))
                    / (F.col("dl") + F.lit(QL_MU))
                ),
                9,
            ).alias("st_ql"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("st_bm25").cast("decimal(28,9)")).cast("double"), 6
        ).alias("bm25"),
        F.round(
            F.sum(F.col("st_ql").cast("decimal(28,9)")).cast("double"), 6
        ).alias("ql"),
    )
    ranked = agg.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("bm25").desc(), "doc_id"))
        .cast("long")
        .alias("bm25_rank"),
        F.row_number()
        .over(W.orderBy(F.col("ql").desc(), "doc_id"))
        .cast("long")
        .alias("ql_rank"),
    )
    return (
        ranked.select(
            "doc_id",
            "bm25_rank",
            "ql_rank",
            F.round(
                1.0 / (F.lit(RRF_K) + F.col("bm25_rank"))
                + 1.0 / (F.lit(RRF_K) + F.col("ql_rank")),
                9,
            ).alias("rrf"),
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(RRF_TOP)
    )


# --- RAKE keyword extraction ---

RAKE_TOP = 20


@query(
    "text_rake_keywords",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, u['i'] AS pos, u['w'] AS w,
         CASE WHEN list_contains(
           ['the','a','and','of','to','in','be','that','have','with'],
           u['w']) THEN 1 ELSE 0 END AS is_stop
  FROM (
    SELECT doc_id,
           unnest(list_transform(string_split({SQL_NORM}, ' '),
                  (x, i) -> {{'i': i, 'w': x}})) AS u
    FROM documents
  )
),
grp AS (
  SELECT doc_id, pos, w, is_stop,
         sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS g
  FROM tok
),
phrase_words AS (
  SELECT doc_id, g, w,
         count(*) OVER (PARTITION BY doc_id, g) AS plen
  FROM grp WHERE is_stop = 0
),
wstat AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS freq,
         CAST(sum(plen) AS DOUBLE) AS degree
  FROM phrase_words GROUP BY w
),
pscore AS (
  SELECT pw.doc_id, pw.g,
         round(CAST(sum(CAST(round(s.degree / s.freq, 9)
               AS DECIMAL(28,9))) AS DOUBLE), 6) AS score
  FROM phrase_words pw JOIN wstat s ON pw.w = s.w
  GROUP BY pw.doc_id, pw.g
),
ptext AS (
  SELECT doc_id, g, string_agg(w, ' ' ORDER BY pos) AS phrase
  FROM grp WHERE is_stop = 0 GROUP BY doc_id, g
),
agg AS (
  SELECT t.phrase, min(p.score) AS score, count(*) AS occurrences
  FROM ptext t JOIN pscore p ON t.doc_id = p.doc_id AND t.g = p.g
  GROUP BY t.phrase
)
SELECT phrase, score, CAST(occurrences AS BIGINT) AS occurrences
FROM agg ORDER BY score DESC, phrase LIMIT {RAKE_TOP}
""",
    tags=("X3", "rake", "keywords"),
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010 — Rapid Automatic
    Keyword Extraction): candidate phrases are maximal stopword-free
    token runs (gaps-and-islands on the stopword flag), each word
    scores degree/frequency over the whole corpus's candidate set
    (degree = Σ phrase length over the word's occurrences), a phrase
    scores the sum of its words' scores, and the corpus's top-20
    distinct phrases are returned with occurrence counts. A phrase's
    score is a pure function of its text (word scores are
    corpus-level), so min() over occurrences is exact dedup, not an
    approximation.

    Scale shape: the islands come from ONE running sum per doc (one
    exchange on doc_id, same-window phrase length via count() over
    the group); word stats are a vocabulary-bounded groupBy; the
    phrase score join is word-keyed. Top-k is TakeOrderedAndProject.
    The degree/freq divisions round to 9 d.p. before the exact
    decimal fold (the shared float-parity recipe)."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    tok = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    ).withColumn(
        "is_stop",
        F.when(F.array_contains(stop_arr, F.col("w")), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    wdoc = W.partitionBy("doc_id").orderBy("pos")
    grp = tok.withColumn(
        "g",
        F.sum("is_stop").over(wdoc.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    nonstop = grp.filter(F.col("is_stop") == 0)
    pw = nonstop.withColumn(
        "plen", F.count(F.lit(1)).over(W.partitionBy("doc_id", "g"))
    )
    wstat = pw.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("freq"),
        F.sum("plen").cast("double").alias("degree"),
    )
    pscore = (
        pw.join(wstat, "w")
        .groupBy("doc_id", "g")
        .agg(
            F.round(
                F.sum(
                    F.round(F.col("degree") / F.col("freq"), 9).cast(
                        "decimal(28,9)"
                    )
                ).cast("double"),
                6,
            ).alias("score")
        )
    )
    ptext = (
        nonstop.groupBy("doc_id", "g")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.getField("w"),
                ),
                " ",
            ).alias("phrase")
        )
    )
    agg = (
        ptext.join(pscore, ["doc_id", "g"])
        .groupBy("phrase")
        .agg(
            F.min("score").alias("score"),
            F.count(F.lit(1)).alias("occurrences"),
        )
    )
    return (
        agg.select("phrase", "score", "occurrences")
        .orderBy(F.col("score").desc(), "phrase")
        .limit(RAKE_TOP)
    )


@query(
    "text_auc_quality_vs_lang",
    oracle=f"""
WITH per AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         round(CAST(len(list_filter(string_split({SQL_NORM}, ' '),
               w -> list_contains(
                 ['the','a','and','of','to','in','be','that','have','with'],
                 w))) AS DOUBLE)
               / len(string_split({SQL_NORM}, ' ')), 9) AS score
  FROM documents
),
byscore AS (
  SELECT score, count(*) AS cnt, sum(pos) AS pos_cnt FROM per GROUP BY score
),
ranked AS (
  SELECT score, cnt, pos_cnt,
         COALESCE(sum(cnt) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev
  FROM byscore
),
tot AS (
  SELECT CAST(sum(pos) AS DOUBLE) AS n_pos,
         CAST(count(*) - sum(pos) AS DOUBLE) AS n_neg
  FROM per
)
SELECT CAST(t.n_pos AS BIGINT) AS n_pos,
       CAST(t.n_neg AS BIGINT) AS n_neg,
       round((sum(r.pos_cnt * (r.cum_prev + (r.cnt + 1.0) / 2.0))
              - t.n_pos * (t.n_pos + 1.0) / 2.0)
             / (t.n_pos * t.n_neg), 9) AS auc
FROM ranked r CROSS JOIN tot t
GROUP BY t.n_pos, t.n_neg
""",
    tags=("X3", "evaluation", "auc"),
)
def text_auc_quality_vs_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank-sum — the evaluation
    every quality-classifier gate needs before it filters a corpus:
    does the stopword-ratio score actually separate English documents
    (pos = lang='en') from the rest? Ties are handled exactly with
    average ranks computed per DISTINCT score (avg rank = preceding
    count + (group size + 1)/2), so the result equals the
    integral-over-thresholds definition, not a sampling estimate.

    Scale shape: one per-row score expression, a distinct-score
    groupBy, ONE ordered window over the distinct scores (bounded by
    score cardinality, not rows — at 9 d.p. rounding that is at most
    1e9+1 groups and in practice tiny), and a scalar fold. No
    per-row global rank is ever materialized — the rank-sum uses
    group arithmetic."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    stop_arr = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    t = tokens(F.col("text"))
    per = d.select(
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("pos"),
        F.round(
            F.size(F.filter(t, lambda w: F.array_contains(stop_arr, w))).cast(
                "double"
            )
            / F.size(t),
            9,
        ).alias("score"),
    )
    byscore = per.groupBy("score").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("pos").alias("pos_cnt")
    )
    wsc = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    ranked = byscore.withColumn(
        "cum_prev", F.coalesce(F.sum("cnt").over(wsc), F.lit(0))
    )
    tot = per.agg(
        F.sum("pos").cast("double").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("pos")).cast("double").alias("n_neg"),
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n_pos", "n_neg")
        .agg(
            F.round(
                (
                    F.sum(
                        F.col("pos_cnt")
                        * (F.col("cum_prev") + (F.col("cnt") + 1.0) / 2.0)
                    )
                    - F.col("n_pos") * (F.col("n_pos") + 1.0) / 2.0
                )
                / (F.col("n_pos") * F.col("n_neg")),
                9,
            ).alias("auc")
        )
        .select(
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("n_neg").cast("long").alias("n_neg"),
            "auc",
        )
    )


KN_D = 0.75  # the standard absolute-discount constant


@query(
    "text_kn_bigram_ppl_buckets",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, lang, string_split({SQL_NORM}, ' ') AS t FROM documents
),
big AS (
  SELECT doc_id, lang, u['w1'] AS w1, u['w2'] AS w2
  FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, len(t)),
                  i -> {{'w1': t[i], 'w2': t[i+1]}})) AS u
    FROM tk WHERE len(t) >= 2
  )
),
bc AS (SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c FROM big GROUP BY w1, w2),
lft AS (
  SELECT w1, CAST(sum(c) AS DOUBLE) AS c1, CAST(count(*) AS DOUBLE) AS nl
  FROM bc GROUP BY w1
),
rgt AS (SELECT w2, CAST(count(*) AS DOUBLE) AS nr FROM bc GROUP BY w2),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS b FROM bc),
nll AS (
  SELECT g.doc_id, g.lang,
         CAST(sum(CAST(round(-ln(
             (greatest(bc.c - {KN_D}, 0.0) / l.c1)
             + (({KN_D} * l.nl / l.c1) * (r.nr / tot.b))
           ), 6) AS DECIMAL(28,6))) AS DOUBLE) / count(*) AS doc_nll
  FROM big g
  JOIN bc ON g.w1 = bc.w1 AND g.w2 = bc.w2
  JOIN lft l ON g.w1 = l.w1
  JOIN rgt r ON g.w2 = r.w2
  CROSS JOIN tot
  GROUP BY g.doc_id, g.lang
)
SELECT lang,
       CAST(floor(doc_nll * 2) AS BIGINT) AS bucket,
       count(*) AS n_docs,
       min(round(doc_nll, 6)) AS min_nll,
       max(round(doc_nll, 6)) AS max_nll
FROM nll GROUP BY lang, bucket
""",
    tags=("X3", "quality", "perplexity", "kneser-ney"),
)
def text_kn_bigram_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney smoothed BIGRAM perplexity buckets (Kneser & Ney
    1995 / Chen & Goodman 1998 — the smoothing every classical LM
    quality gate actually uses, completing the family next to the
    add-1 unigram filter and raw bigram surprisal):
    P_KN(w2|w1) = max(c(w1w2)−d, 0)/c(w1) + (d·N1+(w1·)/c(w1)) ·
    (N1+(·w2)/B) with d = 0.75 — the continuation probability rewards
    words seen after MANY contexts, not merely frequent ones. Per-doc
    mean NLL over its bigrams, 0.5-nat buckets per lang (docs shorter
    than one bigram excluded identically in both engines).

    Scale shape: the LM is three count aggregates over the bigram
    table (bigram, left-context, right-continuation) + one totals
    row — all broadcastable; scoring is map-side joins over the
    corpus bigram stream; per-token NLLs fold decimal-exact. Same
    single-doc-aggregation shape as text_unigram_ppl_buckets."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", tokens(F.col("text")).alias("t")
    ).filter(F.size("t") >= 2)
    big = base.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t)-2),"
                " i -> struct(t[i] as w1, t[i+1] as w2))"
            )
        ).alias("u"),
    ).select("doc_id", "lang", "u.w1", "u.w2")
    bc = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("double").alias("c"))
    lft = bc.groupBy("w1").agg(
        F.sum("c").cast("double").alias("c1"),
        F.count(F.lit(1)).cast("double").alias("nl"),
    )
    rgt = bc.groupBy("w2").agg(F.count(F.lit(1)).cast("double").alias("nr"))
    tot = bc.agg(F.count(F.lit(1)).cast("double").alias("b"))
    p = (
        F.greatest(F.col("c") - F.lit(KN_D), F.lit(0.0)) / F.col("c1")
    ) + ((F.lit(KN_D) * F.col("nl") / F.col("c1")) * (F.col("nr") / F.col("b")))
    # r12: the per-bigram NLL depends only on the MODEL-sized (w1, w2)
    # row — assemble the three count joins + the log/round/cast on the
    # model frame and hand the corpus bigram stream ONE broadcast join
    # over a precomputed decimal (the text_nb_classify recipe)
    mod = (
        bc.join(lft, "w1")
        .join(rgt, "w2")
        .crossJoin(tot)
        .select(
            "w1",
            "w2",
            F.round(-F.log(p), 6).cast("decimal(28,6)").alias("nll_t"),
        )
    )
    nll = (
        big.join(F.broadcast(mod), ["w1", "w2"])
        .groupBy("doc_id", "lang")
        .agg(
            (
                F.sum("nll_t").cast("double") / F.count(F.lit(1))
            ).alias("doc_nll")
        )
    )
    return nll.groupBy(
        "lang", F.floor(F.col("doc_nll") * 2).cast("long").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(F.round("doc_nll", 6)).alias("min_nll"),
        F.max(F.round("doc_nll", 6)).alias("max_nll"),
    )


# --- TextRank keyword extraction ---

TR_ITER = 3
TR_DAMP = 0.85
TR_TOP = 20
_TR_DEC = "decimal(38,12)"


def _textrank_oracle() -> str:
    its = []
    prev = "r0"
    for i in range(1, TR_ITER + 1):
        its.append(f"""
it{i} AS (
  SELECT n.word,
         CAST({1.0 - TR_DAMP} AS DOUBLE)
         + CAST({TR_DAMP} AS DOUBLE) * CAST(COALESCE(s.sc, 0) AS DOUBLE) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst, sum(CAST(round((p.r / o.outw) * e.w, 12)
                           AS DECIMAL(38,12))) AS sc
    FROM {prev} p
    JOIN edges e ON e.src = p.word
    JOIN outw o ON o.src = p.word
    GROUP BY e.dst
  ) s ON s.dst = n.word
)""")
        prev = f"it{i}"
    return f"""
WITH tk AS (
  SELECT string_split({SQL_NORM}, ' ') AS t FROM documents
),
adj AS (
  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> [t[i], t[i+1]])) AS pr
  FROM tk
),
sym AS (
  SELECT pr[1] AS src, pr[2] AS dst FROM adj WHERE pr[1] <> pr[2]
  UNION ALL
  SELECT pr[2] AS src, pr[1] AS dst FROM adj WHERE pr[1] <> pr[2]
),
edges AS (SELECT src, dst, count(*) AS w FROM sym GROUP BY src, dst),
outw AS (SELECT src, CAST(sum(w) AS DOUBLE) AS outw FROM edges GROUP BY src),
nodes AS (SELECT DISTINCT src AS word FROM edges),
r0 AS (SELECT word, CAST(1.0 AS DOUBLE) AS r FROM nodes),{",".join(its)},
ranked AS (
  SELECT word, round(r, 9) AS rank,
         row_number() OVER (ORDER BY r DESC, word) AS rn
  FROM {prev}
)
SELECT word, rank, CAST(rn AS BIGINT) AS rn FROM ranked WHERE rn <= {TR_TOP}
"""


@query(
    "text_textrank_keywords",
    oracle=_textrank_oracle(),
    tags=("X3", "keywords", "textrank", "iterative-unrolled"),
)
def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEXTRANK KEYWORD EXTRACTION (Mihalcea & Tarau 2004): PageRank
    (damping 0.85, {TR_ITER} unrolled iterations) over the corpus-wide
    word ADJACENCY graph — words co-occurring next to each other link
    both ways, edge weight = co-occurrence count, rank votes are
    weight-proportional (r_u/outdeg_u · w_uv). Complements RAKE
    (degree/frequency heuristic) with the graph-centrality scorer the
    original paper showed beats tf-idf for keyphrase work.

    Scale shape: the graph build is one groupBy over adjacent-pair
    tokens (vocabulary²-bounded output, input-sized shuffle); each
    unrolled iteration joins the rank table (|V| rows) to edges (|E|)
    — the same bounded-iteration declarative recipe as q_pagerank3,
    with per-edge contributions rounded to 12 dp and summed as
    DECIMAL(38,12) so three chained float iterations still hash-match
    DuckDB bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select(tokens(F.col("text")).alias("t"))
    n = F.size(F.col("t"))
    adj = tk.select(
        F.explode(
            F.when(n < 2, F.array().cast("array<array<string>>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.array(
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("pr")
    ).filter(F.col("pr")[0] != F.col("pr")[1])
    fwd = adj.select(F.col("pr")[0].alias("src"), F.col("pr")[1].alias("dst"))
    rev = adj.select(F.col("pr")[1].alias("src"), F.col("pr")[0].alias("dst"))
    edges = (
        fwd.unionAll(rev).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").cast("double").alias("outw"))
    ew = edges.join(outw.select(F.col("src").alias("esrc"), "outw"),
                    edges.src == F.col("esrc")).select("src", "dst", "w", "outw")
    nodes = edges.select(F.col("src").alias("word")).distinct()
    r = nodes.select("word", F.lit(1.0).alias("r"))
    for _ in range(TR_ITER):
        contrib = (
            r.join(ew, r.word == ew.src)
            .select(
                F.col("dst"),
                F.round((F.col("r") / F.col("outw")) * F.col("w"), 12)
                .cast(_TR_DEC)
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("sc"))
        )
        r = nodes.join(contrib, nodes.word == contrib.dst, "left").select(
            "word",
            (
                F.lit(1.0 - TR_DAMP)
                + F.lit(TR_DAMP)
                * F.coalesce(F.col("sc"), F.lit(0).cast(_TR_DEC)).cast("double")
            ).alias("r"),
        )
    w = W.orderBy(F.col("r").desc(), "word")
    return (
        r.select(
            "word",
            F.round("r", 9).alias("rank"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= TR_TOP)
    )


@query(
    "text_score_calibration",
    oracle=f"""
WITH per AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         round(CAST(len(list_filter(string_split({SQL_NORM}, ' '),
               w -> list_contains(
                 ['the','a','and','of','to','in','be','that','have','with'],
                 w))) AS DOUBLE)
               / len(string_split({SQL_NORM}, ' ')), 9) AS score
  FROM documents
),
deciled AS (
  SELECT pos, score, ntile(10) OVER (ORDER BY score, doc_id) AS decile
  FROM per
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum(CAST(score AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS mean_score,
       round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS positive_rate
FROM deciled GROUP BY decile
""",
    tags=("X3", "evaluation", "calibration"),
)
def text_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM (calibration table) for the stopword-ratio
    quality score against the lang='en' label — the companion readout
    to text_auc_quality_vs_lang: AUC says the score RANKS well;
    calibration says whether a 0.3-scoring bucket actually contains
    ~30% positives, which is what a corpus-filter threshold acts on.
    Docs are split into score deciles (ntile over the deterministic
    (score, doc_id) order — both engines assign identical buckets);
    each row reports bucket size, mean score (9-dp-rounded scores
    summed as DECIMAL, one shared divide) and observed positive rate.

    Scale shape: the per-doc score is map-side; the decile ntile is
    the one rank-based step — at 100 TB it becomes a two-pass
    quantile-cut (approx thresholds + map-side bucketing) with the
    same downstream aggregate, or rides a pre-sorted score column;
    the final groupBy is 10 rows."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        tokens(F.col("text")).alias("t"),
    )
    sw = F.array(*[F.lit(w) for w in (
        "the", "a", "and", "of", "to", "in", "be", "that", "have", "with",
    )])
    per = tk.select(
        "doc_id",
        "pos",
        F.round(
            F.size(F.filter(F.col("t"), lambda w: F.array_contains(sw, w)))
            .cast("double")
            / F.size(F.col("t")),
            9,
        ).alias("score"),
    )
    deciled = per.select(
        "pos",
        "score",
        F.ntile(10).over(W.orderBy("score", "doc_id")).alias("decile"),
    )
    return deciled.groupBy(F.col("decile").cast("long").alias("decile")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("score").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
        F.round(F.sum("pos").cast("double") / F.count(F.lit(1)), 6).alias(
            "positive_rate"
        ),
    )


BURST_TOP = 25


@query(
    "text_burstiness",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS t FROM documents
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM tk),
cnts AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS c FROM (
    SELECT doc_id, unnest(t) AS term FROM tk
  ) x GROUP BY doc_id, term
),
stats AS (
  SELECT term,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS cf,
         CAST(sum(c * c) AS BIGINT) AS cf2
  FROM cnts GROUP BY term
),
scored AS (
  SELECT s.term, s.df, s.cf,
         round((CAST(s.cf2 AS DOUBLE)
                - CAST(s.cf AS DOUBLE) * s.cf / n.n_docs)
               / (n.n_docs - 1)
               / (CAST(s.cf AS DOUBLE) / n.n_docs), 9) AS vmr
  FROM stats s CROSS JOIN n
),
ranked AS (
  SELECT term, df, cf, vmr,
         row_number() OVER (ORDER BY vmr DESC, term) AS rn
  FROM scored
)
SELECT term, df, cf, vmr, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {BURST_TOP}
""",
    tags=("X3", "burstiness", "corpus-stats"),
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WORD BURSTINESS (Church & Gale 1995): variance-to-mean ratio of
    per-document term counts over the WHOLE corpus (zeros included —
    the moments use n_docs, not df). VMR ≈ 1 is Poisson background
    vocabulary; VMR ≫ 1 marks topical/bursty terms that concentrate
    in few documents — the signal term-weighting and boilerplate
    screens read. Top-{BURST_TOP} bursty terms with document and
    collection frequency.

    Parity: df/cf/cf² fold as exact integers; the variance identity
    (Σc² − (Σc)²/n)/(n−1) and the mean divide run as one shared double
    chain, rounded to 9 dp. Scale shape: one (doc, term) groupBy
    (input-sized, map-side combined), one vocabulary-bounded stats
    groupBy, a scalar broadcast, TakeOrderedAndProject top-k."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("doc_id", tokens(F.col("text")).alias("t"))
    n = tk.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    cnts = (
        tk.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = cnts.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("c").cast("long").alias("cf"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("cf2"),
    )
    scored = stats.crossJoin(F.broadcast(n)).select(
        "term",
        "df",
        "cf",
        F.round(
            (
                F.col("cf2").cast("double")
                - F.col("cf").cast("double") * F.col("cf") / F.col("n_docs")
            )
            / (F.col("n_docs") - 1)
            / (F.col("cf").cast("double") / F.col("n_docs")),
            9,
        ).alias("vmr"),
    )
    w = W.orderBy(F.col("vmr").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= BURST_TOP)
        .select("term", "df", "cf", "vmr", "rn")
    )


PMI_TOP = 25
PMI_MIN_PAIR = 5


@query(
    "text_pmi_collocations",
    oracle=f"""
WITH tk AS (
  SELECT string_split({SQL_NORM}, ' ') AS t FROM documents
),
bg AS (
  SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> [t[i], t[i+1]])) AS pr
  FROM tk
),
pairs AS (
  SELECT pr[1] AS w1, pr[2] AS w2, CAST(count(*) AS BIGINT) AS n_ab
  FROM bg GROUP BY pr[1], pr[2]
),
tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM pairs),
uni1 AS (SELECT w1, CAST(sum(n_ab) AS BIGINT) AS n_a FROM pairs GROUP BY w1),
uni2 AS (SELECT w2, CAST(sum(n_ab) AS BIGINT) AS n_b FROM pairs GROUP BY w2),
scored AS (
  SELECT p.w1, p.w2, p.n_ab,
         round(ln((CAST(p.n_ab AS DOUBLE) * t.n)
                  / (CAST(u1.n_a AS DOUBLE) * u2.n_b)), 9) AS pmi
  FROM pairs p
  JOIN uni1 u1 ON u1.w1 = p.w1
  JOIN uni2 u2 ON u2.w2 = p.w2
  CROSS JOIN tot t
  WHERE p.n_ab >= {PMI_MIN_PAIR}
),
ranked AS (
  SELECT w1, w2, n_ab, pmi,
         row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
  FROM scored
)
SELECT w1, w2, n_ab, pmi, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {PMI_TOP}
""",
    tags=("X3", "collocations", "pmi"),
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI COLLOCATION EXTRACTION (Church & Hanks 1990): adjacent word
    pairs ranked by pointwise mutual information against the bigram
    margins — log(p(ab) / p(a)p(b)) — with a minimum pair count of
    {PMI_MIN_PAIR} (raw PMI is notoriously noisy on hapax pairs). The
    collocation detector a tokenizer-vocabulary or phrase-mining pass
    runs; complements the count-ranked text_top_bigrams with the
    association-strength ranking.

    Parity: counts are exact integers; PMI is ONE shared ln over an
    integer ratio, rounded to 9 dp before the top-k. Scale shape: one
    bigram groupBy (input-sized, map-side combined), two
    vocabulary-bounded margin aggregates re-joined broadcast, scalar
    total, TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    tk = d.select(tokens(F.col("text")).alias("t"))
    n = F.size(F.col("t"))
    bg = tk.select(
        F.explode(
            F.when(n < 2, F.array().cast("array<array<string>>")).otherwise(
                F.transform(
                    F.sequence(F.lit(0), n - 2),
                    lambda i: F.array(
                        F.element_at(F.col("t"), i + 1),
                        F.element_at(F.col("t"), i + 2),
                    ),
                )
            )
        ).alias("pr")
    )
    pairs = (
        bg.select(F.col("pr")[0].alias("w1"), F.col("pr")[1].alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    tot = pairs.agg(F.sum("n_ab").cast("long").alias("n"))
    uni1 = pairs.groupBy("w1").agg(F.sum("n_ab").cast("long").alias("n_a"))
    uni2 = pairs.groupBy("w2").agg(F.sum("n_ab").cast("long").alias("n_b"))
    scored = (
        pairs.filter(F.col("n_ab") >= PMI_MIN_PAIR)
        .join(F.broadcast(uni1), "w1")
        .join(F.broadcast(uni2), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab").cast("double") * F.col("n"))
                    / (F.col("n_a").cast("double") * F.col("n_b"))
                ),
                9,
            ).alias("pmi"),
        )
    )
    w = W.orderBy(F.col("pmi").desc(), "w1", "w2")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= PMI_TOP)
        .select("w1", "w2", "n_ab", "pmi", "rn")
    )


@query(
    "text_keyness_g2",
    oracle=f"""
WITH tk AS (
  SELECT CASE WHEN CAST(substr(source, 4) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS grp,
         unnest(string_split({SQL_NORM}, ' ')) AS term
  FROM documents
),
c AS (
  SELECT term,
         CAST(sum(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(sum(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM tk WHERE term <> '' GROUP BY term
),
t AS (SELECT CAST(sum(a) AS BIGINT) AS ta, CAST(sum(b) AS BIGINT) AS tb FROM c),
g AS (
  SELECT c.term, c.a, c.b,
         2.0 * ((CASE WHEN c.a > 0 THEN c.a * ln(CAST(c.a AS DOUBLE)
                 / ((CAST(c.a + c.b AS DOUBLE) * t.ta) / (t.ta + t.tb)))
                 ELSE 0.0 END)
              + (CASE WHEN c.b > 0 THEN c.b * ln(CAST(c.b AS DOUBLE)
                 / ((CAST(c.a + c.b AS DOUBLE) * t.tb) / (t.ta + t.tb)))
                 ELSE 0.0 END)) AS g2
  FROM c CROSS JOIN t
),
r AS (
  SELECT term, a, b, round(g2, 6) AS g2,
         row_number() OVER (ORDER BY round(g2, 6) DESC, term) AS rn
  FROM g
)
SELECT term, a AS count_a, b AS count_b, g2, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 20
""",
    tags=("X3", "keyness", "corpus-linguistics"),
)
def text_keyness_g2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYNESS via the LOG-LIKELIHOOD RATIO G² (Dunning 1993) — which
    terms are OVER-represented in one half of the corpus vs the other
    (sources split even/odd): the corpus-linguistics drift detector
    that, unlike raw frequency ratios, is calibrated for rare terms.
    One tokenize+groupBy (vocabulary-bounded), marginals broadcast,
    G² per term in double over exact integer counts (the zero-count
    branches handled identically in both engines), top-20 by the
    ROUNDED score with a term tie-break so ordering can't flip on a
    last ulp."""
    from cdc_via_flink_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tk = d.select(
        F.when(
            F.substring(F.col("source"), 4, 10).cast("long") % 2 == 0, "A"
        )
        .otherwise("B")
        .alias("grp"),
        F.explode(tokens(F.col("text"))).alias("term"),
    ).filter(F.col("term") != "")
    c = tk.groupBy("term").agg(
        F.sum(F.when(F.col("grp") == "A", 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when(F.col("grp") == "B", 1).otherwise(0)).cast("long").alias("b"),
    )
    t = c.agg(
        F.sum("a").cast("long").alias("ta"), F.sum("b").cast("long").alias("tb")
    )
    a, b, ta, tb = (F.col(x) for x in ("a", "b", "ta", "tb"))
    ea = (a + b).cast("double") * ta / (ta + tb)
    eb = (a + b).cast("double") * tb / (ta + tb)
    g2 = 2.0 * (
        F.when(a > 0, a * F.log(a.cast("double") / ea)).otherwise(0.0)
        + F.when(b > 0, b * F.log(b.cast("double") / eb)).otherwise(0.0)
    )
    g = c.crossJoin(F.broadcast(t)).select(
        "term", "a", "b", F.round(g2, 6).alias("g2")
    )
    win = W.orderBy(F.col("g2").desc(), "term")
    return (
        g.select(
            "term",
            F.col("a").alias("count_a"),
            F.col("b").alias("count_b"),
            "g2",
            F.row_number().over(win).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 20)
    )


@query(
    "text_source_vocab_jaccard",
    oracle=f"""
WITH tk AS (
  SELECT DISTINCT source, unnest(string_split({SQL_NORM}, ' ')) AS term
  FROM documents
),
tkf AS (SELECT source, term FROM tk WHERE term <> ''),
v AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab FROM tkf GROUP BY source),
inter AS (
  SELECT a.source AS sa, b.source AS sb, CAST(count(*) AS BIGINT) AS i
  FROM tkf a JOIN tkf b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source
),
j AS (
  SELECT i.sa, i.sb, i.i, va.vocab AS va, vb.vocab AS vb,
         round(CAST(i.i AS DOUBLE) / (va.vocab + vb.vocab - i.i), 6) AS jaccard
  FROM inter i
  JOIN v va ON va.source = i.sa JOIN v vb ON vb.source = i.sb
),
r AS (
  SELECT sa, sb, i AS n_shared, va, vb, jaccard,
         row_number() OVER (ORDER BY jaccard DESC, sa, sb) AS rn
  FROM j
)
SELECT sa, sb, n_shared, va, vb, jaccard, CAST(rn AS BIGINT) AS rn
FROM r WHERE rn <= 20
""",
    tags=("X3", "vocab-overlap", "dedup-adjacent"),
)
def text_source_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOURCE VOCABULARY OVERLAP — pairwise Jaccard of the distinct
    term sets of every source pair, top-20: the corpus-composition
    audit that flags scraped mirrors / shared boilerplate BEFORE
    paying for document-level near-dup (two sources with 0.9 vocab
    Jaccard are the same crawl). The pair space is TERM-blocked: a
    term joins only the ≤|sources| sources containing it, so the join
    is df-bounded per term (the dedup blocking argument at the
    source grain), never |sources|² × vocab."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    tkf = (
        d.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    v = tkf.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    a = tkf.select(F.col("source").alias("sa"), "term")
    b = tkf.select(F.col("source").alias("sb"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).cast("long").alias("i"))
    )
    va = v.select(F.col("source").alias("sa"), F.col("vocab").alias("va"))
    vb = v.select(F.col("source").alias("sb"), F.col("vocab").alias("vb"))
    j = (
        inter.join(F.broadcast(va), "sa")
        .join(F.broadcast(vb), "sb")
        .select(
            "sa",
            "sb",
            F.col("i").alias("n_shared"),
            "va",
            "vb",
            F.round(
                F.col("i").cast("double") / (F.col("va") + F.col("vb") - F.col("i")),
                6,
            ).alias("jaccard"),
        )
    )
    w = W.orderBy(F.col("jaccard").desc(), "sa", "sb")
    return j.withColumn("rn", F.row_number().over(w).cast("long")).filter(
        F.col("rn") <= 20
    )


@query(
    "text_dataset_card",
    oracle=f"""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(length(text)) AS BIGINT) AS total_chars,
         CAST(sum(len(string_split({SQL_NORM}, ' '))) AS BIGINT) AS ws_tokens,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT md5({SQL_NORM})) AS BIGINT) AS n_distinct_texts
  FROM documents
),
tl AS (
  SELECT lang AS top_lang, CAST(count(*) AS BIGINT) AS top_n
  FROM documents GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1
)
SELECT base.n_docs, base.total_chars, base.ws_tokens, base.n_langs,
       base.n_sources,
       tl.top_lang,
       round(CAST(tl.top_n AS DOUBLE) / base.n_docs, 6) AS top_lang_share,
       round(CAST(base.n_distinct_texts AS DOUBLE) / base.n_docs, 6)
         AS distinct_text_ratio
FROM base CROSS JOIN tl
""",
    tags=("X3", "dataset-card", "corpus-summary"),
)
def text_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATASET CARD — the one-row corpus summary every published
    training set ships (docs, chars, whitespace tokens, language and
    source counts, majority-language share, exact-dedup ratio): the
    composition audit that fronts the deeper per-family queries
    (token stats, langid, dedup, quality). Three aggregates over one
    scan-shaped pipeline; the top-language row is a
    TakeOrderedAndProject over the ≤|langs| rollup."""
    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    base = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("total_chars"),
        F.sum(F.size(F.split(norm, " "))).cast("long").alias("ws_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct(F.md5(norm)).cast("long").alias("n_distinct_texts"),
    )
    tl = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).cast("long").alias("top_n"))
        .orderBy(F.col("top_n").desc(), "lang")
        .limit(1)
        .select(F.col("lang").alias("top_lang"), "top_n")
    )
    return base.crossJoin(F.broadcast(tl)).select(
        "n_docs",
        "total_chars",
        "ws_tokens",
        "n_langs",
        "n_sources",
        "top_lang",
        F.round(F.col("top_n").cast("double") / F.col("n_docs"), 6).alias(
            "top_lang_share"
        ),
        F.round(
            F.col("n_distinct_texts").cast("double") / F.col("n_docs"), 6
        ).alias("distinct_text_ratio"),
    )


@query(
    "text_length_percentiles",
    oracle="""
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN rn = (n + 9) // 10 THEN n_chars END) AS BIGINT)
         AS p10_chars,
       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN n_chars END) AS BIGINT)
         AS p50_chars,
       CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN n_chars END) AS BIGINT)
         AS p90_chars
FROM r GROUP BY lang
ORDER BY lang
""",
    tags=("X3", "corpus-stats", "percentiles"),
)
def text_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT LENGTH PERCENTILES per language (P10/P50/P90 of n_chars)
    — the truncation-budget numbers a tokenizer/packing config is
    sized from (q_pack_chunks' input distribution, per language).
    Discrete order statistics selected by row_number with a doc_id
    tie-break — exact integers, never interpolated floats (the
    q_mad_outliers rule); one lang-keyed rank window."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        "lang",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("n_chars", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )

    def sel(expr):
        return F.max(F.when(F.col("rn") == expr, F.col("n_chars"))).cast("long")

    n = F.col("n")
    return (
        r.groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            sel(F.floor((n + 9) / 10).cast("long")).alias("p10_chars"),
            sel(F.floor((n + 1) / 2).cast("long")).alias("p50_chars"),
            sel(F.floor((9 * n + 9) / 10).cast("long")).alias("p90_chars"),
        )
        .orderBy("lang")
    )


@query(
    "text_bm25_persisted_topk",
    oracle=None,  # set below: shares text_bm25_topk's oracle verbatim
    tags=("X3", "bm25", "retrieval", "index-persistence"),
)
def text_bm25_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL TEXT-SEARCH INDEX LIFECYCLE (the BM25 twin of
    sim_ivf_persisted_topk): build the inverted index, PERSIST it
    (term-bucket-partitioned postings + vocabulary df + doc lengths +
    corpus stats, operators/textindex.py), reload, probe — value-
    identical to the in-memory text_bm25_topk, so both share one
    oracle. The point at 100 TB: the probe's term buckets arrive as a
    STATIC PARTITION-PRUNING filter, so the scan reads only the query
    terms' bucket files (pinned in tests) — a three-term query never
    touches the rest of a trillion-posting index; term stats join
    broadcast; df comes from the persisted vocabulary table (computed
    FROM the persisted postings, so stats can never drift from the
    lists they describe)."""
    import os

    from cdc_via_flink_spark.operators.textindex import (
        probe_text_index,
        save_text_index,
    )

    d = load_table(spark, sf_dir, "documents")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    path = f"/root/repo/.tmp/bm25_index_{sf_name}"
    save_text_index(d, path)
    tf, df, dl, stats = probe_text_index(spark, path, BM25_TERMS)
    return _bm25_scored_topk(tf, df, dl, stats)


# value-identical faces share one oracle (the sim_ivf_persisted recipe)
from cdc_via_flink_spark.plans.registry import QUERIES as _Q  # noqa: E402

_Q["text_bm25_persisted_topk"].oracle = _Q["text_bm25_topk"].oracle


@query(
    "text_bm25_append_topk",
    oracle=None,  # set below: shares text_bm25_topk's oracle verbatim
    tags=("X3", "bm25", "retrieval", "index-maintenance", "streaming"),
)
def text_bm25_append_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING TEXT-INDEX MAINTENANCE, value-pinned (the BM25 twin
    of sim_ivf_append_topk): build the persisted inverted index over
    HALF the corpus (even doc_ids), stream the other half through the
    incremental maintainer (streaming/textindex_maintenance.py — the
    ELEVENTH index-kernel adapter) in TWO micro-batches — each batch
    tokenized into term-bucket-partitioned postings + doc lengths and
    committed as an atomic delta — then probe the maintained
    (base ∪ deltas) view. Because df and corpus stats are DERIVED
    from the merged index at probe time, the result must be
    value-identical to the monolithic text_bm25_topk: the oracle is
    shared, unchanged — a maintenance bug (lost delta, double-applied
    epoch, stale stats) breaks the hash."""
    import os
    import shutil as _sh

    from cdc_via_flink_spark.plans.streaming_queries import (
        STAGE_ROOT,
        _STAGED_DESTS,
        _stage_ordered_files,
    )
    from cdc_via_flink_spark.streaming.textindex_maintenance import (
        probe_maintained_text_index,
        save_streaming_text_index,
        text_maintenance_query,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    root = os.path.join(STAGE_ROOT, f"bm25_maint_{sf_name}")
    _sh.rmtree(root, ignore_errors=True)
    idx = os.path.join(root, "idx")
    ckpt = os.path.join(root, "ckpt")
    save_streaming_text_index(d.filter(F.col("doc_id") % 2 == 0), idx)
    strm = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", ((F.col("doc_id") / 2).cast("long") % 2).alias("ep")
    )
    frames = [
        strm.filter(F.col("ep") == k).select("doc_id", "text").orderBy("doc_id")
        for k in range(2)
    ]
    dest = os.path.join(root, "staged")
    _STAGED_DESTS.discard(dest)
    _stage_ordered_files(spark, frames, dest)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    q = text_maintenance_query(stream, idx, ckpt)
    q.awaitTermination()
    tf, df, dl, stats = probe_maintained_text_index(spark, idx, BM25_TERMS)
    return _bm25_scored_topk(tf, df, dl, stats)


_Q["text_bm25_append_topk"].oracle = _Q["text_bm25_topk"].oracle


_KAPPA_CHARS_T = 500  # rater A: doc length in chars
_KAPPA_TOKENS_T = 80  # rater B: doc length in tokens


@query(
    "text_cohens_kappa",
    oracle=f"""
WITH r AS (
  SELECT CASE WHEN n_chars >= {_KAPPA_CHARS_T} THEN 1 ELSE 0 END AS a,
         CASE WHEN len(string_split({SQL_NORM}, ' '))
                   >= {_KAPPA_TOKENS_T} THEN 1 ELSE 0 END AS b
  FROM documents
),
c AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(a * b) AS BIGINT) AS n11,
         CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
         CAST(sum((1 - a) * b) AS BIGINT) AS n01,
         CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
  FROM r
)
SELECT n, n11, n10, n01, n00,
       round(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
       round((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
              + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
             / (CAST(n AS DOUBLE) * n), 6) AS pe,
       round((CAST(n11 + n00 AS DOUBLE) / n
              - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                 + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                / (CAST(n AS DOUBLE) * n))
             / (1.0 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                       + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                      / (CAST(n AS DOUBLE) * n)), 6) AS kappa
FROM c
""",
    tags=("X3", "agreement", "kappa"),
)
def text_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA chance-corrected agreement between two heuristic
    document raters (char-length >= 500 vs token-length >= 80) — the
    annotation-QA statistic every labeling pipeline reports before
    trusting its filters: raw agreement p_o is inflated whenever both
    raters say "keep" to most docs; kappa subtracts the chance
    agreement p_e the marginals imply. Also the calibration check
    between two quality screens (high kappa => redundant, low =>
    measuring different things).

    One aggregation pass to the 2x2 contingency table (exact integer
    counts, map-side combinable); po/pe/kappa are a handful of
    identical double ops over those integers."""
    d = load_table(spark, sf_dir, "documents")
    a = F.when(F.col("n_chars") >= _KAPPA_CHARS_T, 1).otherwise(0)
    b = F.when(
        F.size(tokens(F.col("text"))) >= _KAPPA_TOKENS_T, 1
    ).otherwise(0)
    c = d.select(a.alias("a"), b.alias("b")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (1 - F.col("b"))).cast("long").alias("n10"),
        F.sum((1 - F.col("a")) * F.col("b")).cast("long").alias("n01"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("long").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")).cast("double") * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")).cast("double") * (F.col("n10") + F.col("n00"))
    ) / (nd * F.col("n"))
    return c.select(
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


_NEG_ALPHA = "0.75"  # unigram temperature (word2vec/GloVe convention)
_NEG_TOPK = 20


@query(
    "text_negative_sampling_table",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split({SQL_NORM}, ' ')) AS term FROM documents
),
c AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE term <> '' GROUP BY term
),
w AS MATERIALIZED (
  SELECT term, cnt,
         CAST(round(power(CAST(cnt AS DOUBLE), {_NEG_ALPHA}), 9)
              AS DECIMAL(28,9)) AS wgt
  FROM c
),
z AS (SELECT CAST(sum(wgt) AS DOUBLE) AS z,
             CAST(count(*) AS BIGINT) AS vocab FROM w),
ent AS (
  SELECT CAST(sum(CAST(round(
           -(CAST(wgt AS DOUBLE) / (SELECT z FROM z))
             * log2(CAST(wgt AS DOUBLE) / (SELECT z FROM z)), 12)
           AS DECIMAL(28,12))) AS DOUBLE) AS h
  FROM w
)
SELECT w.term, w.cnt,
       round(CAST(w.wgt AS DOUBLE) / z.z, 9) AS p_neg,
       z.vocab,
       round(power(2.0, (SELECT h FROM ent)), 2) AS effective_vocab
FROM w CROSS JOIN z
ORDER BY w.cnt DESC, w.term
LIMIT {_NEG_TOPK}
""",
    tags=("X3", "sampling", "word2vec"),
)
def text_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATIVE-SAMPLING DISTRIBUTION (word2vec/GloVe unigram^0.75):
    per-term sampling probability p_i = c_i^0.75 / sum c^0.75 — the
    temperature that down-weights stopwords and up-weights the tail —
    for the corpus vocabulary, reporting the top-20 most-sampled
    terms plus the distribution's EFFECTIVE VOCABULARY 2^H (how many
    'equally likely' negatives the table really offers; raw vocab vs
    effective vocab is the skew diagnostic that decides whether 0.75
    is the right temperature for this corpus).

    Scale shape: one token explode into a vocab-key aggregate
    (map-side combinable); weights rounded to 9 dp and DECIMAL-folded
    so the normalizer is association-order independent; the entropy
    fold reuses the -p*log2(p) rounded-12 recipe; top-k is
    TakeOrderedAndProject."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    c = tok.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    w = c.select(
        "term",
        "cnt",
        F.round(F.pow(F.col("cnt").cast("double"), float(_NEG_ALPHA)), 9)
        .cast("decimal(28,9)")
        .alias("wgt"),
    )
    z = w.agg(
        F.sum("wgt").cast("double").alias("z"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
    )
    pw = F.col("wgt").cast("double") / F.col("z")
    ent = (
        w.crossJoin(F.broadcast(z))
        .agg(
            F.sum(
                F.round(-pw * F.log2(pw), 12).cast("decimal(28,12)")
            )
            .cast("double")
            .alias("h")
        )
    )
    return (
        w.crossJoin(F.broadcast(z))
        .crossJoin(F.broadcast(ent))
        .select(
            "term",
            "cnt",
            F.round(pw, 9).alias("p_neg"),
            "vocab",
            F.round(F.pow(F.lit(2.0), F.col("h")), 2).alias("effective_vocab"),
        )
        .orderBy(F.col("cnt").desc(), "term")
        .limit(_NEG_TOPK)
    )


@query(
    "text_length_lognormal_fit",
    oracle="""
WITH l AS (
  SELECT CAST(round(ln(CAST(n_chars AS DOUBLE)), 12) AS DECIMAL(28,12)) AS lx,
         n_chars
  FROM documents WHERE n_chars > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(lx) AS DOUBLE) AS slx,
         CAST(sum(CAST(round(CAST(lx AS DOUBLE) * CAST(lx AS DOUBLE), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS slx2,
         CAST(sum(n_chars) AS BIGINT) AS schars
  FROM l
)
SELECT n,
       round(slx / n, 6) AS mu_log,
       round(sqrt(greatest(slx2 / n - (slx / n) * (slx / n), 0.0)), 6)
         AS sigma_log,
       round(exp(slx / n), 2) AS median_model,
       round(exp(slx / n
                 + greatest(slx2 / n - (slx / n) * (slx / n), 0.0) / 2), 2)
         AS mean_model,
       round(CAST(schars AS DOUBLE) / n, 2) AS mean_observed
FROM m
""",
    tags=("X3", "corpus-stats", "lognormal"),
)
def text_length_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOG-NORMAL FIT of document lengths by method of moments — the
    canonical corpus length model (web-text lengths are heavy-tailed;
    a normal fit under-budgets packing and over-trims filters):
    mu/sigma of ln(length), the implied model MEDIAN exp(mu) and MEAN
    exp(mu + sigma^2/2), next to the observed mean — the model-vs-
    observed mean gap is the heavy-tail diagnostic that calibrates
    q_pack_greedy's bin budget and the Gopher length filters.

    One aggregate pass; ln terms rounded to 12 dp and DECIMAL-folded.
    The squared term uses the repo's per-term rounding recipe (the
    q_markov_entropy_rate / PCA precedent): the product is computed in
    DOUBLE, rounded half-up to 12 dp, and cast DECIMAL(28,12) BEFORE
    the fold in BOTH engines — a raw (28,12)*(28,12) product would be
    rescaled to decimal(38,6) by Spark's allowPrecisionLoss while
    DuckDB keeps (38,24), so parity there was data luck, not by
    construction. Closed-form moments in identical doubles."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    lx = F.round(F.log(F.col("n_chars").cast("double")), 12).cast(
        "decimal(28,12)"
    )
    lx2 = F.round(
        F.col("lx").cast("double") * F.col("lx").cast("double"), 12
    ).cast("decimal(28,12)")
    m = d.select(lx.alias("lx"), "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("lx").cast("double").alias("slx"),
        F.sum(lx2).cast("double").alias("slx2"),
        F.sum("n_chars").cast("long").alias("schars"),
    )
    mu = F.col("slx") / F.col("n")
    v = F.greatest(F.col("slx2") / F.col("n") - mu * mu, F.lit(0.0))
    return m.select(
        "n",
        F.round(mu, 6).alias("mu_log"),
        F.round(F.sqrt(v), 6).alias("sigma_log"),
        F.round(F.exp(mu), 2).alias("median_model"),
        F.round(F.exp(mu + v / 2), 2).alias("mean_model"),
        F.round(F.col("schars").cast("double") / F.col("n"), 2).alias(
            "mean_observed"
        ),
    )
