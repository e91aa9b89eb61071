"""Training-data pipeline declared queries (extension surface, driver
north-star "LLM-data-pipeline operators"; not in the reference —
its surface ends at CDC assembly, DebeziumTransactionReconstructor.java:131-170).

The corpus-preparation steps every large-scale training pipeline runs
between raw documents and a data loader:

- deterministic train/valid/test split (content-hash bucketing)
- stratified sampling with per-stratum rates (language rebalancing)
- sequence packing to a fixed token budget (chunked + greedy)
- single-pass column profiling (data-quality screen)
- term scrubbing / redaction accounting

Determinism policy: splits and samples hash ``md5(doc_id)`` and
compare a hex prefix against a rate threshold — reproducible across
engines (the DuckDB oracles use the identical expression), across
runs, and across cluster sizes; no RNG state, no ``rand()``. All of
these are map-side-only (no shuffle before the final small aggregate),
so they stream through a 100 TB scan at I/O speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from cdc_via_flink_spark.operators.packing import pack_greedy
from cdc_via_flink_spark.operators.sampling import hash_split
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import ensure_min_partitions, load_table

BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PACK_BUDGET = 2048
N_SHARDS = 4

# 2-hex-char md5 prefix < threshold ⇒ keep. 256 buckets; thresholds are
# exact bucket counts so rates are exactly k/256.
SPLIT_SQL = """CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
     ELSE 'test' END"""


from cdc_via_flink_spark.operators.sampling import hash_bucket as _bucket  # noqa: E402


@query(
    "q_split_train_test",
    oracle=f"""
SELECT {SPLIT_SQL} AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(CAST(sum(n_chars) AS DOUBLE) / count(*) AS DOUBLE) AS avg_chars
FROM documents
GROUP BY split
""",
    tags=("pipeline", "split"),
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 204/26/26-bucket (≈80/10/10) train/valid/test split
    by md5(doc_id) prefix. Map-side only: no shuffle until the 3-row
    aggregate; at 100 TB this is a pure scan + partial agg."""
    d = load_table(spark, sf_dir, "documents")
    d = hash_split(d, "doc_id", {"train": 204, "valid": 26, "test": 26})
    return (
        d.select("split", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        )
    )


@query(
    "q_stratified_sample",
    oracle="""
WITH k AS (
  SELECT lang,
         substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 2)
           < (CASE WHEN lang = 'en' THEN '40' ELSE 'c0' END) AS keep
  FROM documents
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
         AS kept_frac
FROM k GROUP BY lang
""",
    tags=("pipeline", "sample"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (rebalance an
    en-heavy corpus: keep 64/256 of 'en', 192/256 of the rest) using a
    salted hash so the sample is independent of the split buckets.
    Unlike ``df.sampleBy`` (RNG per task, irreproducible across
    retries/cluster sizes), the hash filter is exactly reproducible —
    the property a data-lineage audit needs. The filtering form of
    this operator is ``operators.sampling.stratified_sample``; this
    query keeps the pre-filter rows so it can report kept_frac."""
    d = load_table(spark, sf_dir, "documents")
    thr = F.when(F.col("lang") == "en", "40").otherwise("c0")
    keep = (_bucket(F.col("doc_id"), "s:") < thr).alias("keep")
    return (
        d.select("lang", keep)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.round(
                F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("kept_frac"),
        )
    )


@query(
    "q_pack_chunks",
    oracle=f"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS tokens
  FROM documents
), c AS (
  SELECT lang, doc_id, tokens,
         sum(tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - tokens AS prev_cum
  FROM t
)
SELECT lang, CAST(prev_cum // {PACK_BUDGET} AS BIGINT) AS bin,
       count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM c GROUP BY lang, bin
""",
    tags=("pipeline", "packing"),
    bench=True,
)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, chunked strategy: a document lands in bin
    floor(preceding-cumulative-tokens / budget) within its language,
    ordered by doc_id. Pure window expression — whole-stage codegen,
    one shuffle on lang. (Greedy exact-budget variant: q_pack_greedy.)

    Scale note: the per-lang window serializes each language onto one
    task (5 langs → 5 tasks). At 100 TB, compute the same global
    cumulative sum as a two-pass prefix sum — per-range partial sums
    on doc_id ranges, then broadcast the per-range offsets — or shard
    like q_pack_greedy when contiguity across shards isn't required."""
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).cast("long")
    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    c = d.select("lang", "doc_id", toks.alias("tokens")).withColumn(
        "prev_cum", F.sum("tokens").over(w) - F.col("tokens")
    )
    return (
        c.select("lang", F.expr(f"prev_cum div {PACK_BUDGET}").alias("bin"), "tokens")
        .groupBy("lang", "bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("bin_tokens"))
    )


@query(
    "q_pack_greedy",
    oracle=f"""
WITH RECURSIVE t AS (
  SELECT lang, doc_id % {N_SHARDS} AS shard, doc_id,
         CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS tokens,
         row_number() OVER (PARTITION BY lang, doc_id % {N_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents
), pack AS (
  SELECT lang, shard, tokens, rn, CAST(0 AS BIGINT) AS bin, tokens AS fill
  FROM t WHERE rn = 1
  UNION ALL
  SELECT t.lang, t.shard, t.tokens, t.rn,
         CASE WHEN p.fill + t.tokens <= {PACK_BUDGET} THEN p.bin ELSE p.bin + 1 END,
         CASE WHEN p.fill + t.tokens <= {PACK_BUDGET} THEN p.fill + t.tokens
              ELSE t.tokens END
  FROM pack p JOIN t ON t.lang = p.lang AND t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT lang, shard, bin, count(*) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS bin_tokens
FROM pack GROUP BY lang, shard, bin
""",
    tags=("pipeline", "packing"),
)
def q_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, greedy first-fit-in-order (operators/packing.py):
    close a bin exactly when the next doc would overflow the budget — a
    sequential scan with reset that SQL windows can't express, run as
    applyInPandas per (lang, shard). The DuckDB oracle replays the same
    scan as a recursive CTE, so this Python-boundary operator is still
    exactly hash-verified. Only (lang, shard, doc_id, tokens) crosses
    the Arrow boundary — tokenization stays JVM-side."""
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)).cast("long")
    slim = d.select(
        "lang",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        "doc_id",
        toks.alias("tokens"),
    )
    packed = pack_greedy(slim, size_col="tokens", budget=PACK_BUDGET)
    return packed.groupBy("lang", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tokens").alias("bin_tokens")
    )


_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


@query(
    "q_column_profile",
    oracle="""
WITH a AS (
  SELECT count(*) AS n,
         count(o_orderkey) AS c_ok, count(DISTINCT o_orderkey) AS d_ok,
         CAST(min(o_orderkey) AS DOUBLE) AS mn_ok, CAST(max(o_orderkey) AS DOUBLE) AS mx_ok,
         count(o_custkey) AS c_ck, count(DISTINCT o_custkey) AS d_ck,
         CAST(min(o_custkey) AS DOUBLE) AS mn_ck, CAST(max(o_custkey) AS DOUBLE) AS mx_ck,
         count(o_totalprice) AS c_tp, count(DISTINCT o_totalprice) AS d_tp,
         min(o_totalprice) AS mn_tp, max(o_totalprice) AS mx_tp,
         count(o_orderstatus) AS c_os, count(DISTINCT o_orderstatus) AS d_os,
         count(o_orderpriority) AS c_op, count(DISTINCT o_orderpriority) AS d_op
  FROM orders
)
SELECT 'o_orderkey' AS col_name, n - c_ok AS n_nulls, d_ok AS n_distinct,
       mn_ok AS min_num, mx_ok AS max_num FROM a
UNION ALL SELECT 'o_custkey', n - c_ck, d_ck, mn_ck, mx_ck FROM a
UNION ALL SELECT 'o_totalprice', n - c_tp, d_tp, mn_tp, mx_tp FROM a
UNION ALL SELECT 'o_orderstatus', n - c_os, d_os, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
UNION ALL SELECT 'o_orderpriority', n - c_op, d_op, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM a
""",
    tags=("pipeline", "profile"),
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of ``orders`` in one scan: null
    count, exact distinct count, numeric min/max per column, unpivoted
    to one row per column via ``stack``. Exact multi-column DISTINCT
    costs one Expand (rows × #distinct-aggs) before the partial agg —
    the 100 TB variant swaps in approx_count_distinct (HLL, no Expand);
    exact is kept here because the oracle gate hashes values."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs.append(F.count(c).alias(f"c_{c}"))
        aggs.append(F.countDistinct(c).alias(f"d_{c}"))
    for c in _PROFILE_NUM:
        aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
        aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
    a = o.agg(*aggs)
    rows = []
    for c in _PROFILE_NUM:
        rows.append(f"'{c}', n - c_{c}, d_{c}, mn_{c}, mx_{c}")
    for c in _PROFILE_STR:
        rows.append(f"'{c}', n - c_{c}, d_{c}, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)")
    stack = f"stack({len(rows)}, {', '.join(rows)}) AS (col_name, n_nulls, n_distinct, min_num, max_num)"
    return a.selectExpr(stack)


REDACT_RE = r"\b(customer|key|value)\b"


@query(
    "text_redact_terms",
    oracle=f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '{REDACT_RE}') THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_hit,
       CAST(sum(len(regexp_extract_all(text, '{REDACT_RE}')))
            AS BIGINT) AS n_redactions,
       CAST(sum(length(text)
                - length(regexp_replace(text, '{REDACT_RE}', '#', 'g')))
            AS BIGINT) AS chars_removed
FROM documents GROUP BY lang
""",
    tags=("X3", "pipeline", "redact"),
)
def text_redact_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term scrubbing / redaction accounting (the PII-removal shape:
    pattern → replace-all → audit counts). The fixture corpus has no
    digits or emails, so the pattern targets a term blocklist; the
    plumbing (regexp_extract_all + global regexp_replace, both
    Java-regex/RE2-portable) is the real surface. Map-side only."""
    d = load_table(spark, sf_dir, "documents")
    hits = F.size(F.regexp_extract_all(F.col("text"), F.lit(REDACT_RE), 0)).cast("long")
    removed = (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), REDACT_RE, "#"))
    ).cast("long")
    return (
        d.select(
            "lang",
            hits.alias("hits"),
            removed.alias("removed"),
            (hits > 0).cast("int").alias("hit"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("hit").cast("bigint").alias("docs_hit"),
            F.sum("hits").alias("n_redactions"),
            F.sum("removed").alias("chars_removed"),
        )
    )


from cdc_via_flink_spark.plans.text_queries import SQL_NORM  # noqa: E402


@query(
    "text_vocab_coverage",
    oracle=f"""
WITH tok AS (
  SELECT lang, unnest(string_split({SQL_NORM}, ' ')) AS w FROM documents
),
freq AS (
  SELECT w, count(*) AS n FROM tok GROUP BY w
),
vocab AS (
  SELECT w FROM freq ORDER BY n DESC, w LIMIT 32
)
SELECT t.lang,
       count(*) AS n_tokens,
       CAST(sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS covered,
       round(CAST(sum(CASE WHEN v.w IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS coverage
FROM tok t LEFT JOIN vocab v ON t.w = v.w
GROUP BY t.lang
""",
    tags=("X3", "pipeline", "vocab"),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction + coverage: build the corpus-global
    top-32 token vocabulary (frequency desc, token-text tie-break —
    fully deterministic) and measure per-language coverage (share of
    token occurrences in-vocab; the complement is the OOV rate a
    tokenizer design cares about). The vocab is a tiny broadcast; the
    token stream is never shuffled except for the frequency agg."""
    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    from cdc_via_flink_spark.functions.text import tokens

    tok = d.select("lang", F.explode(tokens(F.col("text"))).alias("w"))
    vocab = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(32)
        .select(F.col("w").alias("vw"))
    )
    return (
        tok.join(F.broadcast(vocab), tok.w == vocab.vw, "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("vw").isNotNull(), 1).otherwise(0)).alias("covered"),
            F.round(
                F.sum(F.when(F.col("vw").isNotNull(), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("coverage"),
        )
    )


@query(
    "q_split_leakage",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         md5({SQL_NORM}) AS digest,
         {SPLIT_SQL} AS split
  FROM documents
),
tr AS (
  SELECT digest, count(*) AS n_train FROM d WHERE split = 'train' GROUP BY digest
)
SELECT te.lang,
       count(*) AS n_test_docs,
       CAST(sum(coalesce(tr.n_train, 0)) AS BIGINT) AS leaked_pairs,
       CAST(sum(CASE WHEN tr.n_train IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS leaked_test_docs
FROM d te LEFT JOIN tr ON te.digest = tr.digest
WHERE te.split = 'test'
GROUP BY te.lang
""",
    tags=("pipeline", "contamination", "X1"),
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination REPORT: per test-doc language, how
    many test-split documents share a normalized-text digest with a
    train-split document (exact leakage — the eval-integrity gate
    every pre-training pipeline needs after splitting a corpus with
    duplicates). Emits one row per language with test docs — a
    zero-leak corpus reports zeros rather than an empty frame (the r7
    inner-join form was vacuous below sf0.1: the sf0.01 fixture has no
    exact-duplicate texts at all, so NO threshold could fire —
    VERDICT r7 #5; an audit whose clean result is "no rows" cannot
    distinguish "clean" from "broken"). The train side reduces to
    DISTINCT digests + multiplicity first, so the join carries one row
    per digest; at 100 TB the join keys are uniform 128-bit hashes
    (no skew) and the per-digest counts make leaked_pairs exact
    without a pair-level materialization."""
    d = load_table(spark, sf_dir, "documents")
    from cdc_via_flink_spark.functions.text import normalize_text

    d = hash_split(d, "doc_id", {"train": 204, "valid": 26, "test": 26}).select(
        "doc_id", "lang", "split", F.md5(normalize_text(F.col("text"))).alias("digest")
    )
    tr = (
        d.filter(F.col("split") == "train")
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_train"))
    )
    te = d.filter(F.col("split") == "test")
    return (
        te.join(tr, "digest", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_test_docs"),
            F.sum(F.coalesce(F.col("n_train"), F.lit(0)))
            .cast("bigint")
            .alias("leaked_pairs"),
            F.sum(F.when(F.col("n_train").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("leaked_test_docs"),
        )
    )


@query(
    "q_weighted_sample",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split({SQL_NORM}, ' ')) AS n_words
  FROM documents
),
w AS (
  SELECT doc_id, lang, n_words,
         least(255, CAST(floor(CAST(n_words AS DOUBLE) * 256.0 / 60.0) AS INT)) AS thr_i
  FROM d
)
SELECT lang,
       count(*) AS n_total,
       CAST(sum(CASE WHEN substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 2)
                     < printf('%02x', thr_i) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(n_words) AS BIGINT) AS total_words
FROM w GROUP BY lang
""",
    tags=("pipeline", "sample", "weighted"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling, RNG-free: each document's keep probability
    is proportional to its own weight (here length: P(keep) =
    min(n_words/60, 255/256)), decided by comparing the salted md5
    bucket against a per-row threshold rendered as hex. Longer docs
    are kept preferentially — the quality-weighted downsample shape —
    while staying exactly reproducible across engines, retries, and
    cluster sizes, like the uniform samplers."""
    d = load_table(spark, sf_dir, "documents")
    from cdc_via_flink_spark.functions.text import tokens

    n_words = F.size(tokens(F.col("text")))
    thr_i = F.least(F.lit(255), F.floor(n_words.cast("double") * 256.0 / 60.0).cast("int"))
    keep = _bucket(F.col("doc_id"), "w:") < F.format_string("%02x", thr_i)
    return (
        d.select("lang", n_words.alias("n_words"), keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
            F.sum("n_words").cast("bigint").alias("total_words"),
        )
    )


@query(
    "q_domain_mixture_weights",
    oracle="""
WITH s AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY source
),
t AS (
  SELECT CAST(sum(n_chars) AS BIGINT) AS tot_chars,
         CAST(sum(CAST(sqrt(n_chars) AS DECIMAL(18,6))) AS DOUBLE) AS tot_w
  FROM s
)
SELECT s.source, s.n_docs, s.n_chars,
       round(CAST(s.n_chars AS DOUBLE) / t.tot_chars, 6) + 0.0 AS char_share,
       round(sqrt(s.n_chars) / t.tot_w, 6) + 0.0 AS mix_weight
FROM s, t
""",
    tags=("pipeline", "sampling", "mixture"),
)
def q_domain_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture (the standard pre-training
    source-balancing op): each source's sampling weight is its char
    share raised to alpha=0.5, renormalized — upweights small domains,
    damps giant ones. With alpha=0.5 the total cancels algebraically
    (sqrt(share_i)/sum sqrt(share_j) = sqrt(chars_i)/sum sqrt(chars_j))
    so the weight needs only per-source char counts. Two tiny stages:
    per-source aggregate, then a 1-row total broadcast-cross-joined
    back. The weight denominator sums DECIMAL-cast sqrt values (parity
    policy: association-order independent at any cluster size)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    t = s.agg(
        F.sum("n_chars").cast("bigint").alias("tot_chars"),
        F.sum(F.sqrt(F.col("n_chars")).cast("decimal(18,6)"))
        .cast("double")
        .alias("tot_w"),
    )
    return s.join(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_chars",
        (
            F.round(F.col("n_chars").cast("double") / F.col("tot_chars"), 6) + 0.0
        ).alias("char_share"),
        (
            F.round(F.sqrt(F.col("n_chars")) / F.col("tot_w"), 6) + 0.0
        ).alias("mix_weight"),
    )


_SQL_NORM_DOC = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


@query(
    "q_corpus_build",
    oracle=f"""
WITH q AS (
  SELECT doc_id, lang, text, {_SQL_NORM_DOC} AS norm
  FROM documents
  WHERE n_chars >= 100 AND len(string_split({_SQL_NORM_DOC}, ' ')) >= 20
),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(norm)
),
k AS (
  SELECT q.doc_id, q.lang, q.text, {SPLIT_SQL} AS split
  FROM q JOIN keepers USING (doc_id)
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT) AS total_tokens
FROM k GROUP BY split, lang
""",
    tags=("pipeline", "composite", "X1", "X3"),
)
def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus build — the composition every pre-training
    data pipeline runs, as ONE declared oracle-checked query:
    quality screen (length + min word count) → exact near-dup removal
    (normalized-text digest, keep lowest doc_id) → deterministic
    train/valid/test split → per-(split, lang) doc and BPE-token
    accounting. Plan at 100 TB: one scan feeding a map-side filter,
    one digest-keyed shuffle for the keeper election, one doc_id
    equi-join back (both sides hash-partitioned on a uniform key —
    no skew), then a map-side split label and a tiny final aggregate.
    No UDFs anywhere; the whole composition is Catalyst-visible, so
    filters prune columns down to (doc_id, lang, text, n_chars) at
    the parquet scan."""
    from cdc_via_flink_spark.functions.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    q = (
        d.filter(F.col("n_chars") >= 100)
        .select(
            "doc_id", "lang", "text", normalize_text(F.col("text")).alias("norm")
        )
        .filter(F.size(F.split(F.col("norm"), " ")) >= 20)
    )
    keepers = (
        q.groupBy(F.md5(F.col("norm")).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    k = hash_split(q.join(keepers, "doc_id"), "doc_id",
                   {"train": 204, "valid": 26, "test": 26})
    return k.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)))
        .cast("bigint")
        .alias("total_tokens"),
    )


@query(
    "q_ngram_contamination",
    oracle=f"""
WITH base AS (
  SELECT doc_id, lang, {SPLIT_SQL} AS split,
         string_split({_SQL_NORM_DOC}, ' ') AS tk
  FROM documents
),
g AS (
  SELECT DISTINCT doc_id, lang, split,
         unnest(list_transform(range(1, greatest(len(tk) - 7, 1) + 1),
                               i -> array_to_string(tk[i:i+7], ' '))) AS gram
  FROM base
),
tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
pd AS (
  SELECT g.doc_id, g.lang,
         count(*) AS n_grams,
         sum(CASE WHEN tr.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM g LEFT JOIN tr ON g.gram = tr.gram
  WHERE g.split = 'test'
  GROUP BY g.doc_id, g.lang
)
SELECT lang,
       count(*) AS n_test_docs,
       CAST(sum(CASE WHEN n_hit * 2 >= n_grams THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(sum(n_hit) AS BIGINT) AS total_hits,
       round(CAST(sum(n_hit) AS DOUBLE) / sum(n_grams), 6) + 0.0 AS overlap_frac
FROM pd GROUP BY lang
""",
    tags=("pipeline", "contamination", "X1", "X3"),
)
def q_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination screen on word 8-grams (the GPT-3
    appendix-C recipe, grams instead of exact digests — catches
    partial/embedded contamination that q_split_leakage's whole-doc
    digest cannot): for every test-split document, the fraction of its
    distinct 8-grams that occur anywhere in the train split; flag docs
    with >=50% overlap. Scale shape: shingling is map-side (one pass,
    no UDFs), both join sides reduce to DISTINCT grams first, and the
    join is a plain equi-join on the gram key — uniformly distributed,
    so it shuffles cleanly; at 100 TB the gram strings would be
    replaced by 64-bit hashes on both sides (same plan, narrower
    shuffle), which the docstring records as the deployment variant."""
    from cdc_via_flink_spark.functions.text import shingles_from_tokens, tokens

    d = hash_split(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        {"train": 204, "valid": 26, "test": 26},
    )
    t = d.select("doc_id", "lang", "split", tokens(F.col("text")).alias("tk"))
    g = t.select(
        "doc_id",
        "lang",
        "split",
        F.explode(shingles_from_tokens(F.col("tk"), 8)).alias("gram"),
    ).distinct()
    te = g.filter(F.col("split") == "test")
    tr = g.filter(F.col("split") == "train").select("gram").distinct()
    j = te.join(tr.withColumn("hit", F.lit(1)), "gram", "left")
    per_doc = j.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.sum(F.when(F.col("n_hit") * 2 >= F.col("n_grams"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
        F.sum("n_hit").cast("bigint").alias("total_hits"),
        (
            F.round(
                F.sum("n_hit").cast("double") / F.sum("n_grams"), 6
            )
            + 0.0
        ).alias("overlap_frac"),
    )


# --------------------------------------------------------------------------
# Round-4 pipeline widening: retrieval-prep chunking and
# mixture APPLICATION (weights -> deterministic resampled corpus).
# --------------------------------------------------------------------------

_CHUNK_W = 16  # window tokens
_CHUNK_S = 12  # stride tokens (overlap = W - S = 4)


@query(
    "q_chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents
),
n AS (
  SELECT doc_id, tk, len(tk) AS n,
         CASE WHEN len(tk) <= {_CHUNK_W} THEN 1
              ELSE (len(tk) - {_CHUNK_W} + {_CHUNK_S} - 1) // {_CHUNK_S} + 1
         END AS n_chunks
  FROM t
),
e AS (
  SELECT doc_id, tk, unnest(range(0, n_chunks)) AS c FROM n
)
SELECT doc_id,
       CAST(c AS BIGINT) AS chunk_id,
       CAST(len(tk[c*{_CHUNK_S}+1 : c*{_CHUNK_S}+{_CHUNK_W}]) AS BIGINT)
         AS n_tokens,
       md5(array_to_string(tk[c*{_CHUNK_S}+1 : c*{_CHUNK_S}+{_CHUNK_W}], ' '))
         AS chunk_fp
FROM e
""",
    tags=("pipeline", "chunking", "rag"),
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the retrieval/RAG prep
    twin of sequence packing (q_pack_chunks packs whole docs into
    budgets; this SPLITS each doc into W=16-token windows at stride
    S=12, 4-token overlap, so retrieval context never loses a
    boundary sentence). Pure higher-order expressions: tokens →
    sequence(0, n_chunks-1) → posexplode → slice; map-side only, zero
    shuffles — at 100 TB chunking runs at scan speed and the chunk
    count is exactly ceil((n-W)/S)+1 per doc. Chunk content is
    declared as its md5 fingerprint (cheap to hash-compare
    cross-engine, stable to resplitting)."""
    d = load_table(spark, sf_dir, "documents")
    from cdc_via_flink_spark.functions.text import tokens

    t = d.select("doc_id", tokens(F.col("text")).alias("tk"))
    n = F.size("tk")
    n_chunks = F.when(n <= _CHUNK_W, F.lit(1)).otherwise(
        F.floor((n - _CHUNK_W + _CHUNK_S - 1) / _CHUNK_S) + 1
    )
    e = t.select(
        "doc_id",
        "tk",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("c"),
    )
    w = F.slice("tk", F.col("c") * _CHUNK_S + 1, _CHUNK_W)
    return e.select(
        "doc_id",
        F.col("c").cast("long").alias("chunk_id"),
        F.size(w).cast("long").alias("n_tokens"),
        F.md5(F.array_join(w, " ")).alias("chunk_fp"),
    )


@query(
    "q_mixture_resample",
    oracle="""
WITH s AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
t AS (
  SELECT CAST(sum(chars) AS BIGINT) AS tot_chars,
         CAST(sum(CAST(sqrt(chars) AS DECIMAL(18,6))) AS DOUBLE) AS tot_w
  FROM s
),
k AS (
  SELECT s.source, s.n_docs, s.chars,
         CAST(least(256, floor(
           0.5 * t.tot_chars / (t.tot_w * sqrt(s.chars)) * 256
         )) AS INT) AS k256
  FROM s, t
),
kept AS (
  SELECT d.source, d.doc_id, d.n_chars
  FROM documents d JOIN k ON d.source = k.source
  WHERE substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 2)
        < CASE WHEN k.k256 >= 256 THEN 'zz'
               ELSE lower(lpad(hex(k.k256), 2, '0')) END
)
SELECT k.source, k.n_docs, CAST(k.k256 AS BIGINT) AS k256,
       count(kept.doc_id) AS n_kept,
       CAST(coalesce(sum(kept.n_chars), 0) AS BIGINT) AS kept_chars
FROM k LEFT JOIN kept ON k.source = kept.source
GROUP BY k.source, k.n_docs, k.k256
""",
    tags=("pipeline", "sampling", "mixture"),
)
def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the temperature mixture (q_domain_mixture_weights
    computes the weights; this materializes the resampled corpus):
    each source is downsampled at a DATA-DERIVED rate k/256 chosen so
    expected sampled chars track the alpha=0.5 weight at half the
    corpus budget — and the sampling itself is the deterministic
    md5-bucket filter (never rand(): reproducible under retries,
    repartitioning and cluster resizes, and the DuckDB oracle states
    the identical expression). Shape: per-source aggregate → 1-row
    broadcast → map-side filter; the only shuffle is the final
    per-source count. Rates computed with one fixed expression order
    so both engines produce bit-identical doubles before floor()."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars"),
    )
    t = s.agg(
        F.sum("chars").cast("bigint").alias("tot_chars"),
        F.sum(F.sqrt(F.col("chars")).cast("decimal(18,6)"))
        .cast("double")
        .alias("tot_w"),
    )
    k = s.join(F.broadcast(t)).select(
        "source",
        "n_docs",
        "chars",
        F.least(
            F.lit(256),
            F.floor(
                F.lit(0.5)
                * F.col("tot_chars")
                / (F.col("tot_w") * F.sqrt(F.col("chars")))
                * 256
            ),
        )
        .cast("int")
        .alias("k256"),
    )
    thr = F.when(F.col("k256") >= 256, F.lit("zz")).otherwise(
        F.lower(F.lpad(F.hex(F.col("k256")), 2, "0"))
    )
    kept = (
        d.join(F.broadcast(k.select("source", "k256")), "source")
        .filter(_bucket(F.col("doc_id"), "mix:") < thr)
        .select("source", "doc_id", "n_chars")
    )
    agg = kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    )
    return (
        k.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            F.col("k256").cast("long").alias("k256"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0)).cast("bigint").alias("kept_chars"),
        )
    )


from cdc_via_flink_spark.plans.dedup_queries import _LSH_ORACLE  # noqa: E402


@query(
    "q_corpus_build_v2",
    bench2=True,
    oracle=f"""
WITH nd AS (SELECT DISTINCT id_b AS doc_id FROM ({_LSH_ORACLE})),
tok AS (
  SELECT doc_id, unnest(string_split({_SQL_NORM_DOC}, ' ')) AS t
  FROM documents
),
cnt AS (SELECT t, count(*) AS c FROM tok GROUP BY t),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS tc, count(*) AS v FROM cnt),
nll AS (
  SELECT tk.doc_id,
         CAST(sum(CAST(round(-ln((c.c + 1.0) / (tot.tc + tot.v)), 6)
                       AS DECIMAL(28,6))) AS DOUBLE)
         / count(*) AS doc_nll
  FROM tok tk JOIN cnt c ON c.t = tk.t CROSS JOIN tot
  GROUP BY tk.doc_id
),
thr AS (
  SELECT CAST(sum(CAST(round(doc_nll, 6) AS DECIMAL(28,6))) AS DOUBLE)
         / count(*) + 0.5 AS mx
  FROM nll
),
q AS (
  SELECT d.doc_id, d.lang, d.text, {_SQL_NORM_DOC} AS norm
  FROM documents d
  JOIN nll ON nll.doc_id = d.doc_id CROSS JOIN thr
  WHERE d.n_chars >= 100
    AND len(string_split({_SQL_NORM_DOC}, ' ')) >= 20
    AND nll.doc_nll <= thr.mx
    AND d.doc_id NOT IN (SELECT doc_id FROM nd)
),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(norm)
),
k AS (
  SELECT q.doc_id, q.lang, q.text, {SPLIT_SQL} AS split
  FROM q JOIN keepers USING (doc_id)
)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '{BPE_RE}'))) AS BIGINT) AS total_tokens
FROM k GROUP BY split, lang
""",
    tags=("pipeline", "composite", "X1", "X3", "quality"),
)
def q_corpus_build_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus build, second generation — q_corpus_build plus the two
    round-4 signals, still ONE oracle-checked composition:
    quality screen (length + word count) → PERPLEXITY GATE (drop docs
    whose unigram-LM NLL exceeds the corpus mean + 0.5 nats — the
    CCNet-style filter, threshold data-derived so no magic constant)
    → NEAR-DUP removal (MinHash-LSH verified pairs, drop the higher
    id) → exact-dedup keeper election → deterministic split →
    per-(split, lang) accounting.

    Scale: the new stages add one broadcastable LM dim + one
    anti-join against the collision-bounded near-dup id set; the
    perplexity scoring reuses the map-side join shape of
    text_unigram_ppl_buckets. Everything stays Catalyst-visible."""
    from cdc_via_flink_spark.functions.text import normalize_text, tokens
    from cdc_via_flink_spark.operators.dedup import minhash_lsh_neardup
    from cdc_via_flink_spark.plans.dedup_queries import (
        BANDS,
        JACCARD_T,
        NUM_HASHES,
        ROWS,
    )

    d = load_table(spark, sf_dir, "documents")
    nd = (
        minhash_lsh_neardup(d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("t"))
    cnt = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("tc"), F.count(F.lit(1)).alias("v"))
    # r12: per-token NLL precomputed on the model-sized LM frame (the
    # text_nb_classify / text_unigram_ppl_buckets recipe) — the corpus
    # scoring pass sums a joined decimal, no per-row log/round/cast
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
        .groupBy("doc_id")
        .agg(
            (
                F.sum("nll_t").cast("double") / F.count(F.lit(1))
            ).alias("doc_nll")
        )
    )
    thr = nll.agg(
        (
            F.sum(F.round("doc_nll", 6).cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
            + F.lit(0.5)
        ).alias("mx")
    )
    q = (
        d.filter(F.col("n_chars") >= 100)
        .join(nll, "doc_id")
        .crossJoin(F.broadcast(thr))
        .filter(F.col("doc_nll") <= F.col("mx"))
        # near-dup anti-join as SHUFFLED HASH (r13, guide §3.1): the
        # nd id set is the smaller aggregated side and LeftAnti
        # BuildRight is SHJ-eligible — drops the two per-side sorts
        # the default SortMergeJoin pays. Same rows by definition.
        .join(nd.hint("shuffle_hash"), "doc_id", "left_anti")
        .select("doc_id", "lang", "text", normalize_text(F.col("text")).alias("norm"))
        .filter(F.size(F.split(F.col("norm"), " ")) >= 20)
    )
    # keeper election as ONE window over q (r12, guide §2.4): the
    # groupBy+self-join form evaluated the whole q subtree (perplexity
    # join + near-dup anti-join + normalize_text) twice — min(doc_id)
    # over the digest partition elects the identical keeper set from a
    # single evaluation (interleaved A/B at sf0.1: old 4.94 s vs new
    # 4.61 s warm, 15.2 vs 8.8 cold; outputs verified equal row-set)
    keep = (
        q.withColumn(
            "_mn", F.min("doc_id").over(W.partitionBy(F.md5(F.col("norm"))))
        )
        .filter(F.col("doc_id") == F.col("_mn"))
        .drop("_mn")
    )
    k = hash_split(keep, "doc_id", {"train": 204, "valid": 26, "test": 26})
    return k.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_RE), 0)))
        .cast("bigint")
        .alias("total_tokens"),
    )


@query(
    "q_mixture_epochs",
    oracle="""
WITH s AS (
  SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
  FROM documents GROUP BY source
),
m AS (SELECT max(chars) AS mx FROM s),
k AS (
  SELECT s.source, s.n_docs, s.chars,
         least(3.0, sqrt(CAST(m.mx AS DOUBLE) / s.chars)) AS epochs
  FROM s CROSS JOIN m
),
p AS (
  SELECT source, n_docs, epochs,
         CAST(floor(epochs) AS BIGINT) AS base,
         CAST(floor((epochs - floor(epochs)) * 256) AS BIGINT) AS thr
  FROM k
),
rep AS (
  SELECT d.doc_id, d.source, d.n_chars,
         p.base + CASE WHEN CAST(('0x' || substr(md5('ep' || CAST(d.doc_id AS VARCHAR)), 1, 2)) AS BIGINT) < p.thr
                       THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN p ON d.source = p.source
),
ex AS (
  SELECT doc_id, source, n_chars,
         unnest(range(1, n_copies + 1)) AS copy_idx
  FROM rep
)
SELECT ex.source,
       p.n_docs AS n_docs_in,
       round(p.epochs, 6) AS epochs,
       count(*) AS n_docs_out,
       CAST(sum(ex.n_chars) AS BIGINT) AS chars_out,
       round(CAST(count(*) AS DOUBLE) / p.n_docs, 6) AS achieved_epochs
FROM ex JOIN p ON ex.source = p.source
GROUP BY ex.source, p.n_docs, p.epochs
""",
    tags=("pipeline", "mixture", "epochs"),
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UP-sampling mixture — per-source EPOCH factors applied by
    deterministic repetition (the complement of q_mixture_resample's
    down-sampling): smaller sources train for more epochs
    (inverse-size temperature, capped at 3.0), with the FRACTIONAL
    part realized per doc via the md5-bucket trick — doc repeated
    floor(e) times plus one extra copy iff its salted bucket falls
    below frac(e)·256. RNG-free, restart-stable, and exactly the
    Llama-style 'epochs per source' data recipe. The copies are
    MATERIALIZED (distributed sequence explode — a real up-sampled
    corpus, not just bookkeeping) and re-aggregated per source with
    achieved vs target epoch rates.

    Scale: the per-source epoch table is tiny (broadcast); repetition
    is a map-side explode; one final small aggregate."""
    from cdc_via_flink_spark.operators.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    m = s.agg(F.max("chars").alias("mx"))
    k = s.crossJoin(F.broadcast(m)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(3.0), F.sqrt(F.col("mx").cast("double") / F.col("chars"))
        ).alias("epochs"),
    )
    p = k.select(
        "source",
        "n_docs",
        "epochs",
        F.floor("epochs").cast("long").alias("base"),
        F.floor((F.col("epochs") - F.floor("epochs")) * 256)
        .cast("long")
        .alias("thr"),
    )
    bucket_int = F.conv(hash_bucket(F.col("doc_id"), "ep"), 16, 10).cast("long")
    rep = d.join(F.broadcast(p), "source").select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.col("base")
            + F.when(bucket_int < F.col("thr"), 1).otherwise(0)
        ).alias("n_copies"),
    )
    ex = rep.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("copy_idx"),
    )
    return (
        ex.join(F.broadcast(p), "source")
        .groupBy("source", "n_docs", "epochs")
        .agg(
            F.count(F.lit(1)).alias("n_docs_out"),
            F.sum("n_chars").cast("long").alias("chars_out"),
            F.round(F.count(F.lit(1)).cast("double") / F.col("n_docs"), 6).alias(
                "achieved_epochs"
            ),
        )
        .select(
            "source",
            F.col("n_docs").alias("n_docs_in"),
            F.round("epochs", 6).alias("epochs"),
            "n_docs_out",
            "chars_out",
            "achieved_epochs",
        )
    )


@query(
    "q_erasure_cascade",
    oracle=f"""
WITH ch AS (
  SELECT 'txn-' || CAST(user_id AS VARCHAR) AS txn_id, user_id,
         event_id AS seq,
         CASE event_type WHEN 'signup' THEN 'c' WHEN 'click' THEN 'u'
              WHEN 'view' THEN 'r' ELSE 'd' END AS op,
         epoch_ms(ts) AS ts_ms
  FROM events WHERE event_type <> 'purchase'
),
latest AS (
  SELECT user_id, max({{'ts_ms': ts_ms, 'seq': seq, 'op': op}}) AS li
  FROM ch GROUP BY user_id
),
req AS (SELECT user_id FROM latest WHERE li.op = 'd'),
ev AS (
  SELECT count(*) AS n_before,
         count(CASE WHEN user_id IN (SELECT user_id FROM req) THEN 1 END)
           AS n_removed
  FROM events
),
o AS (
  SELECT count(*) AS n_before,
         count(CASE WHEN o_custkey IN (SELECT user_id FROM req) THEN 1 END)
           AS n_removed
  FROM orders
),
li AS (
  SELECT count(*) AS n_before,
         count(CASE WHEN l_orderkey IN (
             SELECT o_orderkey FROM orders
             WHERE o_custkey IN (SELECT user_id FROM req)) THEN 1 END)
           AS n_removed
  FROM lineitem
)
SELECT 'events' AS tbl, n_before, CAST(n_removed AS BIGINT) AS n_removed,
       n_before - n_removed AS n_after FROM ev
UNION ALL
SELECT 'orders', n_before, CAST(n_removed AS BIGINT), n_before - n_removed
FROM o
UNION ALL
SELECT 'lineitem', n_before, CAST(n_removed AS BIGINT), n_before - n_removed
FROM li
""",
    tags=("pipeline", "erasure", "compliance"),
)
def q_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT-TO-ERASURE cascade — the compliance pass every stored
    corpus eventually runs: deletion requests are the users whose
    LATEST CDC change is a delete (the request arrives as a CDC
    event, the natural Debezium shape), and the scrub propagates
    events → orders → lineitem (TWO referential hops: lineitems die
    because their order's customer asked out). Declared output =
    per-table before/removed/after accounting, which is what an audit
    wants recorded.

    Scale shape: the request set is small — it rides BROADCAST
    semi-joins into every fact table; the two-hop cascade broadcasts
    the scrubbed orders' keys, never shuffling lineitem. Counting via
    conditional aggregation keeps each table at one pass."""
    ev = load_table(spark, sf_dir, "events")
    ch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "click", "u")
        .when(F.col("event_type") == "view", "r")
        .otherwise("d")
        .alias("op"),
        "ts_ms",
    )
    req = (
        ch.groupBy("user_id")
        .agg(F.max(F.struct("ts_ms", "seq", "op")).alias("li"))
        .filter(F.col("li.op") == "d")
        .select("user_id")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    dead_orders = o.join(
        F.broadcast(req), o.o_custkey == req.user_id, "left_semi"
    ).select("o_orderkey")

    def acct(name, df, hit_col, keys, key_col):
        hit = F.col(hit_col).isNotNull()
        marked = df.join(
            F.broadcast(keys.withColumnRenamed(key_col, hit_col + "__k")),
            F.col(hit_col) == F.col(hit_col + "__k"),
            "left",
        )
        return marked.agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_before"),
            F.count(F.when(F.col(hit_col + "__k").isNotNull(), 1)).alias(
                "n_removed"
            ),
            (
                F.count(F.lit(1))
                - F.count(F.when(F.col(hit_col + "__k").isNotNull(), 1))
            ).alias("n_after"),
        )

    return (
        acct("events", ev.select("user_id"), "user_id", req, "user_id")
        .unionByName(acct("orders", o, "o_custkey", req, "user_id"))
        .unionByName(
            acct("lineitem", li, "l_orderkey", dead_orders, "o_orderkey")
        )
    )


NEYMAN_TOTAL = 100


@query(
    "q_neyman_allocation",
    oracle=f"""
WITH st AS (
  SELECT c_mktsegment AS segment,
         CAST(count(*) AS BIGINT) AS n_h,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         CAST(sum(CAST(round(c_acctbal * c_acctbal, 4)
                       AS DECIMAL(38,4))) AS DOUBLE) AS s2
  FROM customer GROUP BY c_mktsegment
),
sd AS (
  SELECT segment, n_h,
         sqrt((s2 - s1 * s1 / n_h) / (n_h - 1)) AS s_h
  FROM st
),
w AS (
  SELECT segment, n_h, s_h,
         CAST(round(n_h * s_h, 6) AS DECIMAL(38,6)) AS w_h
  FROM sd
),
tot AS (SELECT CAST(sum(w_h) AS DOUBLE) AS wt FROM w)
SELECT w.segment, w.n_h, round(w.s_h, 6) AS s_h,
       CAST(round({NEYMAN_TOTAL} * CAST(w.w_h AS DOUBLE) / t.wt, 0) AS BIGINT)
         AS alloc_n
FROM w CROSS JOIN tot t
""",
    tags=("sampling", "neyman", "survey-design"),
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN OPTIMAL ALLOCATION (Neyman 1934): split a fixed sample
    budget of {NEYMAN_TOTAL} across the market-segment strata
    proportionally to N_h·S_h — big AND volatile strata get more
    samples, minimizing the stratified estimator's variance for the
    budget. The design step that makes q_stratified_sample's rates
    principled instead of proportional-by-default.

    Parity: per-stratum sums and sum-of-squares fold as exact
    DECIMALs (squares rounded to 4 dp first — both engines compute
    the identical double product), the variance identity
    (Σy² − (Σy)²/n)/(n−1) then runs in shared double arithmetic, and
    the 5 stratum weights re-fold as DECIMAL(38,6) so the grand total
    is order-independent. Scale shape: ONE pass over the table (one
    groupBy on the stratum key, map-side combined); the grand total is
    a single-partition window over the 5 STRATUM rows (bounded by the
    stratum domain, not the data) so customer is never scanned
    twice."""
    c = load_table(spark, sf_dir, "customer")
    st = c.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("s1"),
        F.sum(
            F.round(F.col("c_acctbal") * F.col("c_acctbal"), 4).cast(
                "decimal(38,4)"
            )
        )
        .cast("double")
        .alias("s2"),
    )
    sd = st.select(
        "segment",
        "n_h",
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n_h"))
            / (F.col("n_h") - 1)
        ).alias("s_h"),
    )
    w = sd.select(
        "segment",
        "n_h",
        "s_h",
        F.round(F.col("n_h") * F.col("s_h"), 6).cast("decimal(38,6)").alias("w_h"),
    )
    wt = F.sum("w_h").over(W.partitionBy()).cast("double")
    return (
        w.withColumn("wt", wt)
        .select(
            "segment",
            "n_h",
            F.round("s_h", 6).alias("s_h"),
            F.round(
                F.lit(NEYMAN_TOTAL) * F.col("w_h").cast("double") / F.col("wt"),
                0,
            )
            .cast("long")
            .alias("alloc_n"),
        )
    )


# ---------------------------------------------------------------------------
# Batch face of the weighted reservoir (Efraimidis-Spirtakis bottom-k)
# ---------------------------------------------------------------------------


def _wrs_batch_oracle() -> str:
    from cdc_via_flink_spark.streaming.wrs_maintenance import WRS_K, pri_sql

    pri = pri_sql("doc_id", "n_chars + 1")
    return f"""
SELECT doc_id, CAST(n_chars + 1 AS BIGINT) AS w,
       round({pri}, 9) AS pri
FROM documents
ORDER BY {pri}, doc_id
LIMIT {WRS_K}
"""


@query(
    "q_weighted_reservoir",
    oracle=_wrs_batch_oracle(),
    tags=("pipeline", "sample", "weighted", "A6"),
)
def q_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIXED-SIZE WEIGHTED SAMPLE (Efraimidis-Spirtakis 2006) — the
    batch face of streaming/wrs_maintenance.py: one exponential-race
    priority -ln(u)/w per document (u exact-dyadic from the bijective
    lattice hash, w = length), k smallest win. Complements
    q_weighted_sample's Bernoulli design (keep PROBABILITY per doc,
    sample size drifts) with the exact-k contract a packing or
    eval-set budget needs. Plan shape: orderBy+limit is
    TakeOrderedAndProject — each map task forwards at most k rows,
    no global sort at any corpus size; RNG-free and reproducible
    across engines, retries, and cluster sizes."""
    from cdc_via_flink_spark.streaming.wrs_maintenance import WRS_K, pri_col

    d = load_table(spark, sf_dir, "documents")
    w = (F.col("n_chars") + 1).cast("long")
    pri = pri_col(F.col("doc_id"), w)
    return (
        d.select("doc_id", w.alias("w"), pri.alias("pri0"))
        .orderBy("pri0", "doc_id")
        .limit(WRS_K)
        .select("doc_id", "w", F.round("pri0", 9).alias("pri"))
    )


@query(
    "q_corpus_checksum",
    oracle="""
WITH h AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))::BIGINT
              AS BIGINT) AS hv
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(hv) AS BIGINT) AS checksum
FROM h GROUP BY source
ORDER BY source
""",
    tags=("pipeline", "reproducibility", "checksum"),
)
def q_corpus_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-INSENSITIVE CORPUS CHECKSUM per source — the artifact
    fingerprint a reproducibility audit pins between pipeline runs
    (same checksum => byte-identical (doc_id, text) multiset, any
    partitioning/ordering): sum of the first 48 bits of
    md5(doc_id:text) as exact integers. Content-sensitive where
    row counts alone are blind (a silently truncated or re-encoded
    text changes the checksum, not the count), and associative by
    construction — partial checksums of shards ADD UP to the corpus
    checksum, so verification never needs a global sort or a single
    reducer (48-bit values over billions of rows stay far inside
    int64/int128 sums in both engines)."""
    d = load_table(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (
        d.select("source", hv.alias("hv"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("hv").cast("long").alias("checksum"),
        )
        .orderBy("source")
    )
