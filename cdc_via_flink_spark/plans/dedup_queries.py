"""Dedup declared queries (SURVEY.md X1) over the `documents` fixture.

Oracle SQL is generated programmatically to state the exact same
deterministic algorithms (md5-derived token hashes, universal-hash
MinHash family, banding, bit-vote SimHash) in DuckDB's dialect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cdc_via_flink_spark.functions.hashing import P, a_j, b_j
from cdc_via_flink_spark.operators.dedup import (
    doc_shingles,
    exact_dedup,
    minhash_lsh_neardup,
    minhash_plan,
    simhash64,
)
from cdc_via_flink_spark.plans.registry import query
from cdc_via_flink_spark.sources.tables import load_table

JACCARD_T = 0.5
# DATA-DRIVEN banding (r7, VERDICT r6 #2): derived from the threshold
# + miss budget by operators.dedup.minhash_plan — (54, 18, 3) at the
# defaults, giving a true pair AT the 0.5 threshold a 91 % candidate
# probability vs 23 % for the old NUM_HASHES=16/BANDS=4/ROWS=4
# fixture constants (measured: scripts/bench_minhash_recall.py). The
# SQL oracle twins below interpolate these same derived values, so
# Spark and DuckDB move in lockstep.
NUM_HASHES, BANDS, ROWS = minhash_plan(JACCARD_T)

SQL_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

# (doc_id, sh): distinct word-3-shingles per document — twin of
# operators.dedup.doc_shingles.
SQL_SHINGLES = f"""
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                               i -> array_to_string(tk[i:i+2], ' '))) AS sh
  FROM (SELECT doc_id, string_split({SQL_NORM}, ' ') AS tk FROM documents)
"""

SQL_TOK = "CAST(('0x' || substring(md5(sh), 1, 15)) AS BIGINT)"


def _sql_minhash_cte() -> str:
    aggs = ",\n         ".join(
        f"min(({a_j(j)} * (t % {P}) + {b_j(j)}) % {P}) AS mh{j}"
        for j in range(NUM_HASHES)
    )
    return f"""
sh AS ({SQL_SHINGLES}),
tok AS (SELECT doc_id, {SQL_TOK} AS t FROM sh),
sig AS (
  SELECT doc_id,
         {aggs}
  FROM tok GROUP BY doc_id
)"""


def _sql_bands() -> str:
    parts = []
    for b in range(BANDS):
        cols = " || '-' || ".join(
            f"CAST(mh{b * ROWS + r} AS VARCHAR)" for r in range(ROWS)
        )
        parts.append(f"SELECT doc_id, {b} AS band, {cols} AS bsig FROM sig")
    return " UNION ALL ".join(parts)


@query(
    "dedup_exact",
    oracle=f"""
WITH withdups AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0
),
g AS (
  SELECT md5({SQL_NORM}) AS digest, min(doc_id) AS keeper_id,
         count(*) AS n_copies
  FROM withdups GROUP BY 1
)
SELECT digest, keeper_id, n_copies FROM g
""",
    tags=("X1", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup (hash-groupBy on normalized-text digest).
    The fixture has no exact dups, so the query re-injects every 10th
    doc under a shifted id: those groups must come back n_copies=2
    with the original id as keeper."""
    d = load_table(spark, sf_dir, "documents")
    withdups = d.select("doc_id", "text").unionByName(
        d.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    return exact_dedup(withdups, "text", "doc_id")


_MINHASH_CTE = _sql_minhash_cte()

_LSH_ORACLE = f"""
WITH {_MINHASH_CTE},
banded AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, i.inter, za.sz AS size_a, zb.sz AS size_b,
       round(i.inter / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE i.inter / (za.sz + zb.sz - i.inter) >= {JACCARD_T}
"""


@query(
    "dedup_minhash_lsh",
    oracle=_LSH_ORACLE,
    tags=("X1", "dedup", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection at scale: MinHash signature (single
    aggregation, minhash_plan-derived width) → bands×rows LSH banding
    → bucket equi-join candidates → exact-Jaccard verification ≥ 0.5.
    No O(n²) pair space. Boundary recall at the derived sizing is
    measured in MINHASH_RECALL_r07.json (91 % at j = 0.5 vs 24.5 %
    for the old fixture constants)."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_neardup(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS ({SQL_SHINGLES}),
blocks AS (SELECT doc_id, lang, source FROM documents),
sb AS (SELECT s.doc_id, b.lang, b.source, s.sh
       FROM sh s JOIN blocks b ON s.doc_id = b.doc_id),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sb a JOIN sb b
    ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b,
       round(i.inter / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE i.inter / (za.sz + zb.sz - i.inter) >= 0.3
""",
    tags=("X1", "dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise n-gram Jaccard with attribute blocking
    (lang, source) to bound the pair space — the exact-verification
    twin of the LSH path."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    blocks = d.select("doc_id", "lang", "source")
    sb = sh.join(blocks, "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sb.alias("a")
    b = sb.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter.join(
            sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "size_a"}), "id_a"
        )
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "size_b"}), "id_b")
        .withColumn(
            "jac",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
    )
    return j.filter(F.col("jac") >= 0.3).select(
        "id_a", "id_b", F.round("jac", 6).alias("jaccard")
    )


def _sql_simhash() -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (t >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    fp = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(60)
    )
    return f"""
WITH sh AS ({SQL_SHINGLES}),
tok AS (SELECT doc_id, {SQL_TOK} AS t FROM sh),
votes AS (
  SELECT doc_id,
         {votes}
  FROM tok GROUP BY doc_id
),
fp AS (SELECT doc_id, {fp} AS simhash FROM votes)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
"""


@query(
    "dedup_simhash",
    oracle=_sql_simhash(),
    tags=("X1", "dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit fingerprint by per-bit majority vote of
    shingle hashes; pairs within Hamming distance 12. (Pairwise compare
    here for oracle-checkability; at scale the standard trick is
    sorting by rotated fingerprints / banding on bit chunks.)"""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    fp = simhash64(sh)
    a = fp.withColumnsRenamed({"doc_id": "id_a", "simhash": "sim_a"})
    b = fp.withColumnsRenamed({"doc_id": "id_b", "simhash": "sim_b"})
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return pairs.filter(ham <= 12).select(
        "id_a", "id_b", ham.cast("int").alias("hamming")
    )


@query(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_LSH_ORACLE})
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u
)
SELECT u AS node, min(r) AS component FROM reach GROUP BY u
""",
    tags=("X1", "dedup", "clusters", "iterative"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS (transitive closure): min-label-propagation
    connected components over the MinHash-LSH graph — the iterative
    keeper-election step a production dedup runs after pair
    generation. CLASS MODE (operators/dedup.py::minhash_lsh_components,
    r6): the closure runs over class REPS + membership, never
    materializing the member-quadratic pair expansion — output-linear
    even when one duplicate class is huge. The oracle states the same
    closure over the (equivalent) pair graph as a recursive CTE."""
    from cdc_via_flink_spark.operators.dedup import minhash_lsh_components

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_components(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )


@query(
    "dedup_final_corpus",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_LSH_ORACLE})
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u
),
comp AS (SELECT u AS node, min(r) AS component FROM reach GROUP BY u),
dropped AS (SELECT node FROM comp WHERE node <> component)
SELECT d.lang,
       count(*) AS n_docs,
       count(*) - count(dr.node) AS n_kept,
       count(dr.node) AS n_dropped,
       CAST(sum(CASE WHEN dr.node IS NULL THEN length(d.text) ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM documents d LEFT JOIN dropped dr ON d.doc_id = dr.node
GROUP BY d.lang
""",
    tags=("X1", "dedup", "clusters", "iterative", "pipeline"),
)
def dedup_final_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline's END PRODUCT: elect one keeper per duplicate
    cluster (the component minimum), drop the rest, and report the
    deduplicated corpus per language (docs kept/dropped, surviving
    chars). This is the materialization step a training-data pipeline
    runs after pairs→clusters — the anti-join of the corpus against
    the non-keeper set. Dropped set is tiny relative to the corpus
    (it's only clustered duplicates), so the anti-join broadcasts.
    CLASS MODE (r6): clustering consumes (rep, members) classes
    directly — no member-pair materialization, so the end-to-end
    corpus build stays output-linear under any duplication factor."""
    from cdc_via_flink_spark.operators.dedup import minhash_lsh_components

    d = load_table(spark, sf_dir, "documents")
    comp = minhash_lsh_components(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )
    dropped = comp.filter(F.col("node") != F.col("component")).select("node")
    joined = d.join(
        F.broadcast(dropped), d.doc_id == dropped.node, "left"
    )
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.count(F.lit(1)) - F.count("node")).alias("n_kept"),
        F.count("node").alias("n_dropped"),
        F.sum(
            F.when(F.col("node").isNull(), F.length("text")).otherwise(0)
        ).alias("kept_chars"),
    )


@query(
    "dedup_fuzzy_pairs",
    oracle="""
WITH d AS (
  SELECT doc_id, lang,
         substr(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 40) AS head,
         len(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS n_tok
  FROM documents
)
SELECT a.lang,
       count(*) AS n_pairs,
       CAST(sum(CASE WHEN levenshtein(a.head, b.head) = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_exact_head,
       min(levenshtein(a.head, b.head)) AS min_dist
FROM d a JOIN d b
  ON a.lang = b.lang
 AND a.n_tok // 8 = b.n_tok // 8
 AND a.doc_id < b.doc_id
WHERE levenshtein(a.head, b.head) <= 10
GROUP BY a.lang
""",
    tags=("X1", "dedup", "fuzzy"),
)
def dedup_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs (the fuzzy-matching modality LSH
    doesn't cover: small in-place edits that shift every shingle).
    Candidate generation is BLOCKED — same language, same
    token-count-div-8 bucket, id-ordered — so the quadratic
    levenshtein only runs within blocks (at 100 TB, blocking is what
    keeps an edit-distance pass feasible; the alternative full
    self-join is |docs|²). Distance runs on the 40-char normalized
    head, a standard prefix-filter surrogate."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    base = d.select(
        "doc_id",
        "lang",
        F.substring(norm, 1, 40).alias("head"),
        F.size(F.split(norm, " ")).alias("n_tok"),
    )
    a = base.select(
        F.col("doc_id").alias("id_a"),
        "lang",
        F.col("head").alias("head_a"),
        F.expr("n_tok div 8").alias("blk"),
    )
    b = base.select(
        F.col("doc_id").alias("id_b"),
        F.col("lang").alias("lang_b"),
        F.col("head").alias("head_b"),
        F.expr("n_tok div 8").alias("blk_b"),
    )
    dist = F.levenshtein(F.col("head_a"), F.col("head_b"))
    return (
        a.join(
            b,
            (F.col("lang") == F.col("lang_b"))
            & (F.col("blk") == F.col("blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(dist <= 10)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(dist == 0, 1).otherwise(0)).alias("n_exact_head"),
            F.min(dist).cast("long").alias("min_dist"),
        )
    )


@query(
    "dedup_containment",
    oracle=f"""
WITH sh AS ({SQL_SHINGLES}),
blocks AS (SELECT doc_id, lang, source FROM documents),
sb AS (SELECT s.doc_id, b.lang, b.source, s.sh
       FROM sh s JOIN blocks b ON s.doc_id = b.doc_id),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS inter
  FROM sb a JOIN sb b
    ON a.lang = b.lang AND a.source = b.source AND a.sh = b.sh
   AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
dirs AS (
  SELECT CASE WHEN za.sz < zb.sz OR (za.sz = zb.sz) THEN i.id_a ELSE i.id_b END
           AS contained_id,
         CASE WHEN za.sz < zb.sz OR (za.sz = zb.sz) THEN i.id_b ELSE i.id_a END
           AS container_id,
         least(za.sz, zb.sz) AS sz_contained,
         greatest(za.sz, zb.sz) AS sz_container,
         i.inter
  FROM inter i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
)
SELECT contained_id, container_id,
       round(CAST(inter AS DOUBLE) / sz_contained, 6) AS containment,
       sz_contained, sz_container
FROM dirs
WHERE CAST(inter AS DOUBLE) / sz_contained >= 0.9
""",
    tags=("X1", "dedup", "containment"),
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT detection — the asymmetric relative of
    Jaccard: C(A,B) = |S(A) ∩ S(B)| / |S(A)| finds a document embedded
    inside a larger one (quote-with-boilerplate, excerpt, concat-dup),
    which symmetric Jaccard misses because the union is dominated by
    the big doc. Directed output: (contained_id, container_id,
    containment >= 0.9) with the smaller shingle set as the contained
    side (ties -> lower doc_id, matching the a<b pair orientation).
    Same (lang, source) blocking as dedup_ngram_jaccard bounds the
    pair space; the LSH bucket path is the declared scale route for
    unblocked corpora."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    blocks = d.select("doc_id", "lang", "source")
    sb = sh.join(blocks, "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sb.alias("a")
    b = sb.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    dirs = (
        inter.join(
            sizes.withColumnsRenamed({"doc_id": "id_a", "sz": "size_a"}), "id_a"
        )
        .join(sizes.withColumnsRenamed({"doc_id": "id_b", "sz": "size_b"}), "id_b")
        .select(
            F.when(F.col("size_a") <= F.col("size_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("contained_id"),
            F.when(F.col("size_a") <= F.col("size_b"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("container_id"),
            F.least("size_a", "size_b").alias("sz_contained"),
            F.greatest("size_a", "size_b").alias("sz_container"),
            "inter",
        )
    )
    cont = F.col("inter").cast("double") / F.col("sz_contained")
    return dirs.filter(cont >= 0.9).select(
        "contained_id",
        "container_id",
        F.round(cont, 6).alias("containment"),
        "sz_contained",
        "sz_container",
    )


# --------------------------------------------------------------------------
# Unicode hardening for dedup (VERDICT r3 #9): NFC-before-fingerprint.
# NFD and NFC spellings of the SAME text are byte-distinct, so a
# content digest taken on raw bytes never collapses them — every
# fingerprint-based dedup must normalize first. Fixture: the same
# accented suffix in both Unicode forms, appended in-query.
# --------------------------------------------------------------------------

_NFD_SUFFIX = " cafe\u0301 franc\u0327ais"  # e+COMBINING ACUTE, c+CEDILLA
_NFC_SUFFIX = " caf\u00e9 fran\u00e7ais"  # precomposed


@query(
    "dedup_nfc_fingerprint",
    oracle=f"""
WITH v AS (
  SELECT lang,
         substr(text, 1, 40) || '{_NFD_SUFFIX}' AS v_nfd,
         substr(text, 1, 40) || '{_NFC_SUFFIX}' AS v_nfc
  FROM documents
),
c AS (
  SELECT lang,
         (v_nfd <> v_nfc) AS byte_distinct,
         (md5(v_nfd) <> md5(v_nfc)) AS raw_fp_differs,
         (md5(nfc_normalize(v_nfd)) = md5(nfc_normalize(v_nfc)))
           AS nfc_fp_collapses
  FROM v
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN byte_distinct THEN 1 ELSE 0 END) AS BIGINT)
         AS n_byte_distinct,
       CAST(sum(CASE WHEN raw_fp_differs THEN 1 ELSE 0 END) AS BIGINT)
         AS n_raw_fp_differs,
       CAST(sum(CASE WHEN nfc_fp_collapses THEN 1 ELSE 0 END) AS BIGINT)
         AS n_nfc_fp_collapses
FROM c GROUP BY lang
""",
    tags=("X1", "unicode", "nfc", "fingerprint"),
)
def dedup_nfc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC-before-fingerprint (the Unicode rule every content-dedup
    pipeline needs): the same text in NFD and NFC spellings is
    byte-distinct — raw md5 fingerprints DIFFER on every row — but
    after NFC normalization (vectorized Arrow pandas_udf on the Spark
    side, nfc_normalize in DuckDB) the fingerprints collapse on every
    row. Each engine self-computes the three counters, so a
    normalization regression flips driver-visible counts."""
    from cdc_via_flink_spark.functions.text import nfc_normalize

    d = load_table(spark, sf_dir, "documents")
    base = F.substring(F.col("text"), 1, 40)
    v = d.select(
        "lang",
        F.concat(base, F.lit(_NFD_SUFFIX)).alias("v_nfd"),
        F.concat(base, F.lit(_NFC_SUFFIX)).alias("v_nfc"),
    )
    c = v.select(
        "lang",
        (F.col("v_nfd") != F.col("v_nfc")).alias("byte_distinct"),
        (F.md5("v_nfd") != F.md5("v_nfc")).alias("raw_fp_differs"),
        (F.md5(nfc_normalize(F.col("v_nfd"))) == F.md5(nfc_normalize(F.col("v_nfc"))))
        .alias("nfc_fp_collapses"),
    )
    flag = lambda c_: F.sum(F.when(F.col(c_), 1).otherwise(0)).cast("long")  # noqa: E731
    return c.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        flag("byte_distinct").alias("n_byte_distinct"),
        flag("raw_fp_differs").alias("n_raw_fp_differs"),
        flag("nfc_fp_collapses").alias("n_nfc_fp_collapses"),
    )


# --------------------------------------------------------------------------
# SQL-surface connected components (VERDICT r3 "what's missing" #4).
# Spark 4.1 ships recursive CTEs but only with UNION ALL
# (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — and min-label closure over
# a CYCLIC symmetric pair graph needs UNION-distinct to terminate. So
# the engine-side SQL surface is FIXED-DEPTH UNROLLED label
# propagation (the same recursion the DataFrame loop in
# operators/components.py iterates, spelled as chained CTEs — one
# keyed shuffle per round, O(diameter) rounds) with an in-query
# convergence proof: the last two rounds must agree on every label,
# and that boolean rides in the declared output, so a cluster wider
# than the unroll depth flips `converged` and hash-mismatches against
# the oracle's TRUE. The oracle is DuckDB's TRUE recursive CTE — a
# different derivation of the same closure. tests/test_components.py
# probes UNION-distinct recursion each run; when Spark ships it, the
# unrolled body can collapse to the oracle's recursive form.
# --------------------------------------------------------------------------

_CC_ROUNDS = 12


def _unrolled_components_sql(pairs_view: str, rounds: int = _CC_ROUNDS) -> str:
    head = f"""
WITH sym AS (
  SELECT id_a AS u, id_b AS v FROM {pairs_view}
  UNION
  SELECT id_b AS u, id_a AS v FROM {pairs_view}
),
adj AS (
  SELECT u, v FROM sym
  UNION
  SELECT DISTINCT u, u FROM sym
),
l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym),
"""
    steps = "".join(
        f"l{i} AS (SELECT a.u AS node, min(l.lbl) AS lbl"
        f" FROM adj a JOIN l{i - 1} l ON l.node = a.v GROUP BY a.u),\n"
        for i in range(1, rounds + 1)
    )
    tail = f"""chk AS (
  SELECT count(*) AS n_unstable
  FROM l{rounds - 1} p JOIN l{rounds} q
    ON p.node = q.node AND p.lbl <> q.lbl
)
SELECT l.node, l.lbl AS component, (c.n_unstable = 0) AS converged
FROM l{rounds} l CROSS JOIN chk c
"""
    return head + steps + tail


@query(
    "dedup_clusters_sql",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_LSH_ORACLE})
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u
)
SELECT u AS node, min(r) AS component, TRUE AS converged
FROM reach GROUP BY u
""",
    tags=("X1", "dedup", "clusters", "sql-surface"),
)
def dedup_clusters_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters on the pure SQL surface: min-label
    propagation unrolled _CC_ROUNDS=12 CTE rounds over the MinHash-LSH pair
    graph, with the converged flag proving the unroll depth covered
    every cluster's diameter (see module comment on why Spark's
    UNION ALL-only recursive CTE can't express the terminating
    closure directly). Same results as dedup_clusters (the DataFrame
    loop); the oracle derives the closure via DuckDB's true recursive
    CTE."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_neardup(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )
    view = "dedup_pairs_sql_v"
    # materialize the pair list before the view: the unrolled CTE
    # references it 12×, and inlining the whole LSH pipeline 12× both
    # re-executes it and inflates the plan string past driver heap
    # (the connected_components edge-checkpoint precedent)
    pairs.select("id_a", "id_b").localCheckpoint(
        eager=True
    ).createOrReplaceTempView(view)
    return spark.sql(_unrolled_components_sql(view))


P_SEM = 200  # probe docs for the declared SemDeDup summary
SEM_TAU = 0.4
SEM_RECALL_FLOOR = 0.2


@query(
    "dedup_semantic",
    bench2=True,
    oracle=f"""
WITH d AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v FROM d WHERE vec_id < {P_SEM}),
scored AS (
  SELECT q.query_id, a.vec_id,
         round(list_dot_product(a.v, q.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(q.v, q.v))), 6) AS cos
  FROM d a CROSS JOIN q WHERE a.vec_id <> q.query_id
),
r AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id AS exact_nn_vec, cos AS exact_nn_cos,
       cos >= {SEM_TAU} AS exact_neardup, TRUE AS within_bound
FROM r WHERE rn = 1
""",
    tags=("X1", "X2", "semdedup", "kmeans", "iterative"),
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup — embedding-space semantic dedup
    (operators/dedup.py::semantic_dedup): TWO-LEVEL clustering (coarse
    Lloyd's-trained cells over a hash-sample, fine selection centroids
    per cell; assignment is an O(n·(k1+k/k1)) expression argmin over
    broadcast centroid arrays — never an n×k crossJoin), then drop
    any doc with a lower-id cluster-mate at cosine >= {tau}; the pair
    stage collapses exact-duplicate vectors to class reps first, so it
    is quadratic only in DISTINCT vectors. The
    clustering is iteratively trained, so the declared output follows
    the trained-ANN summary pattern: per probe doc, the exact
    brute-force nearest neighbor (oracle-computable) + within_bound,
    the conjunction of two in-query assertions the oracle answers TRUE
    to — (a) every dropped doc's recorded pair really sits at
    cosine >= tau, and (b) cluster-recall: the fraction of
    corpus-wide exact tau-pairs (via the verified-exact LSH path) that
    co-cluster stays above a measured floor (0.26-0.54 across
    fixtures; floor 0.2 — the fixtures' embeddings are random-ish, so
    tau=0.4 mates are weakly similar; real duplicate regimes
    (cos>=0.9) co-cluster near-certainly, which is the paper's
    operating point). A broken trainer/assignment flips (b); a broken
    pair stage flips (a) or changes the drop set."""
    from cdc_via_flink_spark.operators.dedup import semantic_dedup
    from cdc_via_flink_spark.operators.similarity import (
        brute_force_topk,
        neardup_lsh_pairs,
    )
    from cdc_via_flink_spark.sources.tables import ensure_min_partitions

    e = ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
    # NOT snapshotted: dec is referenced three times (drop audit +
    # both sides of the co-cluster join), but an interleaved A/B at
    # sf0.1 measured the eager localCheckpoint barrier ~0.7 s SLOWER
    # than letting exchange reuse dedupe the recomputes (min 10.12 vs
    # 9.45 s) — the opposite of the q_quantile_regression case, where
    # the re-executed subplan was a full 21x table scan.
    dec = semantic_dedup(e, tau=SEM_TAU)

    drop_ok = dec.agg(
        F.bool_and(F.col("kept") | (F.col("pair_cos") >= SEM_TAU)).alias("ok")
    )
    pairs = neardup_lsh_pairs(e, threshold=SEM_TAU)
    asg = dec.select("vec_id", "cluster_id")
    co = pairs.join(
        asg.select(F.col("vec_id").alias("id_a"), F.col("cluster_id").alias("ca")),
        "id_a",
    ).join(
        asg.select(F.col("vec_id").alias("id_b"), F.col("cluster_id").alias("cb")),
        "id_b",
    )
    rec = co.agg(
        F.count(F.when(F.col("ca") == F.col("cb"), 1)).alias("n_co"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    bound = drop_ok.crossJoin(rec).select(
        (
            F.col("ok")
            & (
                (F.col("n_pairs") == 0)
                | (F.col("n_co") / F.col("n_pairs") >= SEM_RECALL_FLOOR)
            )
        ).alias("within_bound")
    )

    qs = e.filter(F.col("vec_id") < P_SEM).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top1 = brute_force_topk(e, qs, k=1).select(
        "query_id",
        F.col("vec_id").alias("exact_nn_vec"),
        F.col("cos").alias("exact_nn_cos"),
    )
    return top1.crossJoin(F.broadcast(bound)).select(
        "query_id",
        "exact_nn_vec",
        "exact_nn_cos",
        (F.col("exact_nn_cos") >= SEM_TAU).alias("exact_neardup"),
        "within_bound",
    )


@query(
    "dedup_incremental_pairs",
    oracle=f"""
WITH base AS ({_LSH_ORACLE})
SELECT id_a, id_b, inter, size_a, size_b, jaccard
FROM base WHERE id_a % 5 = 0 OR id_b % 5 = 0
""",
    tags=("X1", "dedup", "incremental", "lifecycle"),
)
def dedup_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL corpus dedup — the production flow for a
    continuously-growing training corpus (the text-side analog of the
    ANN append lifecycle): an arriving batch (every 5th doc plays the
    NEW side) is near-dup-checked against the EXISTING corpus's
    persisted banded-signature index
    (operators/dedup.py::save_dedup_index /
    incremental_neardup_pairs) without re-hashing the old corpus —
    old docs are re-shingled only if they land in a candidate pair.
    The result must equal the monolithic full-corpus MinHash-LSH run
    restricted to new-involving pairs, which is exactly what the
    oracle states (signatures are per-doc-independent, so separate
    banding collides identically)."""
    from cdc_via_flink_spark.operators.dedup import incremental_neardup_pairs

    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 5 == 0)
    old = d.filter(F.col("doc_id") % 5 != 0)
    return incremental_neardup_pairs(
        old, new, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )


@query(
    "dedup_ensemble",
    oracle=f"""
WITH base AS ({_LSH_ORACLE}),
ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       FROM embeddings)
SELECT b.id_a, b.id_b, b.jaccard,
       round(list_dot_product(da.v, db.v)
             / (sqrt(list_dot_product(da.v, da.v))
                * sqrt(list_dot_product(db.v, db.v))), 6) AS emb_cos,
       round(list_dot_product(da.v, db.v)
             / (sqrt(list_dot_product(da.v, da.v))
                * sqrt(list_dot_product(db.v, db.v))), 6) >= 0.4
         AS embedding_confirms
FROM base b
JOIN ed da ON da.vec_id = b.id_a
JOIN ed db ON db.vec_id = b.id_b
""",
    tags=("X1", "X2", "dedup", "ensemble"),
)
def dedup_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENSEMBLE dedup decision — the production pattern of combining
    independent near-dup signals before destructive removal: every
    MinHash-LSH text pair (exact-Jaccard >= 0.5) is cross-checked in
    EMBEDDING space (docs and embeddings share ids — the multimodal
    alignment join), emitting the exact cosine and whether it confirms
    at the embedding near-dup threshold (0.4). Disagreements are the
    interesting rows: surface-level copies with divergent semantics
    (template spam) vs paraphrases (caught only by embeddings).

    Scale shape: the pair table is collision-bounded (LSH), so it
    BROADCASTS to the embedding fetches — the embedding corpus is
    never shuffled; two broadcast-hash joins, no new pair space."""
    from cdc_via_flink_spark.functions.vectors import cosine, to_double

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_neardup(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    ).select("id_a", "id_b", "jaccard")
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("v")
    )
    ea = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    cos = F.round(cosine(F.col("va"), F.col("vb")), 6)
    return (
        ea.join(F.broadcast(pairs), "id_a")
        .join(F.broadcast(eb.join(F.broadcast(pairs.select("id_b").distinct()), "id_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            cos.alias("emb_cos"),
            (cos >= 0.4).alias("embedding_confirms"),
        )
    )


@query(
    "dedup_survivorship",
    oracle=f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_LSH_ORACLE})
),
sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(u, r) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.u
),
comp AS (SELECT u AS node, min(r) AS component FROM reach GROUP BY u),
members AS (
  SELECT c.component, d.doc_id, d.lang, d.source, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.node
),
lang_votes AS (
  SELECT component, lang, count(*) AS nl FROM members
  GROUP BY component, lang
),
lang_win AS (
  SELECT component, min({{'neg': -nl, 'lang': lang}}).lang AS lang
  FROM lang_votes GROUP BY component
)
SELECT m.component AS cluster_id,
       count(*) AS n_members,
       min(m.doc_id) AS survivor_id,
       max({{'nc': m.n_chars, 'neg_id': -m.doc_id}}).neg_id * -1
         AS longest_id,
       lw.lang AS lang_mode,
       CAST(sum(m.n_chars) AS BIGINT) AS total_chars
FROM members m JOIN lang_win lw ON lw.component = m.component
GROUP BY m.component, lw.lang
""",
    tags=("X1", "dedup", "survivorship", "iterative"),
)
def dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVIVORSHIP / GOLDEN-RECORD construction — the step AFTER
    clustering that entity resolution actually ships: for each
    duplicate cluster (transitive closure over the verified MinHash
    pairs), elect the survivor (min doc_id — the stable-id rule),
    record the longest member (max n_chars, id tie-break — the
    keep-richest-payload rule), the modal lang (count-majority,
    lexicographic tie-break via struct-min), member count and total
    payload. Every rule is an argmax/argmin expressed as struct
    min/max, so the whole merge policy is deterministic and
    SQL-oracle-checkable (oracle: recursive-CTE closure + the same
    votes). Scale: clusters are collision-bounded; one groupBy over
    the member table, votes as a second small aggregate. CLASS MODE
    (r6): membership comes straight from the class table — no
    member-pair materialization."""
    from cdc_via_flink_spark.operators.dedup import minhash_lsh_components

    d = load_table(spark, sf_dir, "documents")
    comp = minhash_lsh_components(
        d, "text", "doc_id", NUM_HASHES, BANDS, ROWS, JACCARD_T
    )
    members = comp.join(
        d.select("doc_id", "lang", "source", "n_chars"),
        comp.node == F.col("doc_id"),
    ).select(F.col("component"), "doc_id", "lang", "source", "n_chars")
    votes = members.groupBy("component", "lang").agg(
        F.count(F.lit(1)).alias("nl")
    )
    lang_win = votes.groupBy("component").agg(
        F.min(F.struct((-F.col("nl")).alias("neg"), F.col("lang").alias("lang")))
        .getField("lang")
        .alias("lang_mode")
    )
    return (
        members.join(F.broadcast(lang_win), "component")
        .groupBy("component", "lang_mode")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.min("doc_id").alias("survivor_id"),
            (
                F.max(
                    F.struct(
                        F.col("n_chars").alias("nc"),
                        (-F.col("doc_id")).alias("neg_id"),
                    )
                ).getField("neg_id")
                * -1
            ).alias("longest_id"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.col("component").alias("cluster_id"),
            "n_members",
            "survivor_id",
            "longest_id",
            F.col("lang_mode"),
            "total_chars",
        )
    )


# --- Bloom-filter ingest gate (the pre-screen in front of exact dedup) ---

BLOOM_M = 1 << 16  # bits; pinned because a static SQL oracle can't size
BLOOM_K = 7  # from data — bloom_plan(n, fpr) is the data-driven path

# digest of the normalized text as a BIGINT (md5 -> first 15 hex)
_SQL_DIGEST = f"CAST(('0x' || substring(md5({SQL_NORM}), 1, 15)) AS BIGINT)"


def _bloom_oracle() -> str:
    from cdc_via_flink_spark.operators.bloom import sql_positions

    pos_list = sql_positions("digest", BLOOM_M, BLOOM_K)
    return f"""
WITH corpus AS (
  SELECT DISTINCT {_SQL_DIGEST} AS digest FROM documents
),
batch AS (
  SELECT doc_id + 1000000 AS batch_id, text
  FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS batch_id,
         text || ' fresh-' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 7 = 0
),
bd AS (SELECT batch_id, {_SQL_DIGEST} AS digest FROM batch),
cpos AS (SELECT unnest({pos_list}) AS pos FROM corpus),
bitmap AS (
  SELECT pos // 32 AS word, bit_or(1::BIGINT << (pos % 32)) AS bits
  FROM cpos GROUP BY 1
),
bpos AS (SELECT batch_id, unnest({pos_list}) AS pos FROM bd),
probe AS (
  SELECT p.batch_id,
         (COALESCE(m.bits, 0) & (1::BIGINT << (p.pos % 32)))
           = (1::BIGINT << (p.pos % 32)) AS hit
  FROM bpos p LEFT JOIN bitmap m ON p.pos // 32 = m.word
),
verdict AS (
  SELECT batch_id, bool_and(hit) AS bloom_hit FROM probe GROUP BY batch_id
),
exactm AS (
  SELECT b.batch_id, (c.digest IS NOT NULL) AS exact_member
  FROM bd b LEFT JOIN corpus c ON b.digest = c.digest
)
SELECT v.batch_id, v.bloom_hit, e.exact_member,
       (v.bloom_hit AND NOT e.exact_member) AS false_positive
FROM verdict v JOIN exactm e ON v.batch_id = e.batch_id
"""


@query(
    "dedup_bloom_gate",
    oracle=_bloom_oracle(),
    tags=("X1", "dedup", "bloom", "ingest-gate"),
)
def dedup_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter ingest gate (operators/bloom.py): build an m-bit
    filter over the CORPUS's normalized-content digests, then screen an
    arriving batch — every 5th doc redelivered verbatim (true members:
    the filter MUST hit, zero false negatives by construction) plus
    every 7th doc with a fresh suffix (non-members: a hit would be a
    false positive, surfaced in the false_positive column).

    Scale shape: the bitmap is ≤ m/32 rows REGARDLESS of corpus size
    (one bit_or groupBy with map-side combine); the probe joins the
    broadcast bitmap on word index and never touches corpus rows —
    definite-miss batch docs skip the exact digest join entirely. The
    oracle recomputes the same filter bit-for-bit (32-bit words, the
    shared universal-hash family with inlined coefficients)."""
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text
    from cdc_via_flink_spark.operators.bloom import bloom_build, bloom_probe

    d = load_table(spark, sf_dir, "documents")
    # token_int applies md5 itself: digest = int(md5(norm)[:15], 16)
    digest = token_int(normalize_text(F.col("text")))
    corpus = d.select(digest.alias("digest")).distinct()

    batch = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + 1000000).alias("batch_id"), "text")
        .unionAll(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 2000000).alias("batch_id"),
                F.concat(
                    F.col("text"), F.lit(" fresh-"), F.col("doc_id").cast("string")
                ).alias("text"),
            )
        )
    )
    bd = batch.select("batch_id", digest.alias("digest"))

    bitmap = bloom_build(corpus, "digest", BLOOM_M, BLOOM_K)
    verdict = bloom_probe(bd, "batch_id", "digest", bitmap, BLOOM_M, BLOOM_K)
    exactm = bd.join(
        F.broadcast(corpus.withColumn("_m", F.lit(True))), "digest", "left"
    ).select("batch_id", F.coalesce(F.col("_m"), F.lit(False)).alias("exact_member"))
    return verdict.join(exactm, "batch_id").select(
        "batch_id",
        "bloom_hit",
        "exact_member",
        (F.col("bloom_hit") & ~F.col("exact_member")).alias("false_positive"),
    )


def _counting_bloom_oracle() -> str:
    from cdc_via_flink_spark.operators.bloom import sql_positions

    pos_list = sql_positions("digest", BLOOM_M, BLOOM_K)
    return f"""
WITH corpus AS (
  SELECT DISTINCT {_SQL_DIGEST} AS digest FROM documents
),
del AS (
  SELECT DISTINCT {_SQL_DIGEST} AS digest FROM documents WHERE doc_id % 3 = 0
),
live AS (SELECT digest FROM corpus EXCEPT SELECT digest FROM del),
batch AS (
  SELECT doc_id + 1000000 AS batch_id, text
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id + 2000000 AS batch_id, text
  FROM documents WHERE doc_id % 3 <> 0 AND doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 3000000 AS batch_id,
         text || ' fresh-' || CAST(doc_id AS VARCHAR) AS text
  FROM documents WHERE doc_id % 7 = 0
),
bd AS (SELECT batch_id, {_SQL_DIGEST} AS digest FROM batch),
cnt AS (
  SELECT pos, sum(delta) AS cnt FROM (
    SELECT unnest({pos_list}) AS pos, 1 AS delta FROM corpus
    UNION ALL
    SELECT unnest({pos_list}) AS pos, -1 AS delta FROM del
  ) GROUP BY pos
),
bpos AS (SELECT batch_id, unnest({pos_list}) AS pos FROM bd),
probe AS (
  SELECT p.batch_id, COALESCE(c.cnt, 0) > 0 AS hit
  FROM bpos p LEFT JOIN cnt c ON p.pos = c.pos
),
verdict AS (
  SELECT batch_id, bool_and(hit) AS cb_hit FROM probe GROUP BY batch_id
),
exactm AS (
  SELECT b.batch_id, (l.digest IS NOT NULL) AS exact_member
  FROM bd b LEFT JOIN live l ON b.digest = l.digest
)
SELECT v.batch_id, v.cb_hit, e.exact_member,
       (v.cb_hit AND NOT e.exact_member) AS false_positive
FROM verdict v JOIN exactm e ON v.batch_id = e.batch_id
"""


@query(
    "dedup_counting_bloom_gate",
    oracle=_counting_bloom_oracle(),
    tags=("X1", "dedup", "bloom", "ingest-gate", "deletion"),
)
def dedup_counting_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION-capable membership gate — the counting-Bloom form of
    dedup_bloom_gate (operators/bloom.py::counting_bloom_counts): the
    corpus inserts its distinct content digests, every 3rd doc's text
    is then DELETED (the retract/right-to-be-forgotten path a plain
    bitmap cannot express: clearing a shared bit would false-negative
    other members), and a batch probes the NET counters —
    redeliveries of deleted texts must read miss (except counter
    false positives, surfaced), redeliveries of retained texts MUST
    hit (a retained digest's own +1 per position can never be
    cancelled by other digests' deletions), fresh texts mostly miss.

    Scale shape: counters are one union + one groupBy(pos) sum with
    map-side combine, ≤ m rows regardless of corpus size; the probe
    joins the (broadcast while small) counter table and never touches
    corpus rows. The oracle recomputes the counters exactly (integer
    sums, the shared universal-hash family)."""
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text
    from cdc_via_flink_spark.operators.bloom import (
        counting_bloom_counts,
        counting_bloom_probe,
    )

    d = load_table(spark, sf_dir, "documents")
    digest = token_int(normalize_text(F.col("text")))
    corpus = d.select(digest.alias("digest")).distinct()
    deletes = (
        d.filter(F.col("doc_id") % 3 == 0).select(digest.alias("digest")).distinct()
    )
    live = corpus.exceptAll(deletes)

    batch = (
        d.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000000).alias("batch_id"), "text")
        .unionAll(
            d.filter((F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 5 == 0)).select(
                (F.col("doc_id") + 2000000).alias("batch_id"), "text"
            )
        )
        .unionAll(
            d.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 3000000).alias("batch_id"),
                F.concat(
                    F.col("text"), F.lit(" fresh-"), F.col("doc_id").cast("string")
                ).alias("text"),
            )
        )
    )
    bd = batch.select("batch_id", digest.alias("digest"))

    counts = counting_bloom_counts(corpus, deletes, "digest", BLOOM_M, BLOOM_K)
    verdict = counting_bloom_probe(bd, "batch_id", "digest", counts, BLOOM_M, BLOOM_K)
    exactm = bd.join(
        F.broadcast(live.withColumn("_m", F.lit(True))), "digest", "left"
    ).select("batch_id", F.coalesce(F.col("_m"), F.lit(False)).alias("exact_member"))
    return verdict.join(exactm, "batch_id").select(
        "batch_id",
        "cb_hit",
        "exact_member",
        (F.col("cb_hit") & ~F.col("exact_member")).alias("false_positive"),
    )


@query(
    "dedup_source_overlap",
    oracle=f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  -- a 'mirror' dump re-hosting every 7th doc verbatim and a
  -- 'mirror2' partial re-crawl of every 14th: the controlled
  -- cross-source duplication the report must surface
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 7 = 1
  UNION ALL
  SELECT 'mirror2' AS source, text FROM documents WHERE doc_id % 14 = 1
),
d AS (
  SELECT source, {_SQL_DIGEST} AS digest FROM corpus
),
per AS (SELECT DISTINCT source, digest FROM d),
srcn AS (SELECT source, count(DISTINCT digest) AS n_distinct FROM per GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
  FROM per a JOIN per b ON a.digest = b.digest AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT p.src_a, p.src_b, p.shared,
       na.n_distinct AS n_a, nb.n_distinct AS n_b,
       round(CAST(p.shared AS DOUBLE)
             / least(na.n_distinct, nb.n_distinct), 6) AS containment
FROM pairs p
JOIN srcn na ON p.src_a = na.source
JOIN srcn nb ON p.src_b = nb.source
""",
    tags=("X1", "dedup", "cross-source", "report"),
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE DUPLICATION MATRIX — the curation report that
    decides which dump to drop: for every source pair, the number of
    shared distinct content digests and the containment ratio
    (shared / min(|A|,|B|)). Two crawls of the same site show up as a
    high-containment pair; the smaller one is the cut candidate.

    Scale shape: one distinct over (source, digest), then a
    digest-keyed self-join whose per-digest fan-out is bounded by the
    number of SOURCES carrying that digest (sources are a small set;
    the join never pairs documents) and a groupBy on source pairs —
    output is |sources|² rows max regardless of corpus size."""
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    corpus = d.select("source", "text").unionAll(
        d.filter(F.col("doc_id") % 7 == 1).select(
            F.lit("mirror").alias("source"), "text"
        )
    ).unionAll(
        d.filter(F.col("doc_id") % 14 == 1).select(
            F.lit("mirror2").alias("source"), "text"
        )
    )
    per = corpus.select(
        "source", token_int(normalize_text(F.col("text"))).alias("digest")
    ).distinct()
    srcn = per.groupBy("source").agg(
        F.count_distinct("digest").alias("n_distinct")
    )
    a = per.select(F.col("source").alias("src_a"), "digest")
    b = per.select(F.col("source").alias("src_b"), "digest")
    pairs = (
        a.join(b, "digest")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        pairs.join(
            F.broadcast(srcn.select(F.col("source").alias("src_a"),
                                    F.col("n_distinct").alias("n_a"))),
            "src_a",
        )
        .join(
            F.broadcast(srcn.select(F.col("source").alias("src_b"),
                                    F.col("n_distinct").alias("n_b"))),
            "src_b",
        )
        .select(
            "src_a", "src_b", "shared", "n_a", "n_b",
            F.round(
                F.col("shared").cast("double") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


@query(
    "dedup_editdist_pairs",
    oracle="""
SELECT a.c_custkey AS a_key, b.c_custkey AS b_key,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
""",
    tags=("X1", "entity-resolution", "symspell"),
)
def dedup_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDIT-DISTANCE RECORD LINKAGE with SymSpell deletion-
    neighborhood blocking (Garbe 2012; the FastSS family): find every
    customer-name pair within Levenshtein distance 1 WITHOUT an
    all-pairs scan. Two strings are within edit distance 1 only if
    their single-deletion neighborhoods intersect (substitution =
    both delete the differing position; insert/delete = one side
    deletes the extra char; the identity variant catches distance 0),
    so candidates come from an EQUI-join on the variant string —
    O(n·L) keys instead of O(n²) comparisons — and the exact
    levenshtein() check then kills false candidates (e.g. adjacent
    transpositions, which share two variants but sit at distance 2).

    The oracle states the naive all-pairs quadratic form — tractable
    at sf0.01's 1,500 customers, which is the point: the blocked plan
    produces the identical pair set while scaling as keys, not pairs.
    At 100 TB the variant join inherits the same skew guard as the
    LSH band join (a hot variant bucket salts); variant count per
    record is length-bounded, so this is for SHORT keys — names,
    URLs, codes — not document bodies (those go through MinHash)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )
    variants = c.select(
        "k",
        "name",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, length(name)), i -> "
                    "CASE WHEN i = 0 THEN name "
                    "ELSE concat(substring(name, 1, i-1), "
                    "substring(name, i+1, length(name))) END)"
                )
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("v"), F.col("k").alias("a_key"), F.col("name").alias("a_name")
    )
    b = variants.select(
        F.col("v"), F.col("k").alias("b_key"), F.col("name").alias("b_name")
    )
    cand = (
        a.join(b, "v")
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("a_name", "b_name").cast("long")
        )
        .filter(F.col("dist") <= 1)
        .select("a_key", "b_key", "dist")
    )


_RECALL_EVAL_ORACLE = f"""
WITH {_MINHASH_CTE},
banded AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
allinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT i.id_a, i.id_b
  FROM allinter i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE i.inter / (za.sz + zb.sz - i.inter) >= {JACCARD_T}
),
u AS (
  SELECT COALESCE(e.id_a, c.id_a) AS id_a,
         (e.id_a IS NOT NULL) AS is_exact,
         (c.id_a IS NOT NULL) AS is_cand
  FROM exact e FULL OUTER JOIN cand c
    ON e.id_a = c.id_a AND e.id_b = c.id_b
)
SELECT CAST(count(CASE WHEN is_exact THEN 1 END) AS BIGINT) AS n_exact,
       CAST(count(CASE WHEN is_cand THEN 1 END) AS BIGINT) AS n_candidates,
       CAST(count(CASE WHEN is_exact AND is_cand THEN 1 END) AS BIGINT) AS tp,
       CAST(count(CASE WHEN is_exact AND NOT is_cand THEN 1 END) AS BIGINT)
         AS fn,
       round(CAST(count(CASE WHEN is_exact AND is_cand THEN 1 END) AS DOUBLE)
             / count(CASE WHEN is_exact THEN 1 END), 6) AS recall
FROM u
"""


@query(
    "dedup_lsh_recall_eval",
    oracle=_RECALL_EVAL_ORACLE,
    tags=("X1", "dedup", "lsh", "evaluation"),
)
def dedup_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH CANDIDATE RECALL, measured in-engine: the banding's
    candidate set compared against the ground-truth pair set (exact
    shingle Jaccard ≥ {JACCARD_T} over ALL pairs sharing a shingle) —
    n_exact / n_candidates / tp / fn / recall in one row. This turns
    the minhash_plan recall claim (91% at the boundary,
    MINHASH_RECALL_r07.json) from a bench artifact into an
    ORACLE-CHECKED query any corpus can run before trusting a dedup
    sweep: if recall here dips, re-derive the banding BEFORE the
    100 TB pass, not after.

    Scale shape: the ground-truth side is the exact shingle self-join
    — affordable at eval scale because shared-shingle fan-out bounds
    the pair space (this is an AUDIT run on a sample, not the dedup
    path itself; the production path stays LSH); the candidate side
    reuses the skew-guarded band join. The comparison is one full
    outer join of two pair sets + a single fold."""
    from cdc_via_flink_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    allinter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        allinter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("za")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("zb")),
            "id_b",
        )
        .filter(
            F.col("inter") / (F.col("za") + F.col("zb") - F.col("inter"))
            >= JACCARD_T
        )
        .select("id_a", "id_b", F.lit(True).alias("is_exact"))
    )
    sig = minhash_signatures(sh, NUM_HASHES)
    cand = lsh_candidate_pairs(sig, BANDS, ROWS).select(
        "id_a", "id_b", F.lit(True).alias("is_cand")
    )
    u = exact.join(cand, ["id_a", "id_b"], "full_outer").select(
        F.coalesce(F.col("is_exact"), F.lit(False)).alias("is_exact"),
        F.coalesce(F.col("is_cand"), F.lit(False)).alias("is_cand"),
    )
    return u.agg(
        F.count(F.when(F.col("is_exact"), 1)).cast("long").alias("n_exact"),
        F.count(F.when(F.col("is_cand"), 1)).cast("long").alias("n_candidates"),
        F.count(F.when(F.col("is_exact") & F.col("is_cand"), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("is_exact") & ~F.col("is_cand"), 1))
        .cast("long")
        .alias("fn"),
        F.round(
            F.count(F.when(F.col("is_exact") & F.col("is_cand"), 1)).cast(
                "double"
            )
            / F.count(F.when(F.col("is_exact"), 1)),
            6,
        ).alias("recall"),
    )


# ------------------------------------------------------------------
# Content-defined chunking (FastCDC/Rabin family)
# ------------------------------------------------------------------

_CDC_W = 8  # rolling-window width (chars)
_CDC_MOD = 64  # boundary if window-hash % 64 == 0 -> ~64-char chunks
_CDC_COEFS = [pow(37, j, _CDC_MOD) for j in range(_CDC_W)]  # 37^j mod 64


def _cdc_hash_lambda(text: str, pos: str) -> str:
    """Window hash of the _CDC_W chars ending at 1-based `pos` of
    `text` — identical SQL in both engines (ascii() returns the
    Unicode CODEPOINT in both, verified incl. CJK/Cyrillic)."""
    terms = " + ".join(
        f"ascii(substr({text}, CAST({pos} - {j} AS INT), 1)) * {c}"
        for j, c in enumerate(_CDC_COEFS)
    )
    return f"(({terms}) % {_CDC_MOD})"


def _cdc_bounds_sql(text: str) -> str:
    """Boundary position list: window-hash hits plus the final char
    (so every doc ends on a boundary), ascending."""
    hits = (
        f"list_filter(range({_CDC_W}, length({text})), "
        f"p -> {_cdc_hash_lambda(text, 'p')} = 0)"
    )
    return (
        f"list_sort(list_distinct(list_append("
        f"list_transform({hits}, p -> CAST(p AS BIGINT)), "
        f"CAST(length({text}) AS BIGINT))))"
    )


@query(
    "dedup_cdc_chunks",
    oracle=f"""
WITH b AS (
  SELECT doc_id, source, text, {_cdc_bounds_sql('text')} AS bounds
  FROM documents WHERE length(text) >= {_CDC_W}
),
chunks AS (
  SELECT source,
         unnest(list_transform(range(1, len(bounds) + 1),
           i -> substr(text,
                       CAST(CASE WHEN i = 1 THEN 1
                                 ELSE bounds[CAST(i AS INT) - 1] + 1 END AS INT),
                       CAST(bounds[CAST(i AS INT)]
                            - CASE WHEN i = 1 THEN 0
                                   ELSE bounds[CAST(i AS INT) - 1] END AS INT))))
           AS chunk
  FROM b
),
h AS (SELECT source, md5(chunk) AS ch, length(chunk) AS clen FROM chunks),
g AS (
  SELECT source, ch, CAST(count(*) AS BIGINT) AS n,
         CAST(max(clen) AS BIGINT) AS clen
  FROM h GROUP BY source, ch
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_chunks,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(sum(n * clen) AS BIGINT) AS total_chars,
       CAST(sum(clen) AS BIGINT) AS unique_chars,
       round(CAST(sum(clen) AS DOUBLE) / sum(n * clen), 6) AS stored_frac
FROM g GROUP BY source
ORDER BY source
""",
    tags=("X1", "dedup", "cdc-chunking", "storage"),
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTENT-DEFINED CHUNKING dedup accounting (the Rabin/FastCDC
    family every dedup STORE — restic/borg/data lakes with
    chunk-level dedup — runs under the document layer): chunk
    boundaries where the rolling 8-char window hash ≡ 0 (mod 64)
    (≈64-char expected chunks), so an insertion early in a document
    shifts only the chunk it lands in — unlike fixed-width blocks
    where one insert re-chunks the whole tail. Output per source:
    chunk counts, distinct chunks (by md5), and the stored fraction a
    chunk store would keep.

    Plan shape: boundary positions come from a per-row array pipeline
    (filter over the position range evaluating the 8-term polynomial
    — JVM-side lambdas, no Python, no position EXPLODE: rows only
    ever multiply at the CHUNK grain, n/64 per doc); the only
    shuffles are the two chunk-hash aggregates. The window hash uses
    exact integer codepoint arithmetic (ascii/substr parity verified
    cross-engine incl. non-ASCII), so boundaries are bit-identical in
    both engines. Min/max chunk-size clamps (the FastCDC
    normalization) are sequential dependencies and intentionally
    omitted — the expected-size knob here is the modulus."""
    from cdc_via_flink_spark.sources.tables import ensure_min_partitions

    # the boundary lambda is interpreted (higher-order fns don't
    # codegen) — per-doc CPU work that a single-row-group scan would
    # serialize onto one task; spread docs first (no-op at scale)
    d = ensure_min_partitions(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") >= _CDC_W
        )
    )
    bounds = F.expr(
        f"""array_sort(array_distinct(concat(
          transform(
            filter(sequence({_CDC_W}, length(text)),
                   p -> {_cdc_hash_lambda('text', 'p')} = 0),
            p -> CAST(p AS BIGINT)),
          array(CAST(length(text) AS BIGINT)))))"""
    )
    b = d.select("doc_id", "source", "text", bounds.alias("bounds"))
    chunk = F.expr(
        """transform(sequence(1, size(bounds)),
             i -> substr(text,
                         CAST(CASE WHEN i = 1 THEN 1
                              ELSE bounds[i - 2] + 1 END AS INT),
                         CAST(bounds[i - 1]
                              - CASE WHEN i = 1 THEN 0
                                     ELSE bounds[i - 2] END AS INT)))"""
    )
    chunks = b.select(
        "source", F.explode(chunk).alias("chunk")
    )
    h = chunks.select(
        "source",
        F.md5(F.col("chunk")).alias("ch"),
        F.length("chunk").alias("clen"),
    )
    # one pass: (source, chunk-hash) grain first, per-source stats
    # derived from it — the chunking explode runs exactly once
    g = h.groupBy("source", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("clen").cast("long").alias("clen"),
    )
    return (
        g.groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.col("n") * F.col("clen")).cast("long").alias("total_chars"),
            F.sum("clen").cast("long").alias("unique_chars"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            "total_chars",
            "unique_chars",
            F.round(
                F.col("unique_chars").cast("double") / F.col("total_chars"), 6
            ).alias("stored_frac"),
        )
        .orderBy("source")
    )


@query(
    "dedup_bucket_skew_audit",
    oracle=f"""
WITH {_MINHASH_CTE},
banded AS ({_sql_bands()}),
buckets AS (
  SELECT band, bsig, CAST(count(*) AS BIGINT) AS sz
  FROM banded GROUP BY band, bsig
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       CAST(sum(sz * (sz - 1) / 2) AS BIGINT) AS pair_mass
FROM buckets GROUP BY band ORDER BY band
""",
    tags=("X1", "dedup", "lsh", "skew-audit"),
)
def dedup_bucket_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH BUCKET-SKEW AUDIT — the per-band bucket-size census that
    DECIDES the band-join layout before running it (the declarative
    face of operators/banding.py's probe: max_bucket says whether the
    salted/pinned path engages; pair_mass = Σ C(sz,2) is the exact
    candidate-join cost the banding will pay). Shingle → signature →
    band pipeline reused from dedup_minhash_lsh; one (band, bsig)
    groupBy then band-grain rollup — the audit costs one aggregation,
    the quadratic work it predicts is never materialized here."""
    from cdc_via_flink_spark.operators.dedup import minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    sig = minhash_signatures(sh, NUM_HASHES)
    frames = []
    for b in range(BANDS):
        cols = [f"mh{b * ROWS + r}" for r in range(ROWS)]
        frames.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.concat_ws(
                    "-", *[F.col(c).cast("string") for c in cols]
                ).alias("bsig"),
            )
        )
    banded = frames[0]
    for bf in frames[1:]:
        banded = banded.unionByName(bf)
    buckets = banded.groupBy("band", "bsig").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        buckets.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
            .cast("long")
            .alias("pair_mass"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Capture–recapture corpus-size estimate (Chapman estimator)
# ---------------------------------------------------------------------------


@query(
    "dedup_capture_recapture",
    oracle=f"""
WITH corpus AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 7 = 1
  UNION ALL
  SELECT 'mirror2' AS source, text FROM documents WHERE doc_id % 14 = 1
),
d AS (SELECT source, {_SQL_DIGEST} AS digest FROM corpus),
per AS (SELECT DISTINCT source, digest FROM d),
srcn AS (
  SELECT source, CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct
  FROM per GROUP BY source
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(count(*) AS BIGINT) AS m
  FROM per a JOIN per b ON a.digest = b.digest AND a.source < b.source
  GROUP BY a.source, b.source
),
est AS (
  SELECT p.src_a, p.src_b, na.n_distinct AS n_a, nb.n_distinct AS n_b, p.m,
         CAST(na.n_distinct + 1 AS DOUBLE) * (nb.n_distinct + 1)
           / (p.m + 1) - 1 AS n_hat
  FROM pairs p
  JOIN srcn na ON na.source = p.src_a
  JOIN srcn nb ON nb.source = p.src_b
)
SELECT src_a, src_b, n_a, n_b, m,
       round(n_hat, 2) AS n_hat,
       round(n_hat - (n_a + n_b - m), 2) AS unseen_est,
       round((n_a + n_b - m) / n_hat, 6) AS coverage
FROM est
ORDER BY src_a, src_b
""",
    tags=("X1", "dedup", "capture-recapture", "corpus-stats"),
)
def dedup_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CAPTURE–RECAPTURE POPULATION ESTIMATE per source pair (Chapman
    1951, the bias-corrected Lincoln–Petersen): treat two partial
    crawls as two "captures" of the same underlying document
    population and estimate its TRUE size from the overlap —
    N_hat = (n_a+1)(n_b+1)/(m+1) − 1 — plus the implied unseen count
    and coverage. dedup_source_overlap says how much two dumps
    DUPLICATE each other; this says how much of the underlying corpus
    the pair has NOT seen yet (the crawl-more-or-stop decision), on
    the same controlled mirror construction.

    Scale shape: identical to the overlap matrix — one distinct over
    (source, digest), a digest-keyed join whose fan-out is bounded by
    the source count, |sources|² output rows; the estimator itself is
    one double chain on three exact BIGINTs per pair."""
    from cdc_via_flink_spark.functions.hashing import token_int
    from cdc_via_flink_spark.functions.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    corpus = (
        d.select("source", "text")
        .unionAll(
            d.filter(F.col("doc_id") % 7 == 1).select(
                F.lit("mirror").alias("source"), "text"
            )
        )
        .unionAll(
            d.filter(F.col("doc_id") % 14 == 1).select(
                F.lit("mirror2").alias("source"), "text"
            )
        )
    )
    per = corpus.select(
        "source", token_int(normalize_text(F.col("text"))).alias("digest")
    ).distinct()
    srcn = per.groupBy("source").agg(
        F.count_distinct("digest").cast("long").alias("n_distinct")
    )
    a = per.select(F.col("source").alias("src_a"), "digest")
    b = per.select(F.col("source").alias("src_b"), "digest")
    pairs = (
        a.join(b, "digest")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    n_hat = (
        (F.col("n_a") + 1).cast("double")
        * (F.col("n_b") + 1)
        / (F.col("m") + 1)
        - 1
    )
    return (
        pairs.join(
            F.broadcast(
                srcn.select(
                    F.col("source").alias("src_a"),
                    F.col("n_distinct").alias("n_a"),
                )
            ),
            "src_a",
        )
        .join(
            F.broadcast(
                srcn.select(
                    F.col("source").alias("src_b"),
                    F.col("n_distinct").alias("n_b"),
                )
            ),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "m",
            F.round(n_hat, 2).alias("n_hat"),
            F.round(n_hat - (F.col("n_a") + F.col("n_b") - F.col("m")), 2).alias(
                "unseen_est"
            ),
            F.round(
                (F.col("n_a") + F.col("n_b") - F.col("m")) / n_hat, 6
            ).alias("coverage"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# One-Permutation-Hashing MinHash (densified OPH) — the signature-
# cost path: one universal hash per shingle instead of NUM_HASHES
# ---------------------------------------------------------------------------


def _sql_oph_cte() -> str:
    from cdc_via_flink_spark.functions.hashing import P, a_j, b_j

    K = NUM_HASHES
    cols = ",\n         ".join(
        f"max(CASE WHEN bin2 = {j} THEN sv + {P} * (sb - bin2) END) AS mh{j}"
        for j in range(K)
    )
    return f"""
sh AS ({SQL_SHINGLES}),
hv AS (
  SELECT doc_id, ({a_j(0)} * ({SQL_TOK} % {P}) + {b_j(0)}) % {P} AS v FROM sh
),
fb AS MATERIALIZED (
  SELECT doc_id, v % {K} AS bin, min(v // {K}) AS inval
  FROM hv GROUP BY doc_id, v % {K}
),
fb2 AS (
  SELECT doc_id, bin, inval FROM fb
  UNION ALL SELECT doc_id, bin + {K} AS bin, inval FROM fb
),
cov AS (
  SELECT doc_id, inval, bin AS src_bin,
         unnest(range(COALESCE(lag(bin) OVER (
             PARTITION BY doc_id ORDER BY bin), -1) + 1, bin + 1)) AS bin2
  FROM fb2
),
dd AS (
  SELECT doc_id, bin2, inval AS sv, src_bin AS sb
  FROM cov WHERE bin2 < {K}
),
sig AS MATERIALIZED (
  SELECT doc_id,
         {cols}
  FROM dd WHERE bin2 < {K} GROUP BY doc_id
)"""


_OPH_ORACLE = f"""
WITH {_sql_oph_cte()},
banded AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.sh = sa.sh
  GROUP BY c.id_a, c.id_b
)
SELECT i.id_a, i.id_b, i.inter, za.sz AS size_a, zb.sz AS size_b,
       round(i.inter / (za.sz + zb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.id_a
JOIN sizes zb ON zb.doc_id = i.id_b
WHERE i.inter / (za.sz + zb.sz - i.inter) >= {JACCARD_T}
"""


@query(
    "dedup_oph_pairs",
    oracle=_OPH_ORACLE,
    tags=("X1", "dedup", "lsh", "oph"),
)
def dedup_oph_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via DENSIFIED ONE-PERMUTATION MinHash (Li, Owen
    & Zhang 2012; Shrivastava & Li 2014) at the SAME derived
    (54, 18, 3) sizing and the same banding/verification pipeline as
    dedup_minhash_lsh — but the signature stage evaluates ONE
    universal hash per shingle instead of 54. At 100 TB the signature
    pass is the dominant map-side cost of the dedup pipeline, so this
    is the 54x-cheaper-signatures operating point; the price is
    OPH's slightly different collision statistics, MEASURED (not
    asserted) by dedup_oph_recall_eval. Verification is exact
    Jaccard, so emitted pairs are exactly as trustworthy — only
    candidate RECALL can differ from classic MinHash."""
    from cdc_via_flink_spark.operators.dedup import (
        doc_shingles,
        jaccard_on_pairs,
        lsh_candidate_pairs,
        oph_signatures,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    # the signature is doc-count-sized (55 longs/doc); snapshotting it
    # stops the composable banding's 18 band projections + the skew
    # probe from re-inlining the whole shingle pipeline (measured
    # 85.7 s -> ~8 s at sf0.1)
    sig = oph_signatures(sh, NUM_HASHES).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sig, BANDS, ROWS)
    verified = jaccard_on_pairs(cand, sh)
    return verified.filter(F.col("jaccard") >= JACCARD_T).select(
        "id_a",
        "id_b",
        "inter",
        F.col("size_a").cast("long").alias("size_a"),
        F.col("size_b").cast("long").alias("size_b"),
        F.round("jaccard", 6).alias("jaccard"),
    )


_OPH_RECALL_ORACLE = f"""
WITH {_sql_oph_cte()},
banded AS ({_sql_bands()}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
allinter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT i.id_a, i.id_b
  FROM allinter i
  JOIN sizes za ON za.doc_id = i.id_a
  JOIN sizes zb ON zb.doc_id = i.id_b
  WHERE i.inter / (za.sz + zb.sz - i.inter) >= {JACCARD_T}
),
u AS (
  SELECT COALESCE(e.id_a, c.id_a) AS id_a,
         (e.id_a IS NOT NULL) AS is_exact,
         (c.id_a IS NOT NULL) AS is_cand
  FROM exact e FULL OUTER JOIN cand c
    ON e.id_a = c.id_a AND e.id_b = c.id_b
)
SELECT CAST(count(CASE WHEN is_exact THEN 1 END) AS BIGINT) AS n_exact,
       CAST(count(CASE WHEN is_cand THEN 1 END) AS BIGINT) AS n_candidates,
       CAST(count(CASE WHEN is_exact AND is_cand THEN 1 END) AS BIGINT) AS tp,
       CAST(count(CASE WHEN is_exact AND NOT is_cand THEN 1 END) AS BIGINT)
         AS fn,
       round(CAST(count(CASE WHEN is_exact AND is_cand THEN 1 END) AS DOUBLE)
             / count(CASE WHEN is_exact THEN 1 END), 6) AS recall
FROM u
"""


@query(
    "dedup_oph_recall_eval",
    oracle=_OPH_RECALL_ORACLE,
    tags=("X1", "dedup", "oph", "evaluation"),
)
def dedup_oph_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPH CANDIDATE RECALL vs exact ground truth — the honest price
    tag on dedup_oph_pairs' 54x signature saving: same in-engine
    audit as dedup_lsh_recall_eval (exact shingle-Jaccard >= 0.5
    ground truth, full-outer pair-set comparison, one summary row),
    candidates from the DENSIFIED OPH signature at the identical
    derived (54, 18, 3) sizing. Run both audits on a corpus sample;
    if OPH recall is within budget, take the cheap signatures for
    the 100 TB pass."""
    from cdc_via_flink_spark.operators.dedup import (
        lsh_candidate_pairs,
        oph_signatures,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "text", "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    allinter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        allinter.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("sz").alias("za")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("sz").alias("zb")),
            "id_b",
        )
        .filter(
            F.col("inter") / (F.col("za") + F.col("zb") - F.col("inter"))
            >= JACCARD_T
        )
        .select("id_a", "id_b", F.lit(True).alias("is_exact"))
    )
    sig = oph_signatures(sh, NUM_HASHES).localCheckpoint(eager=True)
    cand = lsh_candidate_pairs(sig, BANDS, ROWS).select(
        "id_a", "id_b", F.lit(True).alias("is_cand")
    )
    u = exact.join(cand, ["id_a", "id_b"], "full_outer").select(
        F.coalesce(F.col("is_exact"), F.lit(False)).alias("is_exact"),
        F.coalesce(F.col("is_cand"), F.lit(False)).alias("is_cand"),
    )
    return u.agg(
        F.count(F.when(F.col("is_exact"), 1)).cast("long").alias("n_exact"),
        F.count(F.when(F.col("is_cand"), 1)).cast("long").alias("n_candidates"),
        F.count(F.when(F.col("is_exact") & F.col("is_cand"), 1))
        .cast("long")
        .alias("tp"),
        F.count(F.when(F.col("is_exact") & ~F.col("is_cand"), 1))
        .cast("long")
        .alias("fn"),
        F.round(
            F.count(F.when(F.col("is_exact") & F.col("is_cand"), 1)).cast(
                "double"
            )
            / F.count(F.when(F.col("is_exact"), 1)),
            6,
        ).alias("recall"),
    )


# ---------------------------------------------------------------------------
# Fellegi-Sunter blocked record linkage (structured entity resolution)
# ---------------------------------------------------------------------------

import math as _math

# Published m/u conditional-agreement parameters of the linkage model
# (operator inputs; a production deployment estimates them by EM).
# Weights are precomputed HERE and inlined as identical literals into
# both engines, so no cross-engine log() is ever evaluated.
_FS_PARAMS = {
    "name": (0.95, 0.01),
    "bal": (0.90, 0.05),
    "seg": (0.85, 0.20),
}
_FS_W = {
    f: (
        round(_math.log2(m / u), 6),
        round(_math.log2((1 - m) / (1 - u)), 6),
    )
    for f, (m, u) in _FS_PARAMS.items()
}
_FS_MATCH_T = "4.0"  # score thresholds of the decision rule
_FS_POSSIBLE_T = "0.0"


def _fs_weight_sql(field: str, agree_expr: str) -> str:
    wa, wd = _FS_W[field]
    return (
        f"CASE WHEN {agree_expr} THEN CAST({wa} AS DECIMAL(18,6)) "
        f"ELSE CAST({wd} AS DECIMAL(18,6)) END"
    )


@query(
    "dedup_record_linkage",
    oracle=f"""
WITH clean AS (
  SELECT c_custkey AS key, c_name AS name, c_nationkey AS nk,
         c_acctbal AS bal, c_mktsegment AS seg,
         CAST(floor(c_acctbal / 100) AS BIGINT) AS blk
  FROM customer
),
dirty AS (
  SELECT c_custkey AS key,
         CASE WHEN c_custkey % 3 = 0
              THEN substr(c_name, 1, length(c_name) - 1)
              WHEN c_custkey % 3 = 1
              THEN substr(c_name, 1, length(c_name) - 1) || 'X'
              ELSE c_name END AS name,
         c_nationkey AS nk,
         CASE WHEN c_custkey % 2 = 0 THEN round(c_acctbal, 0)
              ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey % 7 = 0 THEN 'UNKNOWN'
              ELSE c_mktsegment END AS seg
  FROM customer
),
pairs AS (
  SELECT d.key AS dkey, c.key AS ckey,
         {_fs_weight_sql("name", "levenshtein(d.name, c.name) <= 1")}
         + {_fs_weight_sql("bal", "abs(d.bal - c.bal) < 1.0")}
         + {_fs_weight_sql("seg", "d.seg = c.seg")} AS score
  FROM dirty d
  JOIN clean c
    ON d.nk = c.nk AND CAST(floor(d.bal / 100) AS BIGINT) = c.blk
),
decided AS (
  SELECT CASE WHEN score >= {_FS_MATCH_T} THEN 'match'
              WHEN score >= {_FS_POSSIBLE_T} THEN 'possible'
              ELSE 'non-match' END AS decision,
         CASE WHEN dkey = ckey THEN 1 ELSE 0 END AS is_true
  FROM pairs
)
SELECT decision,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(is_true) AS BIGINT) AS n_true_pairs,
       round(CAST(sum(is_true) AS DOUBLE) / count(*), 6) AS "precision"
FROM decided
GROUP BY decision
ORDER BY decision
""",
    tags=("X1", "record-linkage", "fellegi-sunter"),
)
def dedup_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FELLEGI-SUNTER BLOCKED RECORD LINKAGE (Fellegi & Sunter 1969)
    — structured entity resolution, the tabular sibling of the text
    near-dup family: a deterministically perturbed "dirty" twin of
    the customer table (name truncation/typo by custkey mod, balance
    rounding, segment nulling) is linked back against the clean
    records. Field agreements (name within edit distance 1, balance
    within 1.0, segment equality) are scored with log2(m/u)
    agreement / log2((1-m)/(1-u)) disagreement weights — precomputed
    constants inlined identically into both engines — and the summed
    score drives the classic match / possible / non-match decision
    rule; ground truth (same custkey) yields per-decision precision.

    Scale shape: candidate generation is a BLOCKED equi-join on
    (nationkey, floor(balance/100)) — the dedup blocking argument on
    a compound quasi-identifier key whose cardinality grows with the
    balance range, never an all-pairs compare; records whose
    perturbation crosses a block boundary are honestly lost
    (blocking recall < 100 % is the textbook trade). Weights fold as
    exact DECIMAL(18,6); thresholds compare exactly; the only
    doubles are the final precision divides."""
    c0 = load_table(spark, sf_dir, "customer")
    clean = c0.select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_name").alias("cname"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("cbal"),
        F.col("c_mktsegment").alias("cseg"),
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("blk"),
    )
    dirty = c0.select(
        F.col("c_custkey").alias("dkey"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.expr("substr(c_name, 1, length(c_name) - 1)"),
        )
        .when(
            F.col("c_custkey") % 3 == 1,
            F.concat(
                F.expr("substr(c_name, 1, length(c_name) - 1)"), F.lit("X")
            ),
        )
        .otherwise(F.col("c_name"))
        .alias("dname"),
        F.col("c_nationkey").alias("nk"),
        F.when(F.col("c_custkey") % 2 == 0, F.round(F.col("c_acctbal"), 0))
        .otherwise(F.col("c_acctbal"))
        .alias("dbal"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("dseg"),
    )

    def w(field: str, agree):
        wa, wd = _FS_W[field]
        dec = "decimal(18,6)"
        return F.when(agree, F.lit(wa).cast(dec)).otherwise(F.lit(wd).cast(dec))

    pairs = dirty.join(
        clean,
        (dirty.nk == clean.nk)
        & (F.floor(dirty.dbal / 100).cast("long") == clean.blk),
    ).select(
        "dkey",
        "ckey",
        (
            w("name", F.levenshtein(F.col("dname"), F.col("cname")) <= 1)
            + w("bal", F.abs(F.col("dbal") - F.col("cbal")) < 1.0)
            + w("seg", F.col("dseg") == F.col("cseg"))
        ).alias("score"),
    )
    match_t = F.lit(float(_FS_MATCH_T))
    poss_t = F.lit(float(_FS_POSSIBLE_T))
    decided = pairs.select(
        F.when(F.col("score") >= match_t, F.lit("match"))
        .when(F.col("score") >= poss_t, F.lit("possible"))
        .otherwise(F.lit("non-match"))
        .alias("decision"),
        F.when(F.col("dkey") == F.col("ckey"), 1).otherwise(0).alias("is_true"),
    )
    return (
        decided.groupBy("decision")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("is_true").cast("long").alias("n_true_pairs"),
        )
        .select(
            "decision",
            "n_pairs",
            "n_true_pairs",
            F.round(
                F.col("n_true_pairs").cast("double") / F.col("n_pairs"), 6
            ).alias("precision"),
        )
        .orderBy("decision")
    )
