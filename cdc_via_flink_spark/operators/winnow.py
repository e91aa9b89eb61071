"""Winnowing local fingerprints (Schleimer/Wilkerson/Aiken 2003, the
MOSS algorithm) as a reusable operator surface (SURVEY.md X1/X3
extension): map-side selection, a persisted fingerprint index, and the
INCREMENTAL overlap gate — "check every arriving batch for partial
overlap against the indexed corpus" is the benchmark-decontamination
flow a training-data pipeline runs at ingest, the winnowing analog of
dedup.incremental_neardup_pairs.

Selection is document-local higher-order expressions over the token
array — no gram row ever shuffles by doc_id; only the ~2/(W+1)-dense
selected fingerprints become rows (see winnow_selected). The declared
queries (plans/text_queries.py::text_winnow_*) pin the semantics
against windowed-SQL DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cdc_via_flink_spark.functions.hashing import P, token_int
from cdc_via_flink_spark.functions.text import shingles_from_tokens, tokens

WINNOW_K = 4  # gram width (words)
WINNOW_W = 4  # window width (consecutive grams)
WINNOW_FP_CAP = 256  # drop fingerprints shared by more docs (uninformative)
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many fps
# version of the fingerprint function (token hash base + encoding);
# bump when token_int / P / the position encoding change semantics —
# persisted indexes validate it at probe time (the dedup-index
# hash-family recipe, ADVICE r7)
WINNOW_VERSION = 1


def winnow_selected(
    d: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = (),
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """(doc_id, *extra_cols, se): each document's DISTINCT winnowing
    selections, se = h*1024 + (1023 - pos%1024) (min over every
    w-gram window; the encoding makes one integer min order by hash
    then rightmost position; pos%1024 aliases only beyond 1024-gram
    documents, where a deployment widens the encoding).

    ENTIRELY MAP-SIDE: winnowing is document-local, so the gram
    hashes, per-window minima, and distinct selection are higher-order
    expressions over the token array — NO shuffle of gram rows by
    doc_id (a windowed-SQL formulation would hashpartition every gram
    row; at 100 TB that exchange is the whole cost). Arrays are
    materialized one per projection (tk → hs → enc) so the
    multiply-referenced non-cheap aliases stay materialized (the
    shingles_from_tokens CollapseProject note)."""
    toks = d.select(
        F.col(id_col).alias("doc_id"), *extra_cols, tokens(F.col(text_col)).alias("tk")
    )
    hs = toks.select(
        "doc_id",
        *extra_cols,
        F.transform(
            shingles_from_tokens(F.col("tk"), k),
            lambda g: token_int(g) % F.lit(P),
        ).alias("hs"),
    )
    enc = hs.select(
        "doc_id",
        *extra_cols,
        F.transform(
            F.col("hs"),
            lambda h, i: h * 1024 + (1023 - F.pmod(i + 1, F.lit(1024))),
        ).alias("enc"),
    )
    return enc.select(
        "doc_id",
        *extra_cols,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.col("enc"),
                    lambda _x, i: F.array_min(F.slice(F.col("enc"), i + 1, w)),
                )
            )
        ).alias("se"),
    )


def winnow_fingerprints(
    d: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
) -> DataFrame:
    """DISTINCT (doc_id, fh) fingerprint rows — the document sketch
    (position multiplicity collapsed; the pair surfaces join on
    these)."""
    return (
        winnow_selected(d, text_col, id_col, (), k, w)
        .select("doc_id", F.expr("se DIV 1024").alias("fh"))
        .distinct()
    )


def save_winnow_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Persist the corpus's winnowing fingerprints — `path/fp` holds
    DISTINCT (doc_id, fh) CLUSTERED by fh so an incremental probe's
    equi-join reads co-located runs, plus `path/fp_counts` (fh →
    n_docs, the per-fingerprint document counts the common-fingerprint
    cut needs WITHOUT re-aggregating the whole index per probe) and a
    one-row `path/meta` pinning (k, w, fp_cap, min_shared, version)
    that load/probe validate — a probe at different gram/window
    sizing, or across a fingerprint-function change, would join on
    disjoint fh keys and silently report zero overlap (the dedup-index
    meta recipe)."""
    fp = winnow_fingerprints(df, text_col, id_col)
    fp.repartition("fh").sortWithinPartitions("fh").write.mode(
        "overwrite"
    ).parquet(path + "/fp")
    fp.groupBy("fh").agg(F.count(F.lit(1)).alias("n_docs")).write.mode(
        "overwrite"
    ).parquet(path + "/fp_counts")
    df.sparkSession.createDataFrame(
        [(WINNOW_K, WINNOW_W, WINNOW_FP_CAP, WINNOW_MIN_SHARED, WINNOW_VERSION)],
        "k int, w int, fp_cap int, min_shared int, version int",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def check_winnow_meta(spark, path: str):
    """Validate the stored index's FINGERPRINT-FUNCTION parameters
    (k, w, version) against this build's — probing across a mismatch
    there silently yields near-zero overlap, never an error — and
    return the meta row. fp_cap/min_shared are POLICY thresholds, not
    compatibility: callers read them FROM the returned meta so a
    stored index remains usable (at its own recorded policy) across a
    constant change in this module (round-8 ADVICE). Existence is
    probed through Spark, not the local os module, so indexes on
    non-local filesystems (hdfs://, s3a://) validate instead of
    always erroring (round-8 ADVICE)."""
    from pyspark.errors import AnalysisException

    try:
        m = spark.read.parquet(path + "/meta").head()
    except AnalysisException as e:
        raise ValueError(
            f"winnow index meta not found at {path + '/meta'!r}: not a "
            "winnow index or saved by a pre-metadata build — rebuild with "
            "save_winnow_index."
        ) from e
    ours = (WINNOW_K, WINNOW_W, WINNOW_VERSION)
    theirs = (m.k, m.w, m.version)
    if ours != theirs:
        raise ValueError(
            f"winnow index at {path!r} stores (k, w, version) = {theirs} "
            f"but this build computes {ours}: fingerprints would not "
            "collide. Rebuild the index."
        )
    return m


def incremental_pairs_against(
    fp_old: DataFrame,
    cnt_old: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_cap: int = WINNOW_FP_CAP,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """Core of the incremental gate given the stored side as frames:
    fp_old = (doc_id, fh) distinct rows, cnt_old = (fh, n_docs)
    per-fingerprint doc counts of the SAME corpus. Both
    incremental_winnow_pairs (parquet index) and the streaming
    maintainer (base ∪ committed deltas) call this; semantics and the
    monolithic-equivalence argument live here (see
    incremental_winnow_pairs). fp_cap/min_shared default to the module
    constants; index-backed callers pass the values pinned in the
    index's meta so a stored index keeps its own recorded policy."""
    fp_new = winnow_fingerprints(new_df, text_col, id_col)
    # A re-ingested document (present in BOTH fp_old and the batch)
    # must count ONCE per fingerprint in the common-fingerprint cut:
    # anti-join the batch's (doc, fh) rows against the already-indexed
    # ones before counting, so nd = |distinct docs holding fh in
    # old ∪ batch| — the monolithic count (round-8 ADVICE: the
    # double-count could push a fingerprint over fp_cap or falsely
    # reach the >=2 floor). fp_old is semi-pruned to batch doc ids
    # first so the anti-join's right side stays batch-sized (disjoint
    # batches — the common case — prune it to empty). Cost: one extra
    # SCAN of fp_old per probe (the semi-join's build side is the tiny
    # batch-ids set, so no fp_old shuffle); correctness under
    # at-least-once redelivery is worth a scan.
    batch_ids = fp_new.select("doc_id").distinct()
    already = fp_old.join(batch_ids, "doc_id", "left_semi")
    cnt_new = (
        fp_new.join(already, ["doc_id", "fh"], "left_anti")
        .groupBy("fh")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    keep = (
        cnt_new.join(cnt_old, "fh", "full_outer")
        .select(
            "fh",
            (
                F.coalesce(F.col("n_new"), F.lit(0))
                + F.coalesce(F.col("n_docs"), F.lit(0))
            ).alias("nd"),
        )
        .filter((F.col("nd") >= 2) & (F.col("nd") <= fp_cap))
        .select("fh")
    )
    new_kept = fp_new.join(keep, "fh", "left_semi")
    old_kept = fp_old.join(keep, "fh", "left_semi")

    nn = (
        new_kept.alias("a")
        .join(
            new_kept.alias("b"),
            (F.col("a.fh") == F.col("b.fh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fh").alias("fh"),
        )
    )
    no = (
        new_kept.alias("n")
        .join(
            old_kept.alias("o"),
            (F.col("n.fh") == F.col("o.fh"))
            # a re-ingested doc present on both sides must not emit a
            # degenerate self-pair (the incremental_neardup_pairs rule)
            & (F.col("n.doc_id") != F.col("o.doc_id")),
        )
        .select(
            F.least(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_a"),
            F.greatest(F.col("n.doc_id"), F.col("o.doc_id")).alias("id_b"),
            F.col("n.fh").alias("fh"),
        )
    )
    # a pair whose BOTH members are in the batch while one is also
    # already indexed appears in both branches for the same fh —
    # distinct at (pair, fh) granularity before counting, or those
    # shared fingerprints would double-count vs the monolithic run
    return (
        nn.unionByName(no)
        .distinct()
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def incremental_winnow_pairs(
    new_df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """INCREMENTAL winnowing overlap: all (id_a < id_b, shared_fps >=
    WINNOW_MIN_SHARED) pairs involving at least one NEW document —
    exactly the monolithic pair query over (indexed ∪ new) restricted
    to new-involving pairs (fingerprints are per-doc-independent;
    pinned by tests/test_unicode_text.py::
    test_incremental_winnow_equals_monolithic_restricted). The
    common-fingerprint cut is computed over the UNION's counts
    (stored per-fh counts + the batch's), so the kept-fingerprint set
    matches the monolithic run's — only the batch is tokenized, and
    stored fingerprints participate through one equi-join.

    This is the ingest-time decontamination gate: arriving documents
    checked for partial overlap (benchmark text, boilerplate, dup
    spans) against the indexed corpus before admission."""
    spark = new_df.sparkSession
    meta = check_winnow_meta(spark, path)
    fp_old = spark.read.parquet(path + "/fp")
    cnt_old = spark.read.parquet(path + "/fp_counts")
    return incremental_pairs_against(
        fp_old,
        cnt_old,
        new_df,
        text_col,
        id_col,
        fp_cap=meta.fp_cap,
        min_shared=meta.min_shared,
    )
