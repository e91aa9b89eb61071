"""Distributed Bloom-filter membership gate (SURVEY.md X1 — the
ingest-time pre-screen in front of exact dedup).

Why this exists at 100 TB: exact dedup of an arriving batch against a
multi-petabyte corpus is a join against the full corpus digest set.
A Bloom filter built once over the corpus digests collapses that to a
join against an ``m/32``-row bitmap table — ~0.3 M words per million
members at 1 % FPR (≈9.6 bits/member), i.e. megabytes where the corpus
digest set is gigabytes; at billions of members the bitmap is a few
hundred million words and the probe join shuffles on ``word`` instead
of broadcasting (see :func:`bloom_probe`), still never touching corpus
rows. Definite-miss rows (the overwhelming majority in a healthy
ingest) never reach the corpus at all, and only the maybe-dup
remainder proceeds to the exact digest join. Zero false negatives by
construction — a true duplicate can never slip through.

Spark-first shape:

- build: digests -> k universal-hash bit positions (pure expressions,
  one ``explode`` of a k-element array) -> ``groupBy(word)`` with
  ``bit_or(mask)`` — ONE shuffle bounded by m/32 keys regardless of
  corpus size, with map-side partial OR.
- probe: each probe digest explodes to its k (word, mask) rows, a
  broadcast (or, beyond the threshold, shuffle) equi-join on ``word``
  fetches the bitmap words, and ``bool_and((bits & mask) = mask)``
  per probe id folds the verdict. No corpus data moves.

Words are 32-bit (``mask = 1 << (pos % 32)`` fits a BIGINT with no
sign-bit edge case), so the same bitwise arithmetic is exact in both
Spark and DuckDB — the declared query's oracle recomputes the filter
bit-for-bit.

Hashes come from the cross-engine universal family in
``functions/hashing.py`` (md5-derived digest ints, splitmix64-mixed
(a_j, b_j) coefficients): position_j = h_j(digest) mod m. Probe
offsets start at ``_J_BASE`` so the Bloom family is independent of the
MinHash family's j-range.

Reference parity note: the reference (a 2-pipeline Flink CDC demo,
DebeziumTransactionReconstructor.java) has no dedup surface at all;
this module belongs to the LLM-pipeline extension mandated alongside
SURVEY.md §2.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from cdc_via_flink_spark.functions.hashing import P, a_j, b_j

# j-offset separating the Bloom hash family from the MinHash family's
# j = 0..NUM_HASHES-1 range (same generator, disjoint coefficients).
_J_BASE = 1000

WORD_BITS = 32

# bloom_probe broadcasts the bitmap only while it is provably small:
# 2^19 words = 16 MiB of raw (word, bits) longs, comfortably inside
# executor memory and the classic 10 MB–scale broadcast regime once
# compressed. Beyond this (≳1.7 M members at 1 % FPR) the hint is
# omitted and AQE picks the join strategy — a forced broadcast of a
# multi-gigabyte bitmap would OOM the driver at exactly the corpus
# sizes the module is for (ADVICE r9).
_BROADCAST_MAX_WORDS = 1 << 19


def bloom_plan(n: int, target_fpr: float = 0.01) -> tuple[int, int]:
    """Size (m_bits, k) for ``n`` expected members at ``target_fpr``.

    Standard optimum: m = -n ln p / (ln 2)^2, k = (m/n) ln 2. m is
    rounded up to a multiple of WORD_BITS so the bitmap is whole
    words. The declared query pins fixed literals instead (a static
    SQL oracle cannot size from data — the sim_ann_lsh precedent);
    this helper is the data-driven path a production caller uses.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if not (0.0 < target_fpr < 1.0):
        raise ValueError(f"target_fpr must be in (0,1), got {target_fpr}")
    m = math.ceil(-n * math.log(target_fpr) / (math.log(2) ** 2))
    m = ((m + WORD_BITS - 1) // WORD_BITS) * WORD_BITS
    k = max(1, round(m / n * math.log(2)))
    return m, k


def bloom_fpr(n: int, m_bits: int, k: int) -> float:
    """Model false-positive rate after n inserts: (1 - e^{-kn/m})^k."""
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def _positions(digest: Column, m_bits: int, k: int) -> Column:
    """Array of the k bit positions for a digest-int column."""
    return F.array(
        *[
            (
                (F.lit(a_j(_J_BASE + j)) * (digest % F.lit(P)) + F.lit(b_j(_J_BASE + j)))
                % F.lit(P)
            )
            % F.lit(m_bits)
            for j in range(k)
        ]
    )


def sql_positions(digest_expr: str, m_bits: int, k: int) -> str:
    """DuckDB twin of :func:`_positions` — a list literal of the same
    k position expressions (inlined coefficients, not the formula)."""
    exprs = ", ".join(
        f"(({a_j(_J_BASE + j)} * (({digest_expr}) % {P}) + {b_j(_J_BASE + j)})"
        f" % {P}) % {m_bits}"
        for j in range(k)
    )
    return f"[{exprs}]"


def bloom_build(
    members: DataFrame, digest_col: str, m_bits: int, k: int
) -> DataFrame:
    """Build the bitmap: (word long, bits long), ≤ m_bits/32 rows.

    One explode (k rows per member) + one ``groupBy(word)`` with
    map-side-combining ``bit_or`` — the only shuffle, bounded by the
    word count, not the corpus size.
    """
    if m_bits <= 0 or m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a positive multiple of {WORD_BITS}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    pos = members.select(
        F.explode(_positions(F.col(digest_col), m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word"),
            F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    id_col: str,
    digest_col: str,
    bitmap: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Membership verdict per probe row: (id_col, bloom_hit boolean).

    The probe side explodes to k (word, mask) rows, equi-joins the
    bitmap on ``word``, and ``bool_and`` folds the k tests. The
    broadcast hint is applied only while the bitmap is provably small
    (≤ ``_BROADCAST_MAX_WORDS`` rows, 16 MiB of longs); larger bitmaps
    get no hint — AQE chooses, typically a shuffle on ``word`` that
    still never touches corpus rows. An absent word means those bits
    are all zero (coalesce 0), so sparse bitmaps need no
    densification.
    """
    pm = probes.select(
        F.col(id_col), F.explode(_positions(F.col(digest_col), m_bits, k)).alias("pos")
    ).select(
        id_col,
        F.floor(F.col("pos") / WORD_BITS).cast("long").alias("word"),
        F.expr(f"shiftleft(1L, cast(pos % {WORD_BITS} as int))").alias("mask"),
    )
    right = (
        F.broadcast(bitmap)
        if m_bits // WORD_BITS <= _BROADCAST_MAX_WORDS
        else bitmap
    )
    joined = pm.join(right, "word", "left").select(
        id_col,
        (
            F.coalesce(F.col("bits"), F.lit(0).cast("long")).bitwiseAND(F.col("mask"))
            == F.col("mask")
        ).alias("hit"),
    )
    return joined.groupBy(id_col).agg(F.bool_and("hit").alias("bloom_hit"))


def counting_bloom_counts(
    members: DataFrame,
    deletes: DataFrame,
    digest_col: str,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Counting-Bloom net counters: (pos long, cnt long), ≤ m_bits
    rows. The deletable form of the bitmap — each member increments
    its k position counters, each DELETED member decrements them, so
    membership survives deletion of OTHER members that share bits
    (a plain bitmap cannot delete: clearing a shared bit would create
    false negatives). PRECONDITION (standard for counting Bloom
    filters): every ``deletes`` digest was previously inserted, and at
    most once each — this module inserts DISTINCT digests, so passing
    a distinct subset of the member digests satisfies it. Deletion is
    digest-level: removing a text removes membership for every doc
    with that exact normalized content.

    Retained members keep ZERO false negatives by construction: a
    retained digest's own +1 on each of its positions can never be
    cancelled by deletions of other digests.

    One union + one groupBy(pos) sum with map-side combine — the same
    single-shuffle shape as bloom_build, rows instead of packed words
    (counters cannot bit-pack)."""
    if m_bits <= 0 or m_bits % WORD_BITS != 0:
        raise ValueError(f"m_bits must be a positive multiple of {WORD_BITS}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def pos_rows(df: DataFrame, delta: int) -> DataFrame:
        return df.select(
            F.explode(_positions(F.col(digest_col), m_bits, k)).alias("pos"),
            F.lit(delta).cast("long").alias("delta"),
        )

    return (
        pos_rows(members, 1)
        .unionAll(pos_rows(deletes, -1))
        .groupBy("pos")
        .agg(F.sum("delta").alias("cnt"))
    )


def counting_bloom_probe(
    probes: DataFrame,
    id_col: str,
    digest_col: str,
    counts: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Membership verdict per probe row against the counting filter:
    (id_col, cb_hit boolean) — hit iff every one of the k position
    counters is > 0. Absent position rows mean count 0 (coalesce), so
    sparse counter tables need no densification. The counts table is
    broadcast only while provably small (≤ _BROADCAST_MAX_WORDS rows
    of (pos, cnt)); beyond that AQE picks the strategy."""
    pm = probes.select(
        F.col(id_col),
        F.explode(_positions(F.col(digest_col), m_bits, k)).alias("pos"),
    )
    right = (
        F.broadcast(counts) if m_bits <= _BROADCAST_MAX_WORDS else counts
    )
    joined = pm.join(right, "pos", "left").select(
        id_col,
        (F.coalesce(F.col("cnt"), F.lit(0).cast("long")) > 0).alias("hit"),
    )
    return joined.groupBy(id_col).agg(F.bool_and("hit").alias("cb_hit"))
