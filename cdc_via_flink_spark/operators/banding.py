"""Skew-guarded band self-join — the shared candidate-generation
kernel of the LSH dedup operators (SURVEY.md X1/X2; VERDICT r5 #7).

The MinHash and SRP-LSH pipelines both end in "self-join rows that
share a band key" (dedup.py band (band, bsig); similarity.py table
(t, bucket)). AQE's skew-join splitting balances sort-merge PARTITIONS
but cannot split a single join KEY: one pathological bucket of m
near-identical-but-not-byte-identical rows (the exact-duplicate class
collapse only removes byte-identical content) lands its whole
C(m, 2) pair space on one task. This helper caps per-task bucket work
with a SINGLE salted self-join that degenerates to the plain join for
normal buckets:

- each row learns its bucket size via a window count over the band
  keys and a salt factor s = ceil(m / cap) (s = 1 for buckets within
  the cap — the common case). A sizes-aggregate + broadcast-hot-list
  join was tried instead (its exchange carries distinct keys, not
  rows) and measured SLOWER end-to-end (q_corpus_build_v2 4.25 s →
  5.02 s): the aggregate is a distinct subtree, so the expensive
  upstream (shingle + 16-way MinHash) evaluates twice, while the
  window's exchange is byte-identical on both join sides and
  Catalyst reuses it — upstream evaluates once;
- each row carries salt _r = xxhash64(id) % s and replicates to
  _j = 0..s-1 (for s = 1 that is ONE row — zero overhead);
- the join requires A._r == B._j AND A._j == B._r on top of the band
  keys, so the unordered pair {x, y} meets on EXACTLY one
  (salt_x, salt_y) combination and every task owns at most ~cap²
  pair evaluations. Total pair work is unchanged (the pair space is
  what it is); a hot bucket is spread over s² tasks instead of one
  straggler.

Deliberately ONE join path (not a cold/hot union): the union form
puts the banded subtree into the logical plan 5× (sizes + two
branches × two sides), which blew up the unrolled-CTE consumers'
plan strings; this form keeps it at the self-join's inherent 2×.
The price is that the join's two sides key on (keys, _r, _j) vs
(keys, _j, _r), so the single reused exchange of the unguarded join
becomes two — shuffling the slim banded rows twice, which is noise
next to the join output itself.

Output is the exact same pair SET as the plain self-join (pinned by
tests/test_banding.py on a synthetic hot bucket), so callers'
dropDuplicates/verify stages are unaffected.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W, functions as F

BUCKET_CAP = 4096


def band_self_join(
    banded: DataFrame,
    key_cols: tuple[str, ...],
    id_col: str,
    payload_cols: tuple[str, ...] = (),
    cap: int = BUCKET_CAP,
) -> DataFrame:
    """All (id_a < id_b) pairs of rows sharing the band key, with hot
    buckets (> cap rows) salted into sub-buckets. payload_cols are
    carried through as <p>_a / <p>_b."""

    def eq(a: str, b: str, cols: tuple[str, ...]) -> Column:
        return reduce(
            lambda acc, c: acc & (F.col(f"{a}.{c}") == F.col(f"{b}.{c}")),
            cols[1:],
            F.col(f"{a}.{cols[0]}") == F.col(f"{b}.{cols[0]}"),
        )

    w = W.partitionBy(*key_cols)
    rep = (
        banded.withColumn(
            "_s", F.ceil(F.count(F.lit(1)).over(w) / F.lit(cap)).cast("int")
        )
        .withColumn(
            "_r", F.pmod(F.xxhash64(F.col(id_col)), F.col("_s")).cast("int")
        )
        .withColumn("_j", F.explode(F.sequence(F.lit(0), F.col("_s") - 1)))
    )
    # pair {x, y} meets exactly once: at (salt_x, salt_y) — A carries
    # (salt, replica j), B carries (replica i, salt); equality of
    # A._r/B._j and A._j/B._r pins the one meeting key. s = 1 buckets
    # reduce to the plain equi self-join (0 == 0).
    #
    # The join partitioning is PINNED with an explicit keyed
    # repartition: AQE coalesces shuffle partitions by INPUT size, and
    # a salted hot bucket is exactly the small-input/huge-output shape
    # it misjudges — measured on a 24 000-row bucket, AQE folded all
    # 36 sub-bucket groups back onto ONE task (92.6 s) while the
    # pinned layout spreads them (scripts/bench_hotbucket_stress.py).
    # The column lists match the join-key ORDER per side
    # ((k, _r, _j) vs (k, _j, _r)), so a matching pair's two replicas
    # hash to the same partition and EnsureRequirements inserts no
    # further exchange — same shuffle count as the unpinned form.
    n_parts = int(
        banded.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    lhs = rep.repartition(
        n_parts, *[F.col(c) for c in key_cols], F.col("_r"), F.col("_j")
    )
    rhs = rep.repartition(
        n_parts, *[F.col(c) for c in key_cols], F.col("_j"), F.col("_r")
    )
    pairs = lhs.alias("A").join(
        rhs.alias("B"),
        eq("A", "B", key_cols)
        & (F.col("A._r") == F.col("B._j"))
        & (F.col("A._j") == F.col("B._r"))
        & (F.col(f"A.{id_col}") < F.col(f"B.{id_col}")),
    )
    sel = [
        F.col(f"A.{id_col}").alias("id_a"),
        F.col(f"B.{id_col}").alias("id_b"),
    ] + [
        c
        for p in payload_cols
        for c in (
            F.col(f"A.{p}").alias(f"{p}_a"),
            F.col(f"B.{p}").alias(f"{p}_b"),
        )
    ]
    return pairs.select(*sel)
