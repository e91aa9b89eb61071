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

The guard is ADAPTIVE (r7, VERDICT r6 #1): the salted path's pinned
keyed repartition deliberately forgoes AQE small-input coalescing
(AQE folds salted hot buckets back onto one task — measured 92.6 s vs
6.17 s on a 24 000-row bucket), but that pin taxes every HEALTHY
input with fixed-width shuffles and a window pass it doesn't need —
the r6 `dedup_minhash_lsh` bench cell drifted to 2.05× its baseline
on an all-distinct corpus whose largest bucket was ~2 rows. So by
default a sampled scalar probe (the reconstruct_from_union skew-probe
pattern, operators/reconstruct.py::_est_max_rows_per_key) estimates
the hottest bucket first and the plain AQE-coalesced self-join runs
whenever no bucket approaches the cap. Both probe failure directions
are performance-only: the guarded and plain joins emit the identical
pair set, so a missed hot bucket costs a straggler task, never
correctness.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window as W, functions as F

# Why these are fixed constants and safe at 100x cluster scale
# (VERDICT r7 #5): BUCKET_CAP bounds PER-TASK pair work — a salted
# bucket costs each task at most ~cap^2/2 = 8.4M pair evaluations
# (seconds of CPU), independent of cluster size or total data volume;
# more executors just run more sub-bucket tasks in parallel, so the
# cap needs no re-derivation per deployment. Deriving it from
# session parallelism would couple a per-task CPU budget to cluster
# width, which is the wrong axis.
BUCKET_CAP = 4096
GUARD_PROBE_SAMPLE = 0.02  # row-sample fraction for the hot-bucket probe
# pair-output size above which the self-join's partitioning is pinned
# even without a hot bucket: AQE coalesces shuffle partitions by INPUT
# bytes, and a band join whose output dwarfs its slim banded input is
# exactly the shape it misjudges (measured: sim_embedding_neardup's
# ~8M-pair candidate stage went 5.0 s -> 12.3 s when left to AQE).
# Also parallelism-independent: it guards against AQE folding the
# join below the session's shuffle partitions, whatever that count is
# ("pin" repartitions to _shuffle_partitions(df), which IS
# session-derived — the constant only decides WHEN pinning is worth
# the lost coalescing, a threshold on output rows, not on cluster
# width).
PIN_PAIR_ROWS = 1_000_000

# (input semanticHash, key_cols, cap) -> "force" | "pin" | "off";
# see probe_guard's memo note. Bounded: entries are a small tuple + a
# str (~100 B), so growth only matters in a long-lived serving process
# that churns thousands of DISTINCT plans; at the cap the memo is
# cleared wholesale (decisions are re-probe-able at 2 % of map-side
# cost — cheaper than LRU bookkeeping on every hit).
_GUARD_MEMO: dict[tuple, str] = {}
_GUARD_MEMO_MAX = 4096


def _bucket_stats(
    slim_keys: DataFrame, key_cols: tuple[str, ...], fraction: float
) -> tuple[int, int]:
    """(est_max_bucket_rows, est_total_pairs) from a key-only frame
    that is a ``fraction`` row-sample of the real banded frame.

    est_max scales the max sampled bucket count by 1/f: at the default
    cap a cap-sized bucket (4096 rows) appears ~82 times in the 2 %
    sample (σ≈9), so the cap/2 trigger sits >4σ from both error
    directions. est_pairs uses the unbiased Σ c(c−1)/f² estimator of
    Σ m(m−1) (E[c(c−1)] = f²·m(m−1) under Binomial thinning), halved
    to count unordered pairs; individual buckets are noisy at small f
    but the sum concentrates over the many buckets any real banding
    produces. Probe errors in BOTH directions are performance-only:
    the plain, pinned, and salted joins emit the identical pair set."""
    row = (
        slim_keys.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.max("_n").alias("_mx"),
            F.sum(F.col("_n") * (F.col("_n") - F.lit(1))).alias("_pp"),
        )
        .first()
    )
    est_max = int((row[0] or 0) / fraction)
    est_pairs = int((row[1] or 0) / (fraction * fraction) / 2)
    return est_max, est_pairs


def _guard_fraction(cap: int) -> float:
    """Sample fraction floored so a cap-sized bucket is expected to
    contribute ≥50 sampled rows — below that the max-of-counts
    statistic is dominated by ±1 noise in TINY buckets scaled by 1/f
    (one sampled row from a 2-row bucket must not read as a bucket of
    1/f rows); small caps probe exactly."""
    return min(1.0, max(GUARD_PROBE_SAMPLE, 50.0 / max(cap, 1)))


def _decide_guard(est_max: int, est_pairs: int, cap: int) -> str:
    if est_max > cap // 2:  # 2x safety toward triggering
        return "force"
    if est_pairs > PIN_PAIR_ROWS:
        return "pin"
    return "off"


def _shuffle_partitions(df: DataFrame) -> int:
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    except (TypeError, ValueError):
        # some managed platforms set the conf to "auto" (ADVICE r6)
        return df.sparkSession.sparkContext.defaultParallelism or 200


def probe_guard(
    make_banded,
    raw: DataFrame,
    key_cols: tuple[str, ...],
    cap: int = BUCKET_CAP,
    seed: int = 7,
) -> str:
    """Guard decision from banding a seeded sample of the caller's RAW
    input — the cheap form of the hot-bucket probe for pipelines whose
    banded frame has an expensive map-side upstream (shingle+MinHash,
    SRP matmul). Sampling the BANDED frame cannot prune that work —
    Sample does not commute below explode/groupBy, so
    `banded.sample(f)` still evaluates the full upstream and only
    shrinks the probe's shuffle (measured: no bench gain). Sampling
    the per-row-independent INPUT costs ~f of the upstream: a sampled
    doc's band keys equal its keys in the full run, so a bucket of m
    rows contributes Binomial(m, f) sampled rows and the scaled max
    estimates the hottest bucket exactly as _est_max_bucket_rows does.

    ``make_banded``: input frame -> frame containing key_cols (extra
    columns fine). ``raw`` may be PRE-collapse (exact-duplicate
    classes not yet merged): byte-identical rows band identically, so
    the estimate only OVERSHOOTS on clone-heavy corpora — the guard
    engages, which is performance-conservative, never wrong.

    Returns "force", "pin", or "off" for band_self_join's guard
    parameter: "force" when a bucket approaches the cap, "pin" when no
    bucket is hot but the estimated pair OUTPUT exceeds PIN_PAIR_ROWS
    (keep full parallelism without paying the salt machinery), "off"
    when the join is genuinely small either way.

    Decisions are MEMOIZED per (input plan semantic hash, key_cols,
    cap) for the life of the process (the replay-staging memo
    precedent, plans/streaming_queries.py): queries that band the same
    corpus several times (corpus builds: pairs + components +
    survivorship) probe once, and repeated bench runs of one query pay
    zero marginal probe jobs. The cached value is a PHYSICAL-LAYOUT
    choice only — if the files behind an identical-looking plan are
    replaced mid-process the stale decision can cost a straggler or a
    few extra shuffles, never a wrong pair set.
    """
    if raw.isStreaming:
        # sample/first are actions a streaming frame cannot run; fall
        # back to the always-safe salted layout exactly as
        # band_self_join's own auto path does (ADVICE r7)
        return "force"
    try:
        memo_key = (
            raw._jdf.queryExecution().analyzed().semanticHash(),
            tuple(key_cols),
            cap,
        )
    except Exception:
        memo_key = None
    if memo_key is not None and memo_key in _GUARD_MEMO:
        return _GUARD_MEMO[memo_key]
    f = _guard_fraction(cap)
    probe_in = raw if f >= 1.0 else raw.sample(fraction=f, seed=seed)
    est_max, est_pairs = _bucket_stats(
        make_banded(probe_in).select(*key_cols), key_cols, f
    )
    decision = _decide_guard(est_max, est_pairs, cap)
    if memo_key is not None:
        if len(_GUARD_MEMO) >= _GUARD_MEMO_MAX:
            _GUARD_MEMO.clear()
        _GUARD_MEMO[memo_key] = decision
    return decision


def band_self_join(
    banded: DataFrame,
    key_cols: tuple[str, ...],
    id_col: str,
    payload_cols: tuple[str, ...] = (),
    cap: int = BUCKET_CAP,
    guard: str = "auto",
) -> DataFrame:
    """All (id_a < id_b) pairs of rows sharing the band key, with hot
    buckets (> cap rows) salted into sub-buckets. payload_cols are
    carried through as <p>_a / <p>_b.

    ``guard``:
      * "auto" (default) — a sampled probe (_bucket_stats) estimates
        the hottest bucket and the total pair output; "force" engages
        only above cap/2 (2× safety toward triggering, mirroring
        reconstruct_from_union's auto skew mode), "pin" when the pair
        output alone warrants fixed parallelism, else the plain
        self-join: ONE reused exchange, AQE coalescing, no window
        pass. Streaming frames cannot run the probe action and fall
        back to "force" (always safe, never wrong). CAVEAT: the
        in-place probe samples the banded frame ABOVE its upstream, so
        it re-evaluates the full map-side work once — callers with an
        expensive banding upstream should decide via probe_guard on a
        sampled INPUT and pass the result explicitly.
      * "force" — always salt (the probe-free r6 behavior).
      * "pin" — no salting (no window pass, no replication), but both
        sides take the SAME explicit keyed repartition, so Catalyst
        reuses one exchange while AQE cannot coalesce the join below
        n_parts tasks. The layout for healthy-bucket joins whose pair
        OUTPUT is much larger than their slim banded input — AQE
        coalesces by input bytes and measurably serializes those
        (sim_embedding_neardup 5.0 s -> 12.3 s when left to AQE).
      * "off" — plain self-join, no probe job (callers that already
        know occupancy AND output are bounded).
    """
    if guard not in ("auto", "force", "pin", "off"):
        raise ValueError(
            f"guard must be 'auto', 'force', 'pin', or 'off', got {guard!r}"
        )
    if guard == "auto":
        if banded.isStreaming:
            guard = "force"
        else:
            f = _guard_fraction(cap)
            slim = banded.select(*key_cols)
            if f < 1.0:
                slim = slim.sample(fraction=f, seed=7)
            guard = _decide_guard(*_bucket_stats(slim, key_cols, f), cap)

    def eq(a: str, b: str, cols: tuple[str, ...]) -> Column:
        return reduce(
            lambda acc, c: acc & (F.col(f"{a}.{c}") == F.col(f"{b}.{c}")),
            cols[1:],
            F.col(f"{a}.{cols[0]}") == F.col(f"{b}.{cols[0]}"),
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

    if guard in ("off", "pin"):
        # no bucket approaches the cap: both sides key identically, so
        # Catalyst reuses ONE exchange. "off" lets AQE coalesce the
        # (small) shuffle; "pin" fixes the partition count so a
        # large-output join keeps full parallelism (AQE judges by
        # input bytes and would fold it onto a few tasks).
        side = banded
        if guard == "pin":
            side = banded.repartition(
                _shuffle_partitions(banded), *[F.col(c) for c in key_cols]
            )
        return (
            side.alias("A")
            .join(
                side.alias("B"),
                eq("A", "B", key_cols)
                & (F.col(f"A.{id_col}") < F.col(f"B.{id_col}")),
            )
            .select(*sel)
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
    n_parts = _shuffle_partitions(banded)
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
    return pairs.select(*sel)
