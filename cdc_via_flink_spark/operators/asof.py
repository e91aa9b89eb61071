"""As-of join (SURVEY.md J5): for each left row, the latest right row
at-or-before it per key — the CDC "state as of time T" primitive —
plus the remaining pandas ``merge_asof`` axes: ``direction``
("backward" / "forward" / "nearest"), ``allow_exact_matches`` and
``tolerance``.

Spark has no native as-of join; the scalable idiom is the
union-then-propagate trick: union both sides tagged, sort per key by
(ts, side), and carry the last right-side payload forward with
last(..., ignorenulls=True). One shuffle on the key, no range
explosion, no per-group pandas — works at any key cardinality and
hugely skewed time ranges. (Alternative `applyInPandas` +
pd.merge_asof exists for few-keys/many-rows shapes; this one is the
default.)

The FORWARD direction uses the same prefix-frame trick in DESCENDING
time order (an ascending-order suffix frame would hit Spark's
re-aggregated UnboundedFollowing window — quadratic per key, see
operators/reconstruct.py::_suffix_min). NEAREST computes both
propagations over the SAME keyed shuffle (two sorts, one Exchange —
both windows share partitionBy(key)) and picks the closer match,
ties resolving backward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    right_seq: str | None = None,
    prefix: str = "asof_",
    tolerance: int | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Return `left` with, for each row, the payload of the matching
    `right` row per pandas ``merge_asof`` semantics. The whole payload
    comes atomically from ONE right row (packed as a struct before
    propagation).

    ``direction``:
      * "backward" (default) — latest right with right_ts <= left_ts;
      * "forward" — earliest right with right_ts >= left_ts;
      * "nearest" — whichever of the two is closer in time; equal
        distance resolves to the backward match.
    ``allow_exact_matches=False`` makes the comparisons strict
    (< / >): an exactly-simultaneous right row no longer matches.
    Ties BETWEEN right rows at one timestamp resolve by ``right_seq``
    (highest wins backward, lowest wins forward — pass a unique
    column; without it equal-timestamp right rows make the result
    nondeterministic).

    ``tolerance`` (same numeric units as the ts columns): a match
    farther than ``tolerance`` from left_ts — staler (backward),
    later (forward), or either (nearest) — is rejected and the
    payload comes back null, exactly as if no right row existed. The
    matched right ts rides inside the propagated struct, so tolerance
    costs zero extra shuffles."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    lcols = left.columns
    # sort position of right rows at a timestamp shared with a left
    # row: before the left row (visible in its prefix frame) when
    # exact matches count, after it (invisible) when they don't
    r_ord = 0 if allow_exact_matches else 2
    l = (
        left.withColumn("_ord", F.lit(1))
        .withColumn("_ats", F.col(left_ts))
        .withColumn("_seq", F.lit(0).cast("long"))
    )
    r = (
        right.select(
            key,
            F.col(right_ts).alias("_ats"),
            (F.col(right_seq) if right_seq else F.lit(0)).cast("long").alias("_seq"),
            F.struct(
                F.col(right_ts).cast("long").alias("__matched_ts"), *payload_cols
            ).alias("_p"),
        )
        .withColumn("_ord", F.lit(r_ord))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    def _prefix(*order_cols):
        return (
            W.partitionBy(key)
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )

    lts = F.col(left_ts).cast("long")
    if direction in ("backward", "nearest"):
        # among equal-ts right rows the highest _seq is last in frame
        w_bw = _prefix(F.col("_ats").asc(), F.col("_ord").asc(), F.col("_seq").asc())
        u = u.withColumn("_plb", F.last("_p", ignorenulls=True).over(w_bw))
    if direction in ("forward", "nearest"):
        # descending time: the last non-null seen is the SMALLEST ts
        # >= left_ts; _seq desc makes the lowest _seq win the tie
        w_fw = _prefix(F.col("_ats").desc(), F.col("_ord").asc(), F.col("_seq").desc())
        u = u.withColumn("_plf", F.last("_p", ignorenulls=True).over(w_fw))

    if direction == "backward":
        chosen = F.col("_plb")
        dist = lts - F.col("_plb.__matched_ts")
    elif direction == "forward":
        chosen = F.col("_plf")
        dist = F.col("_plf.__matched_ts") - lts
    else:
        db = lts - F.col("_plb.__matched_ts")
        df_ = F.col("_plf.__matched_ts") - lts
        use_bw = F.col("_plb").isNotNull() & (F.col("_plf").isNull() | (db <= df_))
        chosen = F.when(use_bw, F.col("_plb")).otherwise(F.col("_plf"))
        dist = F.when(use_bw, db).otherwise(df_)

    fresh = F.lit(True) if tolerance is None else (dist <= F.lit(tolerance))
    return u.filter(F.col("_ord") == 1).select(
        *lcols,
        *[
            F.when(fresh, chosen.getField(c)).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
