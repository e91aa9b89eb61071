"""As-of join (SURVEY.md J5): for each left row, the latest right row
at-or-before it per key — the CDC "state as of time T" primitive.

Spark has no native as-of join; the scalable idiom is the
union-then-propagate trick: union both sides tagged, sort per key by
(ts, side), and carry the last right-side payload forward with
last(..., ignorenulls=True). One shuffle on the key, no range
explosion, no per-group pandas — works at any key cardinality and
hugely skewed time ranges. (Alternative `applyInPandas` +
pd.merge_asof exists for few-keys/many-rows shapes; this one is the
default.)
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
) -> DataFrame:
    """Return `left` with, for each row, the payload of the latest
    `right` row with right_ts <= left_ts and matching `key`. The whole
    payload comes atomically from ONE right row (packed as a struct
    before propagation). Ties on ts resolve to the right row; ties
    BETWEEN right rows resolve by `right_seq` (pass a unique column —
    without it, equal-timestamp right rows make the result
    nondeterministic).

    `tolerance` (pandas merge_asof semantics, same numeric units as
    the ts columns): a match STALER than `tolerance` — i.e.
    left_ts − matched_right_ts > tolerance — is rejected and the
    payload comes back null, exactly as if no right row existed. The
    matched right ts rides inside the propagated struct, so tolerance
    costs zero extra shuffles."""
    lcols = left.columns
    l = (
        left.withColumn("_side", F.lit(1))
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
        .withColumn("_side", F.lit(0))
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row; among
    # equal-ts right rows the highest _seq wins (last in frame).
    w = (
        W.partitionBy(key)
        .orderBy("_ats", "_side", "_seq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("_pl", F.last("_p", ignorenulls=True).over(w))
    fresh = (
        F.lit(True)
        if tolerance is None
        else (
            F.col(left_ts).cast("long") - F.col("_pl.__matched_ts")
            <= F.lit(tolerance)
        )
    )
    return u.filter(F.col("_side") == 1).select(
        *lcols,
        *[
            F.when(fresh, F.col(f"_pl.{c}")).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
    )
