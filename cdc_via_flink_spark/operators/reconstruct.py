"""Batch transaction reconstruction — the engine's flagship operator.

Batch twin of the reference's keyed co-process (SURVEY.md ST1/A1/A2;
reference: DebeziumTransactionReconstructor.java:131-170): change
events buffered per transaction id, emitted when the transaction's END
marker arrives. The streaming path (streaming/assembler.py) implements
the same semantics incrementally; this module implements them as one
declarative plan so the DuckDB oracle can verify them.

Semantics reproduced from V1 (and how):
- arrival order: the reference leans on a single-partition Kafka topic
  for total order (reference readme.md:1); the batch twin's `seq`
  column is that offset, and all ordering/assignment uses it. Note the
  txn-metadata envelope carries NO timestamp (reference :109-114,
  SURVEY.md W2), so offset order is the only order both streams share.
- emit on END (reference :158): each change is assigned to the
  earliest END of its transaction at-or-after it in arrival order; a
  group (txn_id, end) emits one record.
- END with no buffered events -> silently dropped (reference :159-163
  null-state guard): inner grouping naturally drops empty segments.
- events after the last END -> never emitted (the reference's state
  leak, :141-153 with no timer): changes with no following END are
  excluded. (The streaming path adds event-time timeout eviction —
  documented deviation/improvement.)

Scale notes: one hash shuffle on txn_id; the window and the groupBy
share that partitioning so Catalyst reuses the exchange; no driver
loops; per-key work is O(n log n). Skew on hot transaction ids is
handled by AQE; state per row in the window is a single BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def derive_change_stream(events: DataFrame) -> DataFrame:
    """Deterministically derive a Debezium-shaped change stream from the
    driver's `events` fixture table (TESTDATA.md): non-purchase events
    become row-change events keyed by user; `event_id` is the arrival
    offset (single-partition order, reference readme.md:1).

    Columns: txn_id, seq, op, ts_ms, before, after.
    """
    op = (
        F.when(F.col("event_type") == "signup", "c")
        .when(F.col("event_type") == "click", "u")
        .when(F.col("event_type") == "view", "r")
        .otherwise("d")
    )
    return (
        events.filter(F.col("event_type") != "purchase")
        .select(
            F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("txn_id"),
            F.col("event_id").alias("seq"),
            op.alias("op"),
            F.col("ts_ms"),
            F.when(op.isin("u", "d"), F.col("props")).alias("before"),
            F.when(op.isin("c", "u", "r"), F.col("props")).alias("after"),
        )
    )


def derive_txn_stream(events: DataFrame) -> DataFrame:
    """END markers derived from purchase events; declared event_count is
    a deterministic function of the row (exercises A2 count-mode). No
    timestamp: the reference's txn envelope has none (reference
    :109-114).

    Columns: txn_id, seq, status, event_count.
    """
    return events.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("txn-"), F.col("user_id").cast("string")).alias("txn_id"),
        F.col("event_id").alias("seq"),
        F.lit("END").alias("status"),
        (F.floor(F.col("value")).cast("long") % F.lit(4) + F.lit(1)).alias("event_count"),
    )


def reconstruct_transactions(
    changes: DataFrame, ends: DataFrame, emit_on: str = "end"
) -> DataFrame:
    """Assemble per-transaction records (SURVEY.md A1/A2).

    ``changes``: txn_id, seq, op, ts_ms[, before, after]
    ``ends``:    txn_id, seq, event_count

    emit_on='end'   — reference-faithful: every END with >=1 buffered
                      change emits (reference :158).
    emit_on='count' — Debezium-documented exactness check the reference
                      parses but never applies (reference :113-114):
                      only segments whose actual size equals the END's
                      declared event_count emit.

    Output: txn_id, end_seq, event_count (declared), n_events,
    ops_concat (ops in arrival order), first_ts_ms, last_ts_ms.
    """
    c = changes.select(
        "txn_id",
        F.col("seq").cast("long").alias("seq"),
        "op",
        F.col("ts_ms").cast("long").alias("ts_ms"),
        F.lit("C").alias("kind"),
        F.lit(None).cast("long").alias("declared"),
    )
    e = ends.select(
        "txn_id",
        F.col("seq").cast("long").alias("seq"),
        F.lit(None).cast("string").alias("op"),
        F.lit(None).cast("long").alias("ts_ms"),
        F.lit("E").alias("kind"),
        F.col("event_count").cast("long").alias("declared"),
    )
    return reconstruct_from_union(c.unionByName(e), emit_on=emit_on)


AUTO_SKEW_MIN_BYTES = 64 << 20  # skip the detection pre-pass below this
AUTO_SKEW_HOT_ROWS = 4_000_000  # rows-per-key that trigger segmentation
AUTO_SKEW_BLOCK = 524_288  # block size the auto path segments with
AUTO_SKEW_SAMPLE = 0.02  # row-sample fraction for the skew probe


def _suffix_min(end_seq_of, part_cols, order_col):
    """Running minimum over the CURRENT-AND-FOLLOWING rows of the
    partition, expressed as a DESCENDING-order prefix frame. The
    direct `rowsBetween(currentRow, unboundedFollowing)` frame is
    re-aggregated from scratch per row by Spark
    (UnboundedFollowingWindowFunctionFrame) — O(n^2) per key, and the
    real cause of the round-2 hot-key cliff (>10 min at 1.9 M rows on
    one key). The desc prefix frame is evaluated incrementally
    (UnboundedPrecedingWindowFunctionFrame): same result set per row,
    O(n) after the sort — measured 4.5 s on the same workload."""
    w = (
        W.partitionBy(*part_cols)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return F.min(end_seq_of).over(w)


def _est_max_rows_per_key(u: DataFrame, fraction: float = None) -> int:
    """ESTIMATED max event count over txn_ids from a seeded row
    sample — the skew probe. The exact pre-pass this replaces cost a
    full groupBy of the input before every large reconstruction; the
    sampled probe prunes to the txn_id column AND aggregates only
    ``fraction`` of the rows (shuffle/agg volume drops 50×, the probe
    result is a single scalar). Sampling error at the decision
    boundary is tiny — a key at the 4 M-row threshold appears ~80 k
    times in a 2% sample (σ≈280, 0.35%) — and both failure directions
    are performance-only: a false trigger runs the (equivalent,
    slightly slower) segmented plan, a near-threshold miss runs the
    plain plan on a key the task can still sort. The caller applies a
    2× safety factor toward triggering."""
    f = AUTO_SKEW_SAMPLE if fraction is None else fraction
    row = (
        u.select("txn_id")
        .sample(fraction=f, seed=7)
        .groupBy("txn_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.max("_n"))
        .first()
    )
    return int((row[0] or 0) / f)


def reconstruct_from_union(
    u: DataFrame,
    emit_on: str = "end",
    skew_block_size: int | None | str = "auto",
) -> DataFrame:
    """Single-subtree reconstruction over a pre-discriminated union
    (columns: txn_id, seq, op, ts_ms, kind 'C'|'E', declared).

    Plan shape (the 100 TB-friendly one): ONE pass over the input —
    window (suffix running MIN on the txn_id shuffle, computed as a
    desc-order prefix frame so Spark evaluates it incrementally, see
    _suffix_min) assigns each row its earliest following END, then a
    groupBy(txn_id, end_seq) carries BOTH the buffered changes and the
    END's own metadata (the END row groups with itself), so no
    end-info join and no second scan of the source.

    ``skew_block_size``:
      * "auto" (default) — hot transactions are handled WITHOUT a
        manual knob: if the input's estimated size exceeds
        AUTO_SKEW_MIN_BYTES (plan statistics — free, no job), a SAMPLED
        probe (txn_id column only, AUTO_SKEW_SAMPLE row fraction, see
        _est_max_rows_per_key) estimates the hottest key; above
        AUTO_SKEW_HOT_ROWS/2 the segmented plan below is used
        automatically. Small inputs skip detection entirely, keeping
        the single-shuffle plan and zero extra jobs (the sf0.1 bench
        path is unchanged).
      * int — force the segmented plan with that block size: the
        suffix MIN is computed per (txn_id, seq div B) block in
        parallel, then combined with per-txn block suffix minima (a
        window over #blocks rows, not #events). Costs one extra full
        shuffle — worth it exactly when one key holds more rows than a
        single task should sort; results are identical
        (tests/test_cdc_semantics.py).
      * None — force the plain single-window plan.
    """
    if emit_on not in ("end", "count"):
        raise ValueError(f"emit_on must be 'end' or 'count', got {emit_on!r}")

    if isinstance(skew_block_size, str) and skew_block_size != "auto":
        raise ValueError(
            f"skew_block_size must be 'auto', an int, or None, got {skew_block_size!r}"
        )
    if skew_block_size == "auto":
        skew_block_size = None
        if not u.isStreaming:
            stats = u._jdf.queryExecution().optimizedPlan().stats()
            if int(str(stats.sizeInBytes())) >= AUTO_SKEW_MIN_BYTES:
                # 2x safety factor: sampling may under-see a hot key;
                # triggering early only costs the segmented plan's
                # extra shuffle, never correctness
                if _est_max_rows_per_key(u) > AUTO_SKEW_HOT_ROWS // 2:
                    skew_block_size = AUTO_SKEW_BLOCK

    end_seq_of = F.when(F.col("kind") == "E", F.col("seq"))
    if skew_block_size is None:
        assigned = u.withColumn(
            "end_seq", _suffix_min(end_seq_of, ["txn_id"], "seq")
        )
    else:
        b = u.withColumn("_blk", F.expr(f"seq div {int(skew_block_size)}"))
        # per-(txn, block) END minima -> suffix minimum over LATER
        # blocks (tiny frame: one row per block per txn)
        blk_info = b.groupBy("txn_id", "_blk").agg(F.min(end_seq_of).alias("_bmin"))
        w_suffix = (
            W.partitionBy("txn_id")
            .orderBy(F.col("_blk").desc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
        blk_info = blk_info.select(
            "txn_id", "_blk", F.min("_bmin").over(w_suffix).alias("_later_min")
        )
        assigned = (
            b.withColumn(
                "_local_min", _suffix_min(end_seq_of, ["txn_id", "_blk"], "seq")
            )
            .join(blk_info, ["txn_id", "_blk"])
            .withColumn("end_seq", F.least("_local_min", "_later_min"))
            .drop("_blk", "_local_min", "_later_min")
        )

    is_c = F.col("kind") == "C"
    grouped = (
        assigned.filter(F.col("end_seq").isNotNull())
        .groupBy("txn_id", "end_seq")
        .agg(
            F.sum(F.when(is_c, 1).otherwise(0)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(is_c, F.struct("seq", "op")))
                    ),
                    lambda s: s.getField("op"),
                ),
                ",",
            ).alias("ops_concat"),
            F.min(F.when(is_c, F.col("ts_ms"))).alias("first_ts_ms"),
            F.max(F.when(is_c, F.col("ts_ms"))).alias("last_ts_ms"),
            F.max(F.when(~is_c, F.col("declared"))).alias("event_count"),
        )
    )

    # END-with-no-events dropped (reference :159-163); trailing
    # changes with no END were dropped by the end_seq IS NULL filter.
    out = grouped.filter(F.col("n_events") > 0)
    if emit_on == "count":
        out = out.filter(F.col("n_events") == F.col("event_count"))
    return out.select(
        "txn_id",
        "end_seq",
        "event_count",
        "n_events",
        "ops_concat",
        "first_ts_ms",
        "last_ts_ms",
    )


def latest_state(changes: DataFrame) -> DataFrame:
    """CDC snapshot: final row image per transaction key (SURVEY.md J5/A5
    idiom — `last value as of now`), via one row_number window.

    Output: txn_id, last_op, last_ts_ms, last_after, n_changes.
    """
    w = W.partitionBy("txn_id").orderBy(
        F.col("ts_ms").desc(), F.col("seq").desc()
    )
    counted = changes.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_changes", F.count(F.lit(1)).over(W.partitionBy("txn_id"))
    )
    return counted.filter(F.col("rn") == 1).select(
        "txn_id",
        F.col("op").alias("last_op"),
        F.col("ts_ms").alias("last_ts_ms"),
        F.col("after").alias("last_after"),
        "n_changes",
    )
