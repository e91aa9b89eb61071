"""approx_count_distinct (A3) error-bound checks on the *_full debug
variants (the raw sketch estimates are engine-specific, so the
DECLARED queries project only oracle-derivable columns; these tests
assert the relative-error guarantee on the estimate columns)."""

from __future__ import annotations

from tests.conftest import SF0001, SF001


def test_approx_distinct_within_bound(spark):
    from cdc_via_flink_spark.plans.collections_queries import approx_distinct_full

    for r in approx_distinct_full(spark, SF0001).collect():
        rel_err = abs(r.approx_parts - r.exact_parts) / max(r.exact_parts, 1)
        assert rel_err < 0.1, f"{r.l_returnflag}: {r.approx_parts} vs {r.exact_parts}"


def test_approx_percentile_within_rank_bound(spark):
    """GK sketch guarantees rank error ≤ n/accuracy; at accuracy=10000
    and fixture sizes that is < 1 rank — but approx_percentile returns
    an ELEMENT (no interpolation) while exact percentile interpolates,
    so assert the approx value sits within the exact p45-p55 band."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.sources.tables import load_table

    from cdc_via_flink_spark.plans.collections_queries import (
        approx_percentile_full,
    )

    got = {r.o_orderpriority: r for r in approx_percentile_full(spark, SF0001).collect()}
    o = load_table(spark, SF0001, "orders")
    band = {
        r.o_orderpriority: (r.lo, r.hi)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.percentile(F.col("o_totalprice"), F.lit(0.45)).alias("lo"),
            F.percentile(F.col("o_totalprice"), F.lit(0.55)).alias("hi"),
        )
        .collect()
    }
    for k, r in got.items():
        lo, hi = band[k]
        assert lo <= r.approx_p50 <= hi, f"{k}: {r.approx_p50} outside [{lo}, {hi}]"


def test_hll_rollup_within_bound_and_merge_consistent(spark):
    """DataSketches HLL invariants: (a) every daily estimate within 5%
    of the exact daily distinct; (b) the unioned monthly estimate
    within 5% of the exact monthly distinct — i.e. merging sketches
    loses no more accuracy than sketching the raw stream; (c) the
    sketch pipeline is partition-layout independent."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.sources.tables import load_table

    from cdc_via_flink_spark.plans.collections_queries import (
        hll_sketch_rollup_full,
    )

    rows = {r.period: r.est_users for r in hll_sketch_rollup_full(spark, SF0001).collect()}
    ev = load_table(spark, SF0001, "events")
    exact_daily = {
        r.period: r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("period")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_daily["ALL"] = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert set(rows) == set(exact_daily)
    for period, est in rows.items():
        exact = exact_daily[period]
        assert abs(est - exact) / max(exact, 1) < 0.05, (period, est, exact)

    # determinism across partition layouts (HLL register max-merge is
    # order- and partitioning-insensitive)
    rows2 = {r.period: r.est_users for r in hll_sketch_rollup_full(spark, SF0001).collect()}
    assert rows == rows2


def test_self_validating_columns_all_within_bound(spark):
    """The three sketch queries carry their own validation columns
    (rel_err + within_bound), so a rows-only driver check still sees
    correctness signal. All rows must self-report within bound."""
    from cdc_via_flink_spark.plans import collections_queries as CQ

    for name, fn in (
        ("q_approx_distinct", CQ.approx_distinct_full),
        ("q_approx_percentile", CQ.approx_percentile_full),
        ("q_hll_sketch_rollup", CQ.hll_sketch_rollup_full),
    ):
        rows = fn(spark, SF0001).collect()
        assert rows, name
        assert all(r.within_bound for r in rows), (
            name,
            [(r.rel_err, r.within_bound) for r in rows if not r.within_bound],
        )


def test_quantile_sketch_rollup_bounds_and_mergeability(spark):
    """Merged-summary estimates must clear the declared 10% bound at
    both fixture SFs, and the point count must be days×m-ish —
    independent of event count (the mergeability contract)."""
    from cdc_via_flink_spark.plans.collections_queries import (
        quantile_sketch_rollup_full,
    )

    fn = quantile_sketch_rollup_full
    for sf in (SF0001, SF001):
        rows = {r.quantile: r for r in fn(spark, sf).collect()}
        assert set(rows) == {"p50", "p95"}
        for r in rows.values():
            assert r.within_bound, (sf, r)
            assert r.rel_err <= 0.10
        # summaries are bounded: ≤ 64 points per day regardless of SF
        n_days = 31
        assert rows["p50"].n_points <= 64 * n_days


def test_freq_sketch_rollup_bounds_and_guarantee(spark):
    """Misra-Gries rollup (freq_sketch_rollup_full): for the top-10
    exact heavy words at both fixture SFs, est <= exact <= est + slack
    must hold — and the heavy-hitter GUARANTEE: a word whose exact
    count exceeds the total error mass must be in the merged summary
    (est > 0)."""
    from cdc_via_flink_spark.plans.collections_queries import (
        freq_sketch_rollup_full,
    )

    for sf in (SF0001, SF001):
        rows = freq_sketch_rollup_full(spark, sf).collect()
        assert len(rows) == 10, sf
        total_err_bound = max(r.est + r.slack - r.exact_n for r in rows)
        assert total_err_bound >= 0
        for r in rows:
            assert r.within_bound, (sf, r)
            assert r.est <= r.exact_n <= r.est + r.slack, (sf, r)
            # Zipf head: the corpus's top words dwarf per-shard error
            # mass, so the guarantee engages for at least the head
        head = max(rows, key=lambda r: r.exact_n)
        assert head.est > 0, (sf, head)


def test_freq_sketch_guarantee_on_synthetic_skew(spark):
    """Constructed Zipf-extreme corpus: one word dominating every
    shard plus a uniform tail. The dominant word's merged estimate
    must be EXACT (kept in every shard => slack contribution 0 from
    kept shards and est = true), and tail words must stay inside
    [est, est+slack] — the merge math on data where the answer is
    computable by hand."""
    from pyspark.sql import functions as F

    from cdc_via_flink_spark.plans.collections_queries import (
        freq_sketch_rollup_full,
    )

    # 320 docs over 32 shards; every doc: 5x "hot" + 3 distinct tail
    # words from a 400-word pool (tail words repeat across docs only
    # occasionally)
    rows = [
        (
            i,
            " ".join(
                ["hot"] * 5
                + [f"tail{(i * 3 + j) % 400}" for j in range(3)]
            ),
        )
        for i in range(320)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    import cdc_via_flink_spark.plans.collections_queries as CQ
    from cdc_via_flink_spark.sources import tables

    orig = tables.load_table
    try:
        # route the full function's load_table at our synthetic frame
        tables_patch = lambda spark_, sf_, name: df  # noqa: E731
        CQ.load_table = tables_patch
        out = {r.w: r for r in freq_sketch_rollup_full(spark, "unused").collect()}
    finally:
        CQ.load_table = orig

    hot = out["hot"]
    assert hot.exact_n == 320 * 5
    assert hot.est == hot.exact_n  # kept in every shard => exact
    assert hot.within_bound
    for r in out.values():
        assert r.est <= r.exact_n <= r.est + r.slack, r
