"""Write-path physics: partition pruning and shuffle-free co-bucketed
joins — plan-shape assertions, not just row counts, because the plan
IS the 100 TB behavior."""

from __future__ import annotations

import pytest

from cdc_via_flink_spark.sources.tables import load_table
from cdc_via_flink_spark.sources.writers import write_bucketed, write_partitioned
from tests.conftest import SF0001


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load_table(spark, SF0001, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])

    back = spark.read.parquet(path).filter("o_orderstatus = 'F'")
    assert back.count() == orders.filter("o_orderstatus = 'F'").count()
    # Partition pruning: only the o_orderstatus=F directory is scanned.
    scan_line = next(
        line for line in _plan(back).splitlines() if "FileScan" in line
    )
    assert "o_orderstatus=F" in scan_line or "PartitionFilters" in _plan(back)


@pytest.fixture()
def bucketed_pair(spark):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(
        load_table(spark, SF0001, "orders"), "b_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, SF0001, "lineitem"), "b_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_no_shuffle(spark, bucketed_pair):
    # Disable broadcast so the join must pick sort-merge — the case
    # bucketing exists for (fact-fact at 100 TB is never broadcast).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = _plan(j)
        # The join itself runs without exchanging either side: the only
        # allowed exchange is the final tiny groupBy("o_orderstatus").
        join_part = plan.split("SortMergeJoin")[-1]
        assert "Exchange" not in join_part, join_part
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_sorted_write_produces_disjoint_file_ranges(spark, tmp_path):
    """write_sorted's value: parquet footer min/max stats form disjoint
    ranges across files, so range predicates skip whole files. Checked
    against the REAL footers via pyarrow, not the plan."""
    import glob

    import pyarrow.parquet as pq

    from cdc_via_flink_spark.sources.writers import write_sorted

    orders = load_table(spark, SF0001, "orders")
    path = str(tmp_path / "orders_sorted")
    write_sorted(orders, path, ["o_orderkey"], num_files=4)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderkey"
        )
        mins = [md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 2
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges {hi1} > {lo2}"


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """DPP: joining a partitioned fact to a FILTERED dim prunes fact
    partitions at runtime via the dim-side subquery — the 100 TB
    date-dim join pattern (only matching partition dirs are read)."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "orders_by_status")
    write_partitioned(load_table(spark, SF0001, "orders"), path, ["o_orderstatus"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")], "st string, label string"
    ).filter(F.col("label") == "finished")
    j = fact.join(dim, fact.o_orderstatus == dim.st)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(o_orderstatus" in plan, plan
    assert j.count() == fact.filter("o_orderstatus = 'F'").count()


def test_zordered_write_skips_on_both_dimensions(spark, tmp_path):
    """Z-order's value over a linear sort: footer min/max stats stay
    tight on BOTH clustered columns, so a quarter-domain predicate on
    EITHER column can skip files. A linear l_partkey sort would leave
    l_suppkey stats spanning the full domain in every file."""
    import glob

    import pyarrow.parquet as pq

    from cdc_via_flink_spark.sources.writers import write_zordered

    li = load_table(spark, SF0001, "lineitem").select("l_partkey", "l_suppkey")
    path = str(tmp_path / "li_zorder")
    write_zordered(li, path, ["l_partkey", "l_suppkey"], num_files=8)

    def file_ranges(col):
        out = []
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
            out.append((min(s.min for s in stats), max(s.max for s in stats)))
        return out

    n_files = len(glob.glob(f"{path}/part-*.parquet"))
    assert n_files >= 4
    for col in ("l_partkey", "l_suppkey"):
        ranges = file_ranges(col)
        lo = min(r[0] for r in ranges)
        hi = max(r[1] for r in ranges)
        q_lo, q_hi = lo, lo + (hi - lo) // 4  # bottom-quarter predicate
        overlapping = sum(1 for mn, mx in ranges if not (mx < q_lo or mn > q_hi))
        assert overlapping < n_files, f"{col}: no file skipped ({ranges})"


def test_zorder_key_rejects_too_many_bits(spark):
    import pytest

    from cdc_via_flink_spark.sources.writers import zorder_key

    li = load_table(spark, SF0001, "lineitem")
    with pytest.raises(ValueError):
        zorder_key(li, ["l_partkey", "l_suppkey"], bits=32)


def test_compact_parquet_dir_preserves_rows_and_reduces_files(spark, tmp_path):
    """Streaming-sink file dust -> one compaction pass: same rows,
    far fewer files, atomic swap (no temp dirs left behind)."""
    import os

    from cdc_via_flink_spark.sources.writers import compact_parquet_dir

    path = str(tmp_path / "dust")
    # 20 single-row files, the per-micro-batch append shape
    for i in range(20):
        spark.range(i * 5, i * 5 + 5).write.mode("append").parquet(path)
    before = spark.read.parquet(path)
    n_before = before.count()
    files_before = sum(
        1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
    )
    assert files_before >= 20

    stats = compact_parquet_dir(spark, path, target_mb=128)
    assert stats["files_before"] == files_before
    assert stats["files_after"] < files_before

    after = spark.read.parquet(path)
    assert after.count() == n_before
    assert sorted(r.id for r in after.collect()) == list(range(100))
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_compact_refuses_streaming_sink_dir(spark, tmp_path):
    """A dir carrying a _spark_metadata commit log is a streaming
    file-sink output: readers resolve files through the log, so
    compaction must refuse it outright."""
    import os

    import pytest

    from cdc_via_flink_spark.sources.writers import compact_parquet_dir

    path = str(tmp_path / "sinkdir")
    spark.range(10).write.parquet(path)
    os.makedirs(os.path.join(path, "_spark_metadata"))
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet_dir(spark, path)


def test_compact_recovers_from_crash_states(spark, tmp_path):
    """Every crash window of the swap protocol must self-heal on the
    next call: stale .tmp (crash before swap), .old without path
    (crash mid-swap), .old with path (crash before cleanup)."""
    import os
    import shutil

    from cdc_via_flink_spark.sources.writers import compact_parquet_dir

    path = str(tmp_path / "t")
    for i in range(6):
        spark.range(i * 5, i * 5 + 5).write.mode("append").parquet(path)
    rows = sorted(r.id for r in spark.read.parquet(path).collect())

    # crash before swap: stale unfinished tmp next to a healthy path
    shutil.copytree(path, path + "._compact_tmp")
    stats = compact_parquet_dir(spark, path)
    assert not os.path.exists(path + "._compact_tmp")
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows
    assert stats["files_after"] <= stats["files_before"]

    # crash mid-swap: path moved aside, tmp never renamed in
    os.rename(path, path + "._compact_old")
    shutil.copytree(path + "._compact_old", path + "._compact_tmp")
    compact_parquet_dir(spark, path)
    assert os.path.exists(path)
    assert not os.path.exists(path + "._compact_old")
    assert not os.path.exists(path + "._compact_tmp")
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows

    # crash after swap, before cleanup: superseded .old next to path
    shutil.copytree(path, path + "._compact_old")
    compact_parquet_dir(spark, path)
    assert not os.path.exists(path + "._compact_old")
    assert sorted(r.id for r in spark.read.parquet(path).collect()) == rows
