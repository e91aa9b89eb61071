"""Z-order layout (plans/scale_queries.q_zorder_layout): the Morton
interleave must actually BUY two-column data skipping — written out
zval-sorted, every file's parquet footer min/max must be narrow on
BOTH predicate columns, where a linear sort is narrow on its leading
column only."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _file_spans(path_glob: str, col_a: str, col_b: str):
    """Per-file (span_a, span_b) from parquet footer statistics."""
    spans = []
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        mins = {col_a: None, col_b: None}
        maxs = {col_a: None, col_b: None}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    lo, hi = c.statistics.min, c.statistics.max
                    mins[name] = lo if mins[name] is None else min(mins[name], lo)
                    maxs[name] = hi if maxs[name] is None else max(maxs[name], hi)
        spans.append(
            (maxs[col_a] - mins[col_a], maxs[col_b] - mins[col_b])
        )
    return spans


def test_zorder_write_narrows_both_column_spans(spark, tmp_path):
    from cdc_via_flink_spark.plans.scale_queries import _ZB, _z16
    from cdc_via_flink_spark.sources.tables import load_table
    from tests.conftest import SF001

    li = load_table(spark, SF001, "lineitem").select("l_partkey", "l_suppkey")
    gmax = li.agg(
        F.max("l_partkey").alias("pk"), F.max("l_suppkey").alias("sk")
    ).collect()[0]
    n_files = 8

    # range-scaled codes, as in q_zorder_layout (raw-value interleave
    # would leave the narrower column unclustered — the trap the
    # query's docstring documents)
    mm = li.agg(
        F.min("l_partkey").alias("pk_mn"),
        F.max("l_partkey").alias("pk_mx"),
        F.min("l_suppkey").alias("sk_mn"),
        F.max("l_suppkey").alias("sk_mx"),
    )

    def scale(x, mn, mx):
        return F.floor((x - mn) * (1 << _ZB) / (mx - mn + F.lit(1))).cast(
            "long"
        )

    z = li.crossJoin(F.broadcast(mm)).select(
        "l_partkey",
        "l_suppkey",
        _z16(
            scale(F.col("l_partkey"), F.col("pk_mn"), F.col("pk_mx")),
            scale(F.col("l_suppkey"), F.col("sk_mn"), F.col("sk_mx")),
            bits=_ZB,
        ).alias("zval"),
    )
    zdir = str(tmp_path / "zorder")
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(zdir)
    )
    ldir = str(tmp_path / "linear")
    (
        li.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    zspans = _file_spans(zdir + "/part-*.parquet", "l_partkey", "l_suppkey")
    lspans = _file_spans(ldir + "/part-*.parquet", "l_partkey", "l_suppkey")
    assert len(zspans) >= 4 and len(lspans) >= 4

    # the z-layout must keep BOTH average spans well under the global
    # range; the linear layout is only narrow on its leading column
    z_pk = sum(s[0] for s in zspans) / len(zspans)
    z_sk = sum(s[1] for s in zspans) / len(zspans)
    l_pk = sum(s[0] for s in lspans) / len(lspans)
    l_sk = sum(s[1] for s in lspans) / len(lspans)
    assert l_pk < 0.5 * gmax.pk  # sanity: linear sort clusters its key
    assert z_pk < 0.7 * gmax.pk and z_sk < 0.7 * gmax.sk
    # the point: z beats linear on the SECOND column by a wide margin
    assert z_sk < 0.7 * l_sk, (z_sk, l_sk)