"""Local DuckDB-oracle differential harness.

Mirrors the driver's t2 correctness gate (BASELINE.md): run each
declared query on Spark AND its oracle SQL on DuckDB over the same
parquet tables, then compare row count, column names, and
order-insensitive values. Used by tests/ so parity breaks surface
before the driver runs.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb

from cdc_via_flink_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int) and not isinstance(v, bool):
        return int(v)
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


@dataclass
class Diff:
    name: str
    ok: bool
    detail: str


def compare_query(spark, sf_dir: str, name: str, fn, oracle: str) -> Diff:
    sdf = fn(spark, sf_dir)
    s_cols = sorted(sdf.columns)
    s_rows = [tuple(_norm_cell(r[c]) for c in s_cols) for r in sdf.collect()]

    con = duckdb_connection(sf_dir)
    try:
        res = con.execute(oracle)
        d_cols_raw = [d[0] for d in res.description]
        d_rows_raw = res.fetchall()
    finally:
        con.close()
    d_order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i])
    d_cols = sorted(d_cols_raw)
    d_rows = [tuple(_norm_cell(row[i]) for i in d_order) for row in d_rows_raw]

    if s_cols != d_cols:
        return Diff(name, False, f"columns differ: spark={s_cols} duckdb={d_cols}")
    if len(s_rows) != len(d_rows):
        return Diff(name, False, f"row count: spark={len(s_rows)} duckdb={len(d_rows)}")
    s_sorted = sorted(s_rows, key=repr)
    d_sorted = sorted(d_rows, key=repr)
    if s_sorted != d_sorted:
        mism = [
            (a, b) for a, b in zip(s_sorted, d_sorted) if a != b
        ][:3]
        return Diff(name, False, f"values differ; first mismatches (spark, duckdb): {mism}")
    return Diff(name, True, f"{len(s_rows)} rows match")
