"""Driver-simulation verify: runs the __spark_entry__ contract exactly
as the external driver does — vanilla SparkSession, every queries()
entry vs its oracle_sql() on DuckDB at sf0.01 — and prints one line
per query plus a TOTAL FAILS count. Used by .claude/skills/verify."""

from __future__ import annotations

import sys

import duckdb
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def main(sf: str = "/root/testdata/sf0.01", out_path: str = "/tmp/verify.txt") -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = open(out_path, "w")
    res.write(f"SMOKE rows: {len(E.entry(spark).collect())}\n")
    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = 0
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        cols = sorted(sdf.columns)
        s = sorted(
            [tuple(norm(r[c]) for c in cols) for r in sdf.collect()], key=repr
        )
        if name not in oracles:
            res.write(f"ROWSONLY {name} {len(s)}\n")
            continue
        r2 = con.execute(oracles[name])
        dc = [d[0] for d in r2.description]
        order = sorted(range(len(dc)), key=lambda i: dc[i])
        d = sorted(
            [tuple(norm(row[i]) for i in order) for row in r2.fetchall()], key=repr
        )
        ok = sorted(dc) == cols and s == d
        fails += 0 if ok else 1
        res.write(("OK " if ok else "MISMATCH ") + f"{name} {len(s)} {len(d)}\n")
    res.write(f"TOTAL FAILS: {fails}\n")
    res.close()
    print(open(out_path).read().splitlines()[0])
    print(f"TOTAL FAILS: {fails} (full report: {out_path})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
