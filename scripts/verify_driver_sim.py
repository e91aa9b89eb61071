"""Driver-simulation verify: runs the __spark_entry__ contract exactly
as the external driver does — vanilla SparkSession, every queries()
entry vs its oracle_sql() on DuckDB at sf0.01 — and prints one line
per query plus a TOTAL FAILS count. Run by scripts/end_of_round.sh
and usable standalone for fast iteration (see ``only=``).

Comparison is STRICTER than simple value equality, to match the
driver's dtype-sensitive hash (round-1 lesson: the driver flagged
int32-vs-BIGINT, DECIMAL residue, and -0.0-vs-0.0 that a plain
Python == comparison cannot see):
  * canonical dtype parity: Spark simpleString vs DuckDB DESCRIBE,
    both mapped to i8/i16/i32/i64/f32/f64/decimal(p,s)/date/ts/...
  * exact float repr (so -0.0 != 0.0, no rounding slack)
  * Decimal values compared as tagged strings, and any decimal-typed
    Spark OUTPUT column is flagged as a policy violation (registry
    policy: money math in DECIMAL, final cast to DOUBLE).
"""

from __future__ import annotations

import decimal
import sys

import duckdb
from pyspark.sql import Row, SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

_SPARK_TAGS = {
    "tinyint": "i8", "smallint": "i16", "int": "i32", "integer": "i32",
    "bigint": "i64", "float": "f32", "double": "f64", "boolean": "bool",
    "string": "str", "date": "date", "timestamp": "ts",
    "timestamp_ntz": "ts", "binary": "bin", "void": "null",
}

_DUCK_TAGS = {
    "TINYINT": "i8", "SMALLINT": "i16", "INTEGER": "i32", "BIGINT": "i64",
    "HUGEINT": "i128", "UTINYINT": "u8", "USMALLINT": "u16",
    "UINTEGER": "u32", "UBIGINT": "u64", "FLOAT": "f32", "DOUBLE": "f64",
    "BOOLEAN": "bool", "VARCHAR": "str", "DATE": "date", "TIMESTAMP": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts", "BLOB": "bin", "JSON": "str",
}


def spark_tag(t: str) -> str:
    t = t.strip()
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{spark_tag(t[6:-1])}>"
    if t in _SPARK_TAGS:
        return _SPARK_TAGS[t]
    if t.startswith("decimal"):
        return t.replace(" ", "")
    return t  # struct/map/variant — compared raw


def duck_tag(t: str) -> str:
    t = t.strip()
    if t.endswith("[]"):
        return f"array<{duck_tag(t[:-2])}>"
    u = t.upper()
    if u in _DUCK_TAGS:
        return _DUCK_TAGS[u]
    if u.startswith("DECIMAL"):
        return u.lower().replace(" ", "")
    return t.lower()


def norm(v):
    """Exact, type-tagged cell normalization. No rounding slack: the
    driver's hash caught -0.0 vs 0.0, so repr() floats verbatim."""
    if v is None:
        return None
    if isinstance(v, float):
        return "NaN" if v != v else repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, Row):
        return tuple(sorted((k, norm(x)) for k, x in v.asDict().items()))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def main(
    sf: str = "/root/testdata/sf0.01",
    out_path: str = "/tmp/verify.txt",
    only: str = "",
) -> int:
    """`only` is an optional comma-separated query-name filter for
    fast iteration on a few queries; the skill runs the full set."""
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = open(out_path, "w")
    if not only:
        res.write(f"SMOKE rows: {len(E.entry(spark).collect())}\n")
    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        keep = set(only.split(","))
        unknown = keep - set(qs)
        if unknown:
            # a misspelled name must not yield a silent empty run
            print(f"UNKNOWN QUERY NAMES in only=: {sorted(unknown)}")
            return 2
        qs = {k: v for k, v in qs.items() if k in keep}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    fails = 0
    for name, fn in sorted(qs.items()):
        sdf = fn(spark, sf)
        s_schema = {f.name: spark_tag(f.dataType.simpleString()) for f in sdf.schema}
        dec_cols = [c for c, tag in s_schema.items() if tag.startswith("decimal")]
        cols = sorted(sdf.columns)
        s = sorted(
            [tuple(norm(r[c]) for c in cols) for r in sdf.collect()], key=repr
        )
        if name not in oracles:
            flag = f" DECIMAL-OUT:{dec_cols}" if dec_cols else ""
            res.write(f"ROWSONLY {name} {len(s)}{flag}\n")
            if dec_cols:
                fails += 1
            continue
        d_desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
        d_schema = {row[0]: duck_tag(row[1]) for row in d_desc}
        r2 = con.execute(oracles[name])
        dc = [x[0] for x in r2.description]
        order = sorted(range(len(dc)), key=lambda i: dc[i])
        d = sorted(
            [tuple(norm(row[i]) for i in order) for row in r2.fetchall()], key=repr
        )
        problems = []
        if sorted(dc) != cols:
            problems.append(f"cols {sorted(dc)} != {cols}")
        else:
            bad = {
                c: (s_schema[c], d_schema[c])
                for c in cols
                if s_schema[c] != d_schema[c]
            }
            if bad:
                problems.append(f"dtypes {bad}")
        if dec_cols:
            problems.append(f"DECIMAL-OUT:{dec_cols}")
        if s != d:
            diff = next(
                (i for i, (a, b) in enumerate(zip(s, d)) if a != b), None
            )
            problems.append(
                f"values (rows {len(s)} vs {len(d)}, first diff at sorted idx "
                f"{diff}: {s[diff] if diff is not None else ''!r} vs "
                f"{d[diff] if diff is not None else ''!r})"
            )
        ok = not problems
        fails += 0 if ok else 1
        res.write(
            ("OK " if ok else "MISMATCH ")
            + f"{name} {len(s)} {len(d)}"
            + ("" if ok else " | " + " | ".join(problems))
            + "\n"
        )
    res.write(f"TOTAL FAILS: {fails}\n")
    res.close()
    print(open(out_path).read().splitlines()[0])
    print(f"TOTAL FAILS: {fails} (full report: {out_path})")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
