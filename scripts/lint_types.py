"""Cross-engine dtype lint: for every registered query, compare the
Spark result schema against the DuckDB oracle's result types.

Rationale (round-1 lesson): the round driver's value hasher is
type-sensitive — DuckDB HUGEINT (int128) hashed differently from
Spark BIGINT even with bit-identical values, because DuckDB's pandas
conversion turns HUGEINT into float64 (a VALUE change, 1 -> 1.0).
Round-1 CORRECTNESS proves which differences the hasher tolerates:
int32-vs-BIGINT, TINYINT-vs-int, and ltz-vs-ntz timestamps (under a
UTC session) all hashed green (text_stats, ann_*, dedup_simhash,
resample_gap_fill...), so pure width/flavor differences are SAFE and
reported as info only. FATAL = classes where the pandas conversion
changes the value representation: HUGEINT, DECIMAL, unmapped types.

Usage: python scripts/lint_types.py [sf_dir]
"""

from __future__ import annotations

import importlib.util
import os
import re
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# DuckDB type -> expected Spark simpleString dtype
_SCALAR = {
    "BIGINT": "bigint",
    "INTEGER": "int",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "HUGEINT": "<int128: always a lint failure>",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "DATE": "date",
    "TIMESTAMP": "timestamp_ntz",  # naive on both sides
    "BLOB": "binary",
}


def duck_to_spark(t: str) -> str:
    t = str(t).upper()
    m = re.fullmatch(r"(.+)\[\]", t)
    if m:
        return f"array<{duck_to_spark(m.group(1))}>"
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    return _SCALAR.get(t, f"<unmapped duckdb type {t}>")


def main() -> int:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # Width/flavor pairs proven hash-safe by round-1 driver rows.
    SAFE = {
        ("int", "bigint"), ("smallint", "bigint"), ("tinyint", "bigint"),
        ("int", "tinyint"), ("int", "smallint"), ("bigint", "tinyint"),
        ("bigint", "smallint"), ("timestamp", "timestamp_ntz"),
        ("float", "double"),
    }

    qs, oracles = mod.queries(), mod.oracle_sql()
    bad = []
    for name in qs:
        if name not in oracles:
            continue
        sdf = qs[name](spark, SF_DIR)
        sdt = dict(sdf.dtypes)
        rel = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
        fatal, info = [], []
        for c, t in zip(rel.columns, rel.types):
            want = duck_to_spark(t)
            got = sdt.get(c, "<missing column>")
            if got == want:
                continue
            msg = f"{c}: spark={got} duck={t}->{want}"
            if "<" in want or "<" in got or "decimal" in want:
                fatal.append(msg)
            elif (got, want) in SAFE or (want, got) in SAFE:
                info.append(msg)
            else:
                fatal.append(msg)
        if fatal:
            bad.append(name)
            print(f"  {name}: FATAL " + "; ".join(fatal))
        if info:
            print(f"  {name}: info(safe) " + "; ".join(info))
    print(f"{'TYPE LINT FAIL: ' + ','.join(bad) if bad else 'NO FATAL TYPE MISMATCHES'} "
          f"({len(oracles)} oracle queries)")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
