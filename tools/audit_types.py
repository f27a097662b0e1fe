#!/usr/bin/env python
"""Audit Spark vs DuckDB column TYPES for every declared query.

Round-4 driver lesson (CORRECTNESS_r04.json): the driver's value-hash is
dtype-sensitive — a DuckDB HUGEINT (SUM over BIGINT) vs Spark bigint, or
DuckDB BIGINT (ntile/rank) vs Spark int, hash-mismatches even when every
value is identical.  The 7 r4 driver failures (join_size_estimate,
rfm_segments, bm25_topk, rand_projection, ab_test, twap, chi_square) all
had exactly this shape, and nothing else.  This tool canonicalizes both
engines' type names and reports every declared query whose per-column
type vector differs, so an oracle-side CAST can close the gap before the
driver ever sees it.

Usage: python tools/audit_types.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# canonical names keyed by lowercase engine type name
_SPARK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "int": "i32",
    "bigint": "i64",
    "float": "f32",
    "double": "f64",
    "string": "str",
    "boolean": "bool",
    "date": "date",
    "binary": "bytes",
    "void": "null",
}
_DUCK_CANON = {
    "tinyint": "i8",
    "smallint": "i16",
    "integer": "i32",
    "bigint": "i64",
    "hugeint": "i128",
    "float": "f32",
    "double": "f64",
    "varchar": "str",
    "boolean": "bool",
    "date": "date",
    "blob": "bytes",
    '"null"': "null",
}


def canon_spark(t: str) -> str:
    t = t.strip().lower()
    if t in _SPARK_CANON:
        return _SPARK_CANON[t]
    if t.startswith("decimal"):
        return "dec" + t[len("decimal"):].replace(" ", "")
    if t.startswith("timestamp"):
        return "ts"
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return canon_spark(m.group(1)) + "[]"
    return t


def canon_duck(t: str) -> str:
    t = t.strip().lower()
    if t in _DUCK_CANON:
        return _DUCK_CANON[t]
    if t.startswith("decimal"):
        return "dec" + t[len("decimal"):].replace(" ", "")
    if t.startswith("timestamp"):
        return "ts"
    m = re.fullmatch(r"(.*)\[\]", t)
    if m:
        return canon_duck(m.group(1)) + "[]"
    return t


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--only", nargs="*")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from name_match_ml_spark.sources.parquet import TABLES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("audit-types")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args.only or sorted(n for n in queries if n in oracles)

    bad: dict[str, list] = {}
    errs: dict[str, str] = {}
    for name in names:
        try:
            sdf = queries[name](spark, args.sf_dir)
            stypes = {c: canon_spark(t) for c, t in sdf.dtypes}
            rel = duck.sql(oracles[name])
            dtypes = {c: canon_duck(str(t)) for c, t in zip(rel.columns, rel.types)}
            diffs = [
                (c, stypes.get(c), dtypes.get(c))
                for c in sorted(set(stypes) | set(dtypes))
                if stypes.get(c) != dtypes.get(c)
            ]
            if diffs:
                bad[name] = diffs
                print(f"MISMATCH {name}: {diffs}", flush=True)
            else:
                print(f"ok       {name}", flush=True)
        except Exception:
            errs[name] = traceback.format_exc(limit=2).strip().splitlines()[-1][:200]
            print(f"ERR      {name}: {errs[name]}", flush=True)

    print(f"\n{len(names)} checked: {len(bad)} type-mismatched, {len(errs)} errored")
    with open("TYPE_AUDIT.json", "w") as f:
        json.dump({"mismatch": bad, "err": errs}, f, indent=2)
    spark.stop()
    return 1 if bad or errs else 0


if __name__ == "__main__":
    sys.exit(main())
