#!/usr/bin/env python
"""Dump explain("formatted") for named queries to plans/<dir>/<query>_<tag>.txt.

Usage: python tools/explain_query.py --dir plans/r10 --tag before q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--dir", default="plans/r10")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("explain-query")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    os.makedirs(args.dir, exist_ok=True)
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in args.queries:
        df = queries[name](spark, args.sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(args.dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
