#!/usr/bin/env python
"""Targeted per-query timing for optimization work: same methodology as
bench.py (local[$SPARK_GRAFT_CPUS], noop sink, warm session, min of N
interleaved passes) but over an explicit query subset, so an
optimization loop can re-measure its targets in seconds instead of
re-running the full extended set.

Usage: python tools/time_queries.py q1 q2 ... [--runs 2] [--sf-dir ...]
       [--out TIMES.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("time-queries")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    for q in args.queries:
        if q not in queries:
            print(f"unknown query: {q}", file=sys.stderr)
            return 2

    # warm-up: JVM/codegen + Python worker pool + Arrow path (bench.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    queries["distinct_pairs"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s * 1.0, "double")
    (
        spark.range(int(cpus) * 1000)
        .repartition(int(cpus))
        .select(_warm(col("id")))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    log: dict[str, list[float]] = {q: [] for q in args.queries}
    for _ in range(args.runs):
        for q in args.queries:
            spark.sparkContext.setJobDescription(f"time: {q}")
            t0 = time.perf_counter()
            queries[q](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            log[q].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": args.sf_dir,
        "runs": args.runs,
        "load_1m": round(os.getloadavg()[0], 2),
        "times": {q: round(min(r), 3) for q, r in log.items()},
        "all_runs": {q: [round(x, 3) for x in r] for q, r in log.items()},
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
