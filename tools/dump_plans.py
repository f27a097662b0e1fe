#!/usr/bin/env python
"""Dump the formatted physical plan of every declared query to a text
artifact (PLANS_r{N}.txt) so plan shapes — pushed filters, exchanges,
codegen spans, join strategies — can be audited without a Spark
session.  Uses sf0.001 (plan shape is data-independent; a few
operators do eager build-side sizing at plan construction, so small
inputs keep this fast).

Usage: python tools/dump_plans.py [--round 4] [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Training queries fit real models when the query function is CALLED —
# minutes of work for a plan listing; their plans are the MLlib
# pipeline's, not interesting enough to pay that.
SKIP = {"ml_train_eval"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    out_path = f"PLANS_r{args.round:02d}.txt"
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    with open(out_path, "w") as f:
        for name in sorted(queries):
            f.write(f"{'=' * 78}\n== {name}\n{'=' * 78}\n")
            if name in SKIP:
                f.write("(skipped: trains a model at plan-construction time)\n\n")
                continue
            try:
                df = queries[name](spark, args.sf_dir)
                f.write(df._jdf.queryExecution().explainString(mode))
                f.write("\n")
            except Exception:
                f.write("ERROR building plan:\n")
                f.write(traceback.format_exc(limit=3))
                f.write("\n")
            f.flush()
            print(name, flush=True)
    print(f"-> {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
