#!/usr/bin/env python
"""ANN scale trend with a FIXED query set (VERDICT r7 #2/#4 closeout).

The declared grid_ivf_topk/pq_topk queries use the in-repo convention
``queries = corpus rows with vec_id % 10 == 0`` — so at 10x data the
measured work grows ~10x queries x ~10x candidates = ~100x pair volume
(the x10.6 trend BENCH_SCALE_r07 recorded).  The production framing is
a FIXED query workload against a growing corpus: this script holds the
query set constant (the sf0.1 convention set) and scales only the
corpus (sf0.1 -> .scale_data/sf1.0), which the round-8 explicit
``queries=`` API makes expressible.  A correct scale shape is ~linear.

Usage: python tools/bench_ann_fixedq.py [--out BENCH_SCALE_r08_fixedq.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SCALE_r08_fixedq.json")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("ann-fixedq-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from name_match_ml_spark.operators.clustering import grid_ivf_topk
    from name_match_ml_spark.operators.pq import ivfpq_topk, pq_topk

    small = "/root/testdata/sf0.1/embeddings.parquet"
    big = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data/sf1.0/embeddings.parquet",
    )
    # FIXED query set: the sf0.1 convention queries, used against BOTH
    # corpus sizes.
    fixed_q = spark.read.parquet(small).filter(F.col("vec_id") % 10 == 0)
    fixed_q = fixed_q.localCheckpoint()
    n_q = fixed_q.count()

    def run(fn, corpus_path: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            corpus = spark.read.parquet(corpus_path)
            t0 = time.monotonic()
            fn(corpus, fixed_q).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    # warm-up (JVM + codegen)
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict = {
        "purpose": (
            "10x corpus scale trend for the ANN family with a FIXED query "
            "set (the production contract the round-8 explicit queries= "
            "API expresses); compare BENCH_SCALE_r07's x10.6 under the "
            "corpus-proportional query convention"
        ),
        "n_queries_fixed": n_q,
        "data_ratio": 10.0,
        "queries": {},
    }
    for name, fn in [
        ("grid_ivf_topk", lambda c, q: grid_ivf_topk(c, q, k_cells=10, n_probe=4, k=5)),
        ("pq_topk", lambda c, q: pq_topk(c, q)),
        # round 10: the IVFADC composition — the production shape whose
        # fixed-query trend should sit at or below its two halves'
        ("ivfpq_topk", lambda c, q: ivfpq_topk(c, q)),
    ]:
        t_small = run(fn, small)
        t_big = run(fn, big)
        out["queries"][name] = {
            "sf0.1": t_small,
            "sf1.0": t_big,
            "ratio": round(t_big / max(t_small, 1e-9), 2),
        }
        print(name, out["queries"][name], flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
