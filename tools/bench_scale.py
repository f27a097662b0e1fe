#!/usr/bin/env python
"""Scale-trend benchmark: run a query set at sf0.1 and at the replicated
10x corpus (tools/make_scale_data.py -> .scale_data/sf1.0) and report
per-query time ratios.  A correct scale design keeps every ratio at or
below ~linear (10x data -> <= ~10x time, usually much less while local
overheads dominate); a super-linear ratio is a quadratic-blowup smell.

Usage: python tools/bench_scale.py [--out BENCH_SCALE_r04.json]
       [--runs 2] [--queries q1 q2 ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    # pinned headline set (same as bench.py)
    "pricing_summary", "join_orders_customer", "outer_join_agg",
    "window_rank", "window_running_sum", "rollup_agg", "count_distinct",
    "time_tumbling", "time_sliding", "session_windows", "json_events",
    "dedup_exact", "ngram_jaccard_dedup", "minhash_lsh_dedup",
    "simhash_dedup", "cosine_topk", "text_quality", "doc_fingerprint",
    "text_stats", "topk_orders", "flagship_namematch",
    # round-3/4 extended ops with non-trivial scale shapes
    "leak_safe_split", "select_keepers", "bigram_logprob",
    "span_dedup", "shared_substring", "gopher_quality", "epoch_upsample",
    "embedding_quantize", "quantized_cosine_topk", "curriculum_order",
    "weighted_sample", "novelty_score", "corpus_diff",
    "shared_substring_winnow", "doc_pagerank",
    # round-4 second/third batches
    "bloom_decontaminate", "stratified_sample", "vocab_coverage",
    "inverted_index", "containment_dedup", "containment_sketch",
    "window_range_frame",
    "salted_agg", "correlated_subquery", "time_topk", "doc_triangles",
    "scd2_history", "dq_profile", "apply_cdc", "kmv_distinct",
    "label_centroids", "window_distribution", "salted_join", "cms_term_counts", "winsorize", "zorder_key",
    "grouped_udaf", "enrich_events",
    # round-5 batches
    "hilbert_layout", "interval_concurrency", "minhash_est_audit",
    "feature_minmax", "ml_confusion", "market_share", "returned_revenue",
    "bracket_predicate", "part_promotion", "cusum_changepoint",
    "graph_modularity", "robust_outliers", "copurchase_lift",
    "kmv_overlap",
    # round-5 continuation: graph cohesion, attribution, rank fusion,
    # TPC-H completion, and the two operators whose scale behavior this
    # round FIXED (containment auto cost model, LSH signature codegen)
    "k_core", "clustering_coeff", "multi_touch", "rrf_fusion",
    "late_order_priority", "discount_revenue", "priority_mix",
    "lsh_cosine_topk", "semantic_dedup",
    # round-6: composed cleaning pipeline, tokenizer train+apply for
    # both families, frozen linear quality gate
    "pipeline_clean_corpus", "unigram_lm_vocab", "unigram_lm_segments",
    "unigram_tokenize_docs", "bpe_tokenize_docs", "model_quality_filter",
    "dsir_select", "fuzzy_decontaminate", "backoff_logprob",
    "tokenizer_compression", "wordpiece_merges", "wordpiece_tokenize_docs",
    "mmr_topk", "kcenter_select", "bitext_mine", "temperature_mixture",
    "multimodal_audio_segments", "token_budget_select",
    "label_propagation", "char_entropy", "charngram_langid",
    "pipeline_select_corpus", "graph_walks", "zipf_fit", "graph_summary",
    # round-7 additions measured in BENCH_SCALE_r07
    "pq_topk", "grid_ivf_topk", "grid_pca", "pca_residual",
    "pack_attention_spans", "pipeline_pack_corpus",
    # round-8 additions (BENCH_SCALE_r08; fixed-query ANN trend in
    # tools/bench_ann_fixedq.py -> BENCH_SCALE_r08_fixedq)
    "opq_topk", "exact_substring_spans", "incremental_near_dup",
]

NOTES = {
    "video_phash_dedup": (
        "work is TH(true matched pairs): the synthetic corpus's templated "
        "texts put ~32% of videos in large identical-frame families (even "
        "exact-only matching finds 25.3k pairs / 1666 videos at sf0.1), so "
        "10x replication grows true pair volume ~x100 while runtime grows "
        "x26 — SUB-linear in input+output; for corpora with giant dup "
        "families resolve clusters (dedup_clusters/incremental_dedup_"
        "clusters) instead of mutual neighbor counts"
    ),
    "incremental_dedup_clusters": (
        "the %5 delta is corpus-proportional by the declared convention, so "
        "delta-side work scales with the corpus; a production batch is "
        "fixed-size and the affected-component CC rerun is delta-bounded"
    ),
    "incremental_refresh_pipeline": (
        "composes the band-index and cluster maintenance stages; inherits "
        "the corpus-proportional %5 delta convention above"
    ),
    "ivfpq_topk": (
        "declared convention queries = vec_id %% 10 (corpus-proportional); "
        "the FIXED-query trend is in BENCH_SCALE_r10_fixedq.json"
    ),
    "unigram_lm_vocab": (
        "lexicon-bounded: corpus scanned once for word counts; EM rounds "
        "work on the capped word table, so 10x data only grows the scan"
    ),
    "unigram_lm_segments": "same lexicon-bounded chain as unigram_lm_vocab",
    "unigram_tokenize_docs": (
        "training is lexicon-bounded; apply is one explode + one hash "
        "join, linear in corpus tokens"
    ),
    "bpe_tokenize_docs": (
        "merge replay is distinct-word-bounded; apply join linear in "
        "corpus tokens"
    ),
    "model_quality_filter": "one per-row int64 fold; scan-bound",
    "flagship_namematch": (
        "flat by corpus construction: the roster derives from bounded "
        "distinct name vocabularies, so distinct-pair scoring work does "
        "not grow 10x"
    ),
    "cosine_topk": "BLAS-bound GEMM; batch count grows, per-batch cost dominates",
    "quantized_cosine_topk": "same GEMM shape as cosine_topk (int8 codes)",
    "embedding_quantize": "pure map-side projection; scan-bound",
    "gopher_quality": "pure map-side codegen; scan-bound",
    "epoch_upsample": "map-side explode; scan-bound",
    "containment_dedup": (
        "exact-by-contract baseline: no sound length/prefix prune exists "
        "for containment, so work is the full shingle-join sum-of-df^2 "
        "(grows linearly in replicas) plus pair-agg pressure; the "
        "documented 100 TB path is MinHash containment estimation or a "
        "stop-shingle df cap"
    ),
    "containment_sketch": (
        "the KMV sketch path: per-doc state capped at sketch_k longs, "
        "self-join carries only sketch elements"
    ),
    "weighted_sample": "per-task top-k heaps; output size fixed",
    "corpus_diff": "one full-outer join; overhead-dominated at this scale",
    "bloom_decontaminate": "map-side Arrow probe of a fixed bitset; scan-bound",
    "stratified_sample": "WindowGroupLimit partial top-n; output fixed per stratum",
    "hilbert_layout": "pure per-row int64 codegen; scan-bound",
    "feature_minmax": "explode + dim-keyed agg; dims fixed, rows scale linearly",
    "minhash_est_audit": (
        "pair work tracks the true duplicate count (pair source is the "
        "blocked exact-Jaccard join); signature projection is scan-bound"
    ),
    "cusum_changepoint": (
        "one partial-combining daily aggregate; windows only over the "
        "<=366-row daily table, so window cost is scale-invariant"
    ),
    "graph_modularity": "CC + aggregates over the pair stream, never the corpus",
    "copurchase_lift": "order-keyed self-join; fan-out bounded by basket sizes",
    "containment_dedup": (
        "auto picks by the two-cost model: bitmap GEMM at sf0.1, "
        "countjoin at sf1.0 (the replicated corpus keeps per-shingle df "
        "constant, so the countjoin's sum-df^2 join rows grow linearly)"
    ),
    "k_core": "degree agg + anti joins per peel round over the pair stream only",
    "clustering_coeff": "triangle enumeration over the pair stream, never the corpus",
    "multi_touch": "one user-partitioned window carry + two aggregates",
    "rrf_fusion": "upstream rankers scan-bound; fusion join <= sum of top-n rows",
    "lsh_cosine_topk": (
        "signature stage is a per-row HOF fold (scan-bound); bucket join "
        "fan-out held by adaptive nbits (one bit per corpus doubling)"
    ),
    "semantic_dedup": "per-row cell assignment + within-cell integer verify",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SCALE_r04.json")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--small", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default=".scale_data/sf1.0")
    ap.add_argument("--queries", nargs="*", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = [n for n in (args.queries or DEFAULT_QUERIES) if n in queries]

    # warm-up: JVM codegen + Python worker pool + Arrow path
    spark.range(1000).selectExpr("sum(id)").collect()
    queries["distinct_pairs"](spark, args.small).write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import col, pandas_udf

    _warm = pandas_udf(lambda s: s * 1.0, "double")
    (
        spark.range(32_000).repartition(32).select(_warm(col("id")))
        .write.format("noop").mode("overwrite").save()
    )

    def run(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    per_query: dict[str, dict] = {}
    tot_small = tot_big = 0.0
    for name in names:
        s = run(name, args.small)
        b = run(name, args.big)
        tot_small += s
        tot_big += b
        per_query[name] = {"sf0.1": s, "sf1.0": b, "ratio": round(b / s, 2)}
        if name in NOTES:
            per_query[name]["note"] = NOTES[name]
        print(f"{name:28s} {s:8.3f} -> {b:8.3f}  x{b / s:.2f}", flush=True)

    out = {
        "purpose": (
            "scale trend of the pinned headline set + round-3/4 extended ops: "
            "sf0.1 (driver corpus) vs sf1.0 (10x replication via "
            "tools/make_scale_data.py, key-shifted replicas, word-tagged "
            "documents, rolled embeddings)"
        ),
        "data_ratio": 10.0,
        "total_sec": {"sf0.1": round(tot_small, 3), "sf1.0": round(tot_big, 3)},
        "total_ratio": round(tot_big / tot_small, 2),
        "queries": per_query,
        "runs_per_point": args.runs,
        "load_1m_end": round(os.getloadavg()[0], 2),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\ntotal {tot_small:.1f}s -> {tot_big:.1f}s (x{tot_big / tot_small:.2f}) -> {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
