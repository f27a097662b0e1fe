#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end into the no-op sink (full pipeline runs on
executors; no driver collect skew). One warm-up run of a tiny query JITs
the session first so measured times are engine time, not JVM startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# PINNED headline set (round 1 baseline = BENCH_r01.json): keep this
# list stable across rounds so per-query and total deltas stay
# apples-to-apples.  New suite queries are deliberately NOT auto-added;
# extend only with a conscious baseline reset.
# New queries after the r1 baseline: timed and reported separately so the
# pinned set stays apples-to-apples across rounds.
EXTENDED = [
    "decontaminate",
    "repetition_filter",
    "mixture_sample",
    "pack_documents",
    "leak_safe_split",
    "unigram_logprob",
    "bigram_logprob",
    "select_keepers",
    # Multimodal codecs: a regression off the Arrow path (e.g. falling back
    # to row-at-a-time) would otherwise be invisible to the bench gate.
    "multimodal_image_features",
    "multimodal_audio_features",
    "multimodal_frame_sample",
    # round 4: span-level dedup, substring dedup, rule gate, upsampling,
    # int8 quantized ANN
    "span_dedup",
    "shared_substring",
    "gopher_quality",
    "epoch_upsample",
    "embedding_quantize",
    "quantized_cosine_topk",
    "curriculum_order",
    "weighted_sample",
    "novelty_score",
    "corpus_diff",
    "shared_substring_winnow",
    "doc_pagerank",
    # round 4 second batch: constant-memory Bloom decontamination,
    # quota sampling, vocab coverage, index build, containment dedup,
    # time-range frames, salted aggregation
    "bloom_decontaminate",
    "stratified_sample",
    "vocab_coverage",
    "inverted_index",
    "containment_dedup",
    "containment_sketch",
    "window_range_frame",
    "salted_agg",
    "correlated_subquery",
    "correlated_exists",
    "null_semantics",
    "time_topk",
    "doc_triangles",
    "grouped_udaf",
    "enrich_events",
    "python_datasource",
    "lateral_topk_join",
    "variant_events",
    "unpivot_metrics",
    "mode_stats",
    "recursive_cte",
    "collection_ops",
    "session_dynamic_gap",
    "scd2_history",
    "dq_profile",
    "apply_cdc",
    "kmv_distinct",
    "label_centroids",
    "window_distribution",
    "salted_join",
    "cms_term_counts",
    "winsorize",
    "zorder_key",
    # round 4 event-analytics family: funnel, cohort, transitions,
    # fixed-point gap-fill, continuous-aggregate rollup
    "event_funnel",
    "cohort_retention",
    "event_transitions",
    "gapfill_interpolate",
    "hierarchical_rollup",
    # round 4 TPC-H shape completion (Q7/Q9/Q13/Q14/Q15/Q18 analogs)
    "volume_shipping",
    "product_profit",
    "top_supplier",
    "large_orders",
    "promo_revenue",
    "order_count_distribution",
    # SemDeDup-style LSH-cell semantic dedup (integer predicate)
    "semantic_dedup",
    # mixture-drift KL monitor + exact rolling-median window
    "source_divergence",
    "rolling_median",
    # distributed BPE tokenizer training (merge log + final segmentation)
    "bpe_merges",
    "bpe_segments",
    # stream-stream LEFT OUTER interval join (batch twin)
    "stream_left_join",
    # metrics-warehouse anomaly + bounded-state quantiles
    "zscore_outliers",
    "sampled_quantiles",
    # oracle-checked blocked similarity join (the reference's core
    # semantic with native Levenshtein instead of the thefuzz scorer)
    "similarity_join_exact",
    # share-of-total reporting over the pre-aggregated nation table
    "ratio_to_report",
    # round 4c: Fellegi-Sunter linkage, fixed-point EWMA, 2-D skyline,
    # schema-evolution union, ordered string aggregation
    "fs_linkage",
    "ewma_smooth",
    "skyline_orders",
    "schema_union_evolve",
    "string_agg_segments",
    # round 4d: runtime bloom filter, histogram, attribution,
    # expectation gate, incremental agg maintenance, bounded BFS
    "bloom_join_reduce",
    "equi_width_histogram",
    "attribution",
    "expect_quarantine",
    "agg_state_merge",
    "bfs_reach",
    "chi_square",
    "calendar_dim",
    "skew_profile",
    "scd2_lookup",
    "rolling_active_users",
    "k_anonymity",
    "seq_pattern",
    "twap",
    "survivorship",
    "rand_projection",
    "knn_label",
    "ab_test",
    "bm25_topk",
    "trend_slope",
    "dp_counts",
    "rfm_segments",
    "shortest_path",
    "join_size_estimate",
    "waiting_suppliers",
    "idle_rich_customers",
    "multimodal_audio_resample",
    "multimodal_image_tiles",
    "table_digest",
    "copurchase_pairs",
    # round 5: Hilbert layout key, sweep-line concurrency, sketch-accuracy
    # audit, feature scaling, kNN confusion metrics
    "hilbert_layout",
    "interval_concurrency",
    "minhash_est_audit",
    "feature_minmax",
    "ml_confusion",
    # round 5 second batch: TPC-H Q8/Q10/Q19/Q20 shapes, CUSUM
    # change-point, modularity of the dedup clustering
    "market_share",
    "returned_revenue",
    "bracket_predicate",
    "part_promotion",
    "cusum_changepoint",
    "graph_modularity",
    # round 5 third batch: robust median/MAD outliers, association lift
    "robust_outliers",
    "copurchase_lift",
    "kmv_overlap",
    # round 5 fourth batch: k-core cohesion gate, linear multi-touch,
    # per-node clustering coefficient
    "k_core",
    "multi_touch",
    "clustering_coeff",
    "rrf_fusion",
    # TPC-H completion to the corpus's column limit (Q4/Q6/Q12 shapes;
    # Q2/Q11/Q16 need partsupp, which the corpus does not carry)
    "late_order_priority",
    "discount_revenue",
    "priority_mix",
    "seasonal_naive",
    # hyperplane-LSH ANN: its signature stage regressed invisibly once
    # (codegen compile storm on the collapsed projection) — keep a row
    "lsh_cosine_topk",
    # round 6: composed five-stage cleaning pipeline (single staged pair
    # graph), unigram-LM tokenizer training, frozen linear quality gate
    "pipeline_clean_corpus",
    "unigram_lm_vocab",
    "unigram_lm_segments",
    "model_quality_filter",
    "unigram_tokenize_docs",
    "bpe_tokenize_docs",
    # round 6 continuation: DSIR selection, WordPiece family, fuzzy
    # decontamination, backoff LM, MMR/k-center diversity selection
    "dsir_select",
    "fuzzy_decontaminate",
    "backoff_logprob",
    "tokenizer_compression",
    "wordpiece_merges",
    "wordpiece_tokenize_docs",
    "mmr_topk",
    "kcenter_select",
    "bitext_mine",
    "temperature_mixture",
    "multimodal_audio_segments",
    "token_budget_select",
    "label_propagation",
    "char_entropy",
    "charngram_langid",
    "pipeline_select_corpus",
    "graph_walks",
    "zipf_fit",
    "graph_summary",
    # round 7: integer-grid k-means, URL dedup, per-domain priors
    "grid_kmeans",
    "url_dedup",
    "domain_priors",
    # round 7 continuation: blocklist gate, perplexity buckets, PQ ANN,
    # line-frequency boilerplate removal, cluster-balanced coreset,
    # integer-grid PCA + all-but-the-top, grid IVF
    "blocklist_filter",
    "perplexity_buckets",
    "pq_topk",
    "boilerplate_spans",
    "cluster_balanced_sample",
    "grid_pca",
    "pca_residual",
    "grid_ivf_topk",
    "unimax_mixture",
    "decontaminate_spans",
    "hll_distinct",
    "pack_attention_spans",
    "pipeline_pack_corpus",
    "eval_contamination_report",
    # round 8: rotated PQ, exact-substring repeated spans, CDC near-dup
    "opq_topk",
    "exact_substring_spans",
    "incremental_near_dup",
    # round 9: perceptual image dedup, CDC LSH index, quantile sketch
    "phash_image_dedup",
    "incremental_lsh_index",
    "sketch_quantiles",
    # round 10: IVFADC ANN, incremental components, video perceptual
    # dedup, theta set algebra
    "ivfpq_topk",
    "incremental_dedup_clusters",
    "video_phash_dedup",
    "theta_set_ops",
    "theta_multiway",
    "incremental_refresh_pipeline",
]

HEADLINE = [
    "pricing_summary",
    "join_orders_customer",
    "outer_join_agg",
    "window_rank",
    "window_running_sum",
    "rollup_agg",
    "count_distinct",
    "time_tumbling",
    "time_sliding",
    "session_windows",
    "json_events",
    "dedup_exact",
    "ngram_jaccard_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "cosine_topk",
    "text_quality",
    "doc_fingerprint",
    "text_stats",
    "topk_orders",
    "flagship_namematch",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("name-match-ml-spark-bench")
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
    headline = HEADLINE
    load_start = os.getloadavg()

    # Warm up the session: JVM/codegen init, then the Python worker pool +
    # Arrow serialization path (forking $cpus workers and importing pandas
    # is one-time environment cost, not engine time — without this the one
    # Arrow-UDF query in the list pays it).
    spark.range(1000).selectExpr("sum(id)").collect()
    queries["distinct_pairs"](spark, sf_dir).write.format("noop").mode("overwrite").save()

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

    # min-of-2 per query: single-run readings vary 2-3x under this
    # host's background load (measured: ngram_jaccard_dedup 3.4-23.7 s
    # for identical plans); the min of two executions is the standard
    # noise-robust estimator and is reported as such below.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    # Load is recorded per QUERY, not per run (VERDICT r2 "what's wrong"
    # #2: a 3.6x swing on an unchanged one-aggregate plan tracked a
    # load_1m spike).  The retry trigger is run DISPERSION, not absolute
    # load — a 32-core bench generates load_1m ≈ 10 all by itself, so an
    # absolute bound can't tell self-load from contention, but two clean
    # runs of the same plan agree within ~1.5x while a contended window
    # shows 2-3x.  Up to 2 extra runs per noisy query.
    #
    # Runs are INTERLEAVED as full passes over the query list (pass 1 of
    # every query, then pass 2, ...): back-to-back repeats of one query
    # always see the same load window, so the bench's own ramping
    # load_1m (≈ 0 at start, 12-15 by the tail) systematically inflated
    # late queries in every round — min over two well-separated passes
    # decorrelates a query's readings from any single contention window.
    # Spread semantics (round 7): the noise indicator is the ratio of the
    # two SMALLEST runs, not max/min — the first execution of a plan pays
    # one-time planning/codegen cost, so max/min conflates that
    # systematic pass-1 premium with genuine host noise (measured on an
    # idle host: max/min spreads 1.0-2.8 while best-two ratios sit near
    # 1.0).  Retries fire until the two best runs agree within the bound.
    spread_bound = float(os.environ.get("SPARK_GRAFT_SPREAD_BOUND", "1.25"))
    run_log: dict[str, list[float]] = {n: [] for n in headline if n in queries}
    load_log: dict[str, list[float]] = {n: [] for n in run_log}

    def _run_once(name: str) -> None:
        l0 = os.getloadavg()[0]
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        run_log[name].append(dt)
        load_log[name].append(max(l0, os.getloadavg()[0]))

    def _best_two_ratio(runs: list[float]) -> float:
        lo = sorted(runs)[:2]
        return lo[1] / lo[0] if len(lo) == 2 else 1.0

    for _pass in range(runs_per_query):
        for name in run_log:
            _run_once(name)
    # up to 2 extra runs for queries whose two best runs disagree > bound
    for name, runs in run_log.items():
        while _best_two_ratio(runs) > spread_bound and len(runs) < runs_per_query + 2:
            _run_once(name)

    timings: dict[str, float] = {}
    query_load: dict[str, float] = {}
    query_spread: dict[str, float] = {}
    for name, runs in run_log.items():
        best = min(range(len(runs)), key=lambda i: runs[i])
        timings[name] = round(runs[best], 3)
        query_load[name] = round(load_log[name][best], 2)
        query_spread[name] = round(_best_two_ratio(runs), 2)

    skip_ext = os.environ.get("SPARK_GRAFT_SKIP_EXTENDED", "") == "1"
    ext_log: dict[str, list[float]] = (
        {} if skip_ext else {n: [] for n in EXTENDED if n in queries}
    )
    for _pass in range(runs_per_query):
        for name in ext_log:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            ext_log[name].append(time.perf_counter() - t0)
    extended = {n: round(min(r), 3) for n, r in ext_log.items()}

    # Quiet-run discipline (VERDICT r6 "what's wrong" #1): a reading is
    # only comparable quiet-vs-quiet when the host was actually quiet.
    # quiet = AMBIENT load_1m < 4 when the bench started (per-query
    # load_1m is dominated by the bench's own 32-core work — measured
    # 3-13 on a fully idle host — so an absolute per-query bound cannot
    # separate self-load from contention) AND every headline query's two
    # best runs agree within 1.25x after retries.  The tag is always
    # written; with SPARK_GRAFT_REQUIRE_QUIET=1 a non-quiet run refuses
    # to overwrite the artifact (exits non-zero) instead of silently
    # recording noise.
    QUIET_AMBIENT, QUIET_SPREAD = 4.0, 1.25
    not_quiet = sorted(n for n in run_log if query_spread[n] > QUIET_SPREAD)
    quiet = load_start[0] < QUIET_AMBIENT and not not_quiet

    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    # The driver captures only the LAST ~2000 chars of stdout and parses a
    # JSON line out of it (BENCH_r04.json: "parsed": null once the line,
    # grown by 100+ extended queries, overflowed that window).  So stdout
    # gets a COMPACT line — pinned headline set + summary scalars, always
    # well under the window — and the full per-query detail (extended
    # timings, per-query load/spread) goes to BENCH_FULL_local.json.
    compact = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": runs_per_query,
        "agg": "min",
        "extended_total": round(sum(extended.values()), 3),
        "extended_count": len(extended),
        # Machine-load context: r1 showed readings inflate 2-3x under
        # concurrent load; compare rounds with similar load.
        "load_1m_start": round(load_start[0], 2),
        "load_1m_end": round(os.getloadavg()[0], 2),
        "quiet": quiet,
    }
    full = dict(compact)
    full.update(
        {
            # headline queries violating the quiet thresholds
            # (load_1m < 4 at best run, spread <= 1.2)
            "not_quiet_queries": not_quiet,
            # load_1m observed around each query's BEST run, and the
            # max/min spread across its runs: spread near 1.0 means a
            # trustworthy reading, spread >2 means the host was noisy
            # even after retries.
            "query_load_1m": query_load,
            "query_spread": query_spread,
            # post-r1 queries, outside the pinned comparability set
            "extended_queries": extended,
        }
    )
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL_local.json"),
    )
    if os.environ.get("SPARK_GRAFT_REQUIRE_QUIET", "") == "1" and not quiet:
        print(
            json.dumps(
                {
                    "error": "quiet run required but host was noisy",
                    "not_quiet_queries": not_quiet,
                    "load_1m_start": compact["load_1m_start"],
                }
            ),
            file=sys.stderr,
        )
        spark.stop()
        sys.exit(3)
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    line = json.dumps(compact)
    # Hard guard: never emit a final line the driver's tail window can clip.
    if len(line) > 1900:
        compact["queries"] = {"total_only": compact["value"]}
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
