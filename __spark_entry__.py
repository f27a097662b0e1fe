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


# Driver-sample rotation (round 8): the correctness driver samples the FIRST
# 50 entries of queries() in declaration order.  Front block this round:
# (1) pca_residual — round 7's only red cell (driver-canonicalizer crash on
# its array column), now serialized to resid_csv and needing the green
# driver row; (2) the three round-8 additions; (3) the 52 queries never
# sampled in any CORRECTNESS_r*.json (r1-r7 union).  That is 56 candidates
# for 50 slots — the 6 overflow entries (simple SQL shapes, lowest risk)
# sit at positions 50-55 for round 9.
DRIVER_ROTATION: list[str] = [
    # round-7 red cell, fixed this round — must re-confirm
    "pca_residual",
    # round-8 additions, never driver-checked
    "opq_topk", "exact_substring_spans", "incremental_near_dup",
    # oldest never-sampled r3/r4 entries
    "epoch_upsample", "span_dedup", "shared_substring",
    "shared_substring_winnow", "embedding_quantize", "quantized_cosine_topk",
    "curriculum_order", "weighted_sample", "novelty_score", "corpus_diff",
    "doc_pagerank", "doc_triangles", "bloom_decontaminate",
    "stratified_sample", "vocab_coverage", "inverted_index",
    "containment_dedup", "containment_sketch",
    # remaining never-sampled
    "ivf_cosine_topk", "multimodal_audio_segments",
    "order_count_distribution", "event_funnel", "cohort_retention",
    "event_transitions", "gapfill_interpolate", "hierarchical_rollup",
    "session_dynamic_gap", "collection_ops", "recursive_cte",
    "python_datasource", "lateral_topk_join", "variant_events",
    "unpivot_metrics", "mode_stats", "scd2_history", "dq_profile",
    "apply_cdc", "kmv_distinct", "label_centroids", "window_distribution",
    "salted_join", "cms_term_counts", "winsorize", "zorder_key",
    "grouped_udaf", "enrich_events",
    # overflow (positions 50-55): round 9's front block
    "correlated_subquery", "correlated_exists", "null_semantics",
    "time_topk", "window_range_frame", "salted_agg",
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
