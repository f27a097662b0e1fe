"""Incremental connected-components maintenance tests
(operators/graph.py::incremental_cluster_update): must equal a full
dedup_clusters recompute AND be provably incremental — untouched
components' cached labels flow through verbatim (poisoned-cache proof,
the test_lsh_index.py / test_cdc.py discipline), and the affected-set
logic handles splits (deletion), merges (new bridging edge), and new
clusters."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from name_match_ml_spark.operators.graph import (
    connected_components,
    incremental_cluster_update,
    near_dup_graph,
)

# Two near-dup clusters far apart in id space plus a loner:
#   {1, 2, 3} chained by high-Jaccard texts, {100, 101}, loner 500.
DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "alpha beta gamma delta epsilon eta"),
    (3, "alpha beta gamma delta epsilon theta"),
    (100, "one two three four five six seven"),
    (101, "one two three four five six eight"),
    (500, "completely unrelated text lives here alone"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _full(spark, rows):
    """Ground truth: full dedup_clusters recompute on the snapshot."""
    d = _docs(spark, rows)
    pairs = near_dup_graph(d, materialize=False)
    comp = connected_components(pairs)
    w = Window.partitionBy("cluster_id")
    return sorted(
        map(
            tuple,
            comp.select(
                F.col("id").alias("doc_id"),
                "cluster_id",
                F.count(F.lit(1)).over(w).alias("cluster_size"),
                (F.col("id") == F.col("cluster_id")).alias("is_keeper"),
            ).collect(),
        )
    )


def _cached(spark, rows):
    d = _docs(spark, rows)
    pairs = near_dup_graph(d, materialize=False).localCheckpoint()
    return pairs, connected_components(pairs).localCheckpoint()


@pytest.mark.slow
def test_merge_split_and_new_cluster_equal_full_recompute(spark):
    """One batch that splits {1,2,3} (delete 2 — its variants are only
    ~0.5-similar pairwise... still connected via shared prefix), merges
    a new doc into {100,101}, and adds a brand-new pair — output must
    be row-identical to the full recompute on the unified corpus."""
    base = _docs(spark, DOCS)
    pairs, cached = _cached(spark, DOCS)
    delta_rows = [
        (102, "one two three four five six nine"),  # joins {100,101}
        (700, "brand new duplicate pair text body"),
        (701, "brand new duplicate pair text core"),
    ]
    delta = _docs(spark, delta_rows)
    removed = spark.createDataFrame([(2,)], "doc_id long")
    got = incremental_cluster_update(
        base, delta, cached, base_pairs=pairs, removed=removed
    )
    unified = [r for r in DOCS if r[0] != 2] + delta_rows
    assert sorted(map(tuple, got.collect())) == _full(spark, unified)


def test_untouched_cluster_poisoned_cache_flows_verbatim(spark):
    """A deliberately WRONG cached label for the untouched {100,101}
    component must appear in the output verbatim — proof the
    incremental path passes untouched components through instead of
    silently rerunning components over everything."""
    base = _docs(spark, DOCS)
    pairs, cached = _cached(spark, DOCS)
    poisoned = cached.withColumn(
        "cluster_id",
        F.when(F.col("id").isin(100, 101), F.lit(999_999)).otherwise(
            F.col("cluster_id")
        ),
    )
    # delta touches only the {1,2,3} component
    delta = _docs(spark, [(4, "alpha beta gamma delta epsilon iota")])
    got = incremental_cluster_update(base, delta, poisoned, base_pairs=pairs)
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[100].cluster_id == 999_999
    assert rows[101].cluster_id == 999_999
    # and the touched component is still recomputed correctly
    assert rows[4].cluster_id == 1


def test_deletion_splits_component(spark):
    """Removing the bridge doc of a chain must split the component —
    the case cached labels alone cannot resolve (needs the affected
    subgraph's surviving edges)."""
    chain = [
        (10, "w1 w2 w3 w4 w5 w6 w7 w8"),
        (11, "w1 w2 w3 w4 w5 w6 w7 w9"),  # bridge: similar to both ends
        (12, "w1 w2 w3 w4 w5 w6 w8 w9"),
    ]
    base = _docs(spark, chain)
    pairs, cached = _cached(spark, chain)
    removed = spark.createDataFrame([(11,)], "doc_id long")
    got = incremental_cluster_update(
        base, _docs(spark, []), cached, base_pairs=pairs, removed=removed
    )
    unified = [r for r in chain if r[0] != 11]
    assert sorted(map(tuple, got.collect())) == _full(spark, unified)


def test_empty_delta_is_identity(spark):
    base = _docs(spark, DOCS)
    pairs, cached = _cached(spark, DOCS)
    got = incremental_cluster_update(base, _docs(spark, []), cached, base_pairs=pairs)
    assert sorted(map(tuple, got.collect())) == _full(spark, DOCS)
