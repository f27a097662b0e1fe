"""Connected components over a pair stream [EXT] — dedup cluster
resolution (SURVEY.md §2.10).

Every near-dup operator in :mod:`.dedup` emits *pairs*; a training-data
pipeline needs *clusters* (pick one keeper per group of mutual
near-duplicates, drop the rest).  Pairs → clusters is connected
components on the similarity graph, computed here with iterative
min-label propagation on DataFrames:

* every node starts labeled with its own id;
* each round, every node takes the min of its own label and its
  neighbors' labels (one equi-join + one min-aggregate — both shuffles
  carry only longs);
* a round with zero changes is the fixpoint: every node holds the
  smallest id reachable in its component.

Rounds needed = graph diameter.  Near-dup clusters are dense and shallow
(duplicates of a document are also near-duplicates of each other), so
convergence is 2-3 rounds in practice.  For adversarial long-chain
graphs at 100 TB the known fix is alternating large-star/small-star
(O(log n) rounds); the round structure below is the same join+agg shape,
so that variant drops in without changing callers.  Each round ends in
``localCheckpoint`` — iterative lineage MUST be cut (a) so round N+1's
plan doesn't re-execute rounds 1..N, and (b) so the convergence-check
action doesn't recompute the round.

Deterministic: the fixpoint is unique, so the result is
oracle-checkable (DuckDB recursive CTE over the same pair stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    pairs: DataFrame,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an undirected pair stream into ``(id, cluster_id)`` rows,
    ``cluster_id`` = the smallest node id in the component.  Nodes are
    exactly the ids appearing in ``pairs`` (callers left-join the full
    corpus back if singletons need rows).  Raises if ``max_iter`` rounds
    don't converge — a diameter that large means the input is not a
    near-dup graph and the large-star/small-star variant is needed."""
    sym = pairs.select(F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b"))).localCheckpoint()
    labels = sym.select(F.col("a").alias("id")).distinct().select(
        "id", F.col("id").alias("cluster_id")
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            F.col("a").alias("id"), "cluster_id"
        )
        new_labels = (
            labels.union(nbr).groupBy("id").agg(F.min("cluster_id").alias("cluster_id"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
