"""IVFADC composition tests (operators/pq.py::ivfpq_topk): recall gate
vs the same-grid brute force, explicit-queries equivalence, the
query-side join-strategy contract, and parameter validation — the
grid_ivf_topk / pq_topk test bar applied to their composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from name_match_ml_spark.operators.pq import (
    _global_codes,
    _sq_dist,
    ivfpq_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _exact_pairs(spark, sf_dir, k=5):
    """Brute-force top-k under the SAME global-scale grid metric."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qz = _global_codes(emb, id_col="vec_id", vec_col="embedding").localCheckpoint()
    qs = qz.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    bf = (
        qz.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _sq_dist(F.col("q"), F.col("qq")).alias("d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    return {
        (r["query_id"], r["neighbor_id"])
        for r in bf.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .collect()
    }


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.slow
def test_ivfpq_recall_vs_same_grid_brute_force(spark, sf_dir):
    """Both pruning axes together (4-of-8-cell probe + 16-code residual
    PQ + rerank 100) must hold recall@5 >= 0.6 against brute force
    under the same grid metric (measured 0.73 at sf0.01; deterministic,
    the margin guards param drift, not host noise).  Returned rows'
    dist_grid must equal the exact grid distance — refine is exact."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = _exact_pairs(spark, sf_dir)
    rows = ivfpq_topk(emb).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"IVFADC recall {recall:.3f} at {sf_dir}"
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1)), q
        dists = [r.dist_grid for r in rs]
        assert dists == sorted(dists), q
        assert all(r.neighbor_id != q for r in rs)


@pytest.mark.slow
def test_ivfpq_explicit_queries_match_convention(spark):
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    conv = ivfpq_topk(emb).collect()
    qdf = emb.filter(F.col("vec_id") % 10 == 0)
    expl = ivfpq_topk(emb, qdf).collect()
    assert sorted(map(tuple, expl)) == sorted(map(tuple, conv))
    # forced-shuffle regime answers identically (saturation rule: both
    # query-scaled joins flip together)
    shuf = ivfpq_topk(emb, qdf, probe_row_budget=0).collect()
    assert sorted(map(tuple, shuf)) == sorted(map(tuple, conv))


def test_ivfpq_small_queries_broadcast(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(ivfpq_topk(emb))
    assert "BroadcastHashJoin" in plan, "small dtab side must broadcast"
    assert "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_big_queries_shuffle(spark):
    """budget=0 saturates the LIMIT-bounded query count: BOTH the ADC
    distance-table join and the rerank join must go shuffle-hash (the
    pq_topk saturation rule, ADVICE r8)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(ivfpq_topk(emb, probe_row_budget=0))
    assert plan.count("ShuffledHashJoin") >= 2, plan[:2000]
    assert "CartesianProduct" not in plan


def test_ivfpq_param_validation(spark):
    emb = spark.createDataFrame(
        [(0, [1.0] * 8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        ivfpq_topk(emb, n_probe=0)
    with pytest.raises(ValueError):
        ivfpq_topk(emb, k=6, rerank=5)
