"""Round-8 regression tests for the VERDICT r7 / ADVICE r7 items:
pca_residual driver-contract serialization, the grid_pca int64-envelope
dimension guard, and pack_attention_spans zero-token spans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_grid_pca_rejects_dim_over_64(spark):
    """ADVICE r7 (medium): for d > 64 the power-iteration matvec can
    exceed int64 and Spark silently wraps while DuckDB raises — the
    guard must fail fast instead of returning wrong directions."""
    from name_match_ml_spark.operators.pca import grid_pca

    wide = spark.createDataFrame(
        [(1, [0.1] * 65), (2, [0.2] * 65)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="dimension <= 64"):
        grid_pca(wide)


def test_grid_pca_accepts_dim_64(spark):
    from name_match_ml_spark.operators.pca import grid_pca

    ok = spark.createDataFrame(
        [(i, [float(i + j) for j in range(64)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    assert grid_pca(ok).count() == 6


def test_pack_attention_spans_drops_zero_token_docs(spark):
    """ADVICE r7 (low): a zero-token doc (empty/null text) would emit the
    degenerate range (start, start-1); it must be absent from the span
    output while neighbors' offsets stay exactly as if it packed with 0
    tokens (it does — the filter runs AFTER the running-sum window)."""
    from name_match_ml_spark.operators.packing import pack_attention_spans

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, None), (4, "delta epsilon")],
        "doc_id long, text string",
    )
    rows = pack_attention_spans(docs, budget=100, n_buckets=1).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert set(by_id) == {1, 4}, "zero-token docs must emit no span"
    for r in rows:
        assert r["end_tok"] >= r["start_tok"], "every span a valid inclusive range"
    # doc 1 (3 tokens) then doc 4 (2 tokens) in doc_id pack-fill order;
    # docs 2/3 contribute 0 tokens so offsets are unshifted.
    assert (by_id[1]["start_tok"], by_id[1]["end_tok"]) == (0, 2)
    assert (by_id[4]["start_tok"], by_id[4]["end_tok"]) == (3, 4)


def test_pca_residual_query_emits_csv_not_array(spark):
    """VERDICT r7 #1: the driver canonicalizer cannot sort nested values;
    the declared query must serialize resid to CSV (embedding_quantize
    convention) and the CSV must reconstruct the library's exact arrays."""
    from name_match_ml_spark.operators.pca import pca_residual
    from name_match_ml_spark.suite import q_pca_residual

    sf = "/root/testdata/sf0.001"
    out = q_pca_residual(spark, sf)
    kinds = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert kinds == {"vec_id": "bigint", "resid_csv": "string"}

    lib = {
        r["vec_id"]: r["resid"]
        for r in pca_residual(
            spark.read.parquet(f"{sf}/embeddings.parquet")
        ).collect()
    }
    got = {r["vec_id"]: r["resid_csv"] for r in out.collect()}
    assert set(got) == set(lib)
    for vid, csv in got.items():
        assert [int(x) for x in csv.split(",")] == lib[vid]
