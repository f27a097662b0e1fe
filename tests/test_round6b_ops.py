"""Round-6 continuation: DSIR importance resampling, WordPiece
tokenizer family, fuzzy decontamination."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------- DSIR


def test_dsir_rank_is_permutation_and_selection_exact(spark):
    """Ranks are the 0..N-1 permutation of the raw pool ordered by
    (score desc, doc_id asc), and exactly ceil(frac*N) docs select."""
    from name_match_ml_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_select(docs, F.col("source") == "src0", select_frac=0.25)
    rows = out.collect()
    n = len(rows)
    assert n == docs.filter(F.col("source") != "src0").count()
    assert sorted(r["dsir_rank"] for r in rows) == list(range(n))
    by_rank = sorted(rows, key=lambda r: r["dsir_rank"])
    assert by_rank == sorted(
        rows, key=lambda r: (-r["dsir_score"], r["doc_id"])
    )
    assert sum(r["selected"] for r in rows) == math.ceil(0.25 * n)


def test_dsir_excludes_target_docs(spark):
    from name_match_ml_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_select(docs, F.col("source") == "src0")
    target_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "src0").select("doc_id").collect()
    }
    assert target_ids.isdisjoint({r["doc_id"] for r in out.collect()})


def test_dsir_prefers_target_like_docs(spark):
    """Raw docs written in the target slice's vocabulary must outscore
    raw docs written in a disjoint vocabulary."""
    from name_match_ml_spark.operators.dsir import dsir_select

    target_text = "alpha beta gamma delta alpha beta"
    other_text = "omega psi chi phi omega psi"
    rows = (
        [(i, target_text, "tgt") for i in range(4)]
        + [(10 + i, target_text, "raw") for i in range(4)]
        + [(20 + i, other_text, "raw") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_select(docs, F.col("source") == "tgt", select_frac=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {10, 11, 12, 13, 20, 21, 22, 23}
    for a in (10, 11, 12, 13):
        for b in (20, 21, 22, 23):
            assert got[a]["dsir_score"] > got[b]["dsir_score"]
    assert all(got[i]["selected"] for i in (10, 11, 12, 13))
    assert not any(got[i]["selected"] for i in (20, 21, 22, 23))
