"""Incremental LSH index tests (operators/lsh_index.py): the CDC path
must equal a full rebuild AND be provably incremental — cached rows for
unchanged docs are trusted verbatim (poisoned-cache proof, the
incremental_near_dup discipline from tests/test_cdc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.lsh_index import (
    incremental_band_index,
    minhash_band_index,
)

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "alpha beta gamma delta zeta"),
    (3, "totally different words here now"),
    (4, "another unrelated document body text"),
    (5, "alpha beta gamma delta epsilon"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _rows(df):
    return sorted((r.doc_id, r.band, r.band_sig) for r in df.collect())


def test_incremental_equals_full_rebuild(spark):
    base = _docs(spark, DOCS)
    delta = _docs(spark, [(2, "updated text for doc two"), (9, "a brand new doc")])
    dead = spark.createDataFrame([(4,)], "doc_id long")
    cached = minhash_band_index(base)
    got = incremental_band_index(cached, delta, dead)
    unified = _docs(
        spark,
        [(1, DOCS[0][1]), (3, DOCS[2][1]), (5, DOCS[4][1]),
         (2, "updated text for doc two"), (9, "a brand new doc")],
    )
    assert _rows(got) == _rows(minhash_band_index(unified))


def test_unchanged_docs_never_recomputed_poisoned_cache(spark):
    """A deliberately WRONG cached signature for an unchanged doc must
    flow into the output verbatim — proof the incremental path trusts
    the cache instead of silently re-shingling the corpus."""
    base = _docs(spark, DOCS)
    cached = minhash_band_index(base).withColumn(
        "band_sig",
        F.when(F.col("doc_id") == 3, F.lit(-12345)).otherwise(F.col("band_sig")),
    )
    delta = _docs(spark, [(9, "a brand new doc")])
    got = incremental_band_index(cached, delta)
    poisoned = [r for r in got.collect() if r.doc_id == 3]
    assert poisoned and all(r.band_sig == -12345 for r in poisoned)


def test_delta_docs_always_signed_fresh(spark):
    """Updated docs' stale cached rows retire; their new signatures come
    from the delta text even when the cache carries poison for them."""
    base = _docs(spark, DOCS)
    cached = minhash_band_index(base).withColumn(
        "band_sig",
        F.when(F.col("doc_id") == 2, F.lit(-777)).otherwise(F.col("band_sig")),
    )
    delta = _docs(spark, [(2, "updated text for doc two")])
    got = incremental_band_index(cached, delta)
    fresh = minhash_band_index(delta)
    assert sorted(
        (r.band, r.band_sig) for r in got.filter(F.col("doc_id") == 2).collect()
    ) == sorted((r.band, r.band_sig) for r in fresh.collect())


def test_dead_ids_drop(spark):
    base = _docs(spark, DOCS)
    cached = minhash_band_index(base)
    dead = spark.createDataFrame([(1,), (5,)], "doc_id long")
    got = incremental_band_index(cached, _docs(spark, []), dead)
    assert got.filter(F.col("doc_id").isin(1, 5)).count() == 0
    assert got.filter(F.col("doc_id") == 3).count() > 0


def test_duplicate_delta_ids_raise(spark):
    """Two versions of one doc in a CDC batch is an upstream compaction
    bug — raise with the offending ids instead of emitting conflicting
    index rows (ADVICE r9)."""
    base = _docs(spark, DOCS)
    cached = minhash_band_index(base)
    delta = _docs(spark, [(2, "version one"), (2, "version two")])
    with pytest.raises(ValueError, match="multiple versions"):
        incremental_band_index(cached, delta)


def test_delete_wins_over_insert_in_one_batch(spark):
    """doc_id in BOTH delta_docs and dead_ids → deleted (the batch's
    final state), matching a full rebuild on a corpus without the doc."""
    base = _docs(spark, DOCS)
    cached = minhash_band_index(base)
    delta = _docs(spark, [(2, "updated then deleted"), (9, "a brand new doc")])
    dead = spark.createDataFrame([(2,)], "doc_id long")
    got = incremental_band_index(cached, delta, dead)
    assert got.filter(F.col("doc_id") == 2).count() == 0
    unified = _docs(
        spark,
        [(1, DOCS[0][1]), (3, DOCS[2][1]), (4, DOCS[3][1]), (5, DOCS[4][1]),
         (9, "a brand new doc")],
    )
    assert _rows(got) == _rows(minhash_band_index(unified))


def test_num_perm_divisible_by_bands(spark):
    with pytest.raises(ValueError, match="divisible"):
        minhash_band_index(_docs(spark, DOCS), num_perm=10, bands=4)


def test_empty_docs_produce_no_rows(spark):
    d = _docs(spark, [(1, "   "), (2, "real words here")])
    got = minhash_band_index(d)
    assert got.filter(F.col("doc_id") == 1).count() == 0
    assert got.filter(F.col("doc_id") == 2).count() == 4  # one row per band
