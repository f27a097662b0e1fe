"""Streaming quantile sketch: stream ≡ batch (the ninth stream≡batch
twin) — the foreachBatch-accumulated sketch over micro-batches must
equal the one-shot batch sketch on the full data, as literal row
equality, regardless of how the stream is batched."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.sketches import sketch_quantiles
from name_match_ml_spark.streaming.docs import DOCS_SCHEMA
from name_match_ml_spark.streaming.sketch import StreamingQuantileSketch

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def split_docs_dir(tmp_path, spark):
    """The documents table split across THREE parquet files so the
    stream sees multiple micro-batch units."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    d = tmp_path / "landing"
    d.mkdir()
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).toPandas().to_parquet(
            str(d / f"part{i}.parquet")
        )
    return str(d)


def _run_stream(spark, docs_dir, acc):
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(docs_dir)
    q = (
        stream.writeStream.foreachBatch(acc.update_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_stream_equals_batch(spark, split_docs_dir):
    acc = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id", k=64)
    _run_stream(spark, split_docs_dir, acc)
    got = sorted(map(tuple, acc.estimates(spark).collect()))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = sorted(
        map(
            tuple,
            sketch_quantiles(docs, value_col="n_chars", key_col="doc_id", k=64).collect(),
        )
    )
    assert got == want and len(got) == 5


def test_batching_invariance(spark):
    """Manually feeding the same rows as 1 batch vs 3 batches gives the
    identical state — the merge property applied through foreachBatch."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    one = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id", k=64)
    one.update_batch(docs)
    three = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id", k=64)
    for i in range(3):
        three.update_batch(docs.filter(F.col("doc_id") % 3 == i))
    assert (one.n, one.level) == (three.n, three.level)
    assert sorted(one.rows) == sorted(three.rows)


def test_state_stays_sketch_sized(spark):
    """The accumulated sample must stay ~k-bounded however much data
    streams through — the bound that makes the driver-side fold legal."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    acc = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id", k=32)
    for i in range(3):
        acc.update_batch(docs.filter(F.col("doc_id") % 3 == i))
        assert len(acc.rows) <= 2 * 32
    assert acc.n == docs.count()


def test_empty_stream_estimates_empty(spark):
    acc = StreamingQuantileSketch(value_col="n_chars", key_col="doc_id")
    assert acc.estimates(spark).count() == 0
    with pytest.raises(ValueError):
        StreamingQuantileSketch(value_col="v", key_col="k", k=1)
