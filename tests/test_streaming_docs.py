"""Incremental document ingestion: stream ≡ batch for the quality gate +
content dedup, and duplicates arriving in LATER micro-batches are still
dropped (the stateful property a per-batch filter wouldn't have)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.sources.parquet import table
from name_match_ml_spark.streaming.docs import clean_documents, stream_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("docs_stream")
    shutil.copy(f"{SF}/documents.parquet", d / "documents.parquet")
    return str(d)


def _run(df, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName("docs_out")
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = df.sparkSession
    rows = spark.table("docs_out").collect()
    q.stop()
    spark.catalog.dropTempView("docs_out")
    return rows

@pytest.mark.slow
def test_stream_equals_batch(spark, docs_dir):
    got = _run(clean_documents(stream_documents(spark, docs_dir)))
    want = clean_documents(table(spark, SF, "documents")).collect()
    # exact-dedup keeps ONE representative per content hash; which doc_id
    # survives is arrival-order-dependent, so compare at content level
    assert {r.content_hash for r in got} == {r.content_hash for r in want}
    assert len(got) == len(want) > 0
    assert len(got) <= table(spark, SF, "documents").count()


def test_quality_gate_and_dedup_semantics(spark):
    rows = [
        (0, "one two three four five six", "en", "s", 27),
        (1, "one two three four five six", "en", "s", 27),  # exact dup of 0
        (2, "too short", "en", "s", 9),  # < min_words
        (3, "spam spam spam spam spam spam spam", "en", "s", 34),  # repetitive
        (4, "a perfectly fine unique document here", "en", "s", 37),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    out = clean_documents(docs, min_words=5, max_rep_ratio=0.2)
    kept = {r.content_hash: r for r in out.collect()}
    texts = {r[1] for r in rows}
    assert len(kept) == 2  # doc0/1 collapse to one; 2 and 3 filtered; 4 kept
    assert all(r.n_words >= 5 for r in kept.values())
    assert len(texts) == 4  # sanity: the dup really was a dup


def test_duplicates_across_microbatches_dropped(spark, tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    base = table(spark, SF, "documents").limit(50)
    # single FILES (not Spark output dirs): the file stream source treats
    # directory entries as the stream's files
    base.toPandas().to_parquet(str(d / "batch1.parquet"))

    out_dir = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    stream = clean_documents(stream_documents(spark, str(d)))
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    first = spark.read.parquet(str(out_dir)).count()

    # re-deliver the same documents as a NEW file (a new micro-batch)
    base.withColumn("doc_id", F.col("doc_id") + 10_000).toPandas().to_parquet(
        str(d / "batch2.parquet")
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    second = spark.read.parquet(str(out_dir)).count()
    # every re-delivered text is a known content hash: state carried
    # across micro-batches drops them all
    assert second == first > 0
