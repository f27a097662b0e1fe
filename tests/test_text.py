"""Text-analysis function tests (functions/text.py, SURVEY.md §2.10 [EXT])."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_counts,
)


@pytest.fixture(scope="module")
def samples(spark):
    rows = [
        (1, "the cat and the dog went to the house and it was good for everyone"),
        (2, "le chat et le chien de la maison est un ami des enfants que nous aimons"),
        (3, "el perro y el gato de la casa es un amigo que los vecinos quieren"),
        (4, "der hund und die katze von dem haus ist ein freund und das ist gut zu sehen"),
        (5, "这是一个中文句子 用于测试语言识别"),
        (6, "qwzx bnmp vkdf ghjt"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_lang_id(samples):
    got = {r.id: r.lang for r in samples.select("id", lang_id(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "fr"
    assert got[3] == "es"
    assert got[4] == "de"
    assert got[5] == "zh"
    assert got[6] == "und"
    assert got[7] == "und"


def test_quality_score_bounds(spark, samples):
    rows = samples.select(quality_score(F.col("text")).alias("q")).collect()
    for r in rows:
        assert 0.0 <= r.q <= 1.0
    # real prose beats gibberish and empty
    by_id = {
        r.id: r.q
        for r in samples.select("id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert by_id[1] > by_id[6] > by_id[7]


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello, world! abc123 x-y")], ["id", "text"])
    counts = token_counts(F.col("text"))
    r = df.select(
        counts["ws_tokens"].alias("ws"), counts["bpe_pretokens"].alias("bpe")
    ).collect()[0]
    assert r.ws == 4
    # Hello , world ! abc 123 x - y  → 9 pre-tokens
    assert r.bpe == 9


def test_doc_fingerprint_deterministic_and_matches_python(spark):
    texts = [
        (1, "The quick   brown fox\njumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),
        (3, "something else entirely"),
    ]
    df = spark.createDataFrame(texts, ["id", "text"])
    got = {
        r.id: r.fp
        for r in df.select("id", doc_fingerprint(F.col("text"), k=8, sketch_size=4).alias("fp")).collect()
    }
    # whitespace-normalized variants agree
    assert got[1] == got[2]
    assert got[1] != got[3]

    def py_fp(text: str, k: int = 8, sketch: int = 4) -> str:
        import re

        norm = re.sub(r"\s+", " ", text).lower()
        n = max(len(norm) - (k - 1), 1)
        hashes = sorted(hashlib.md5(norm[i : i + k].encode()).hexdigest() for i in range(n))
        return "|".join(hashes[:sketch])

    for _id, text in texts:
        assert got[_id] == py_fp(text), _id


def test_regex_spans_udtf_matches_re(spark):
    """UDTF spans must equal driver-side re.finditer on the same docs."""
    import re as _re

    from name_match_ml_spark.functions.spans import register_regex_spans

    register_regex_spans(spark)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("span_docs")
    pat = r"[a-z]+a[a-z]*"  # words containing 'a'
    got = spark.sql(
        f"SELECT d.doc_id, s.start, s.end, s.match "
        f"FROM span_docs d, LATERAL regex_spans(d.text, '{pat}') s"
    ).collect()
    got_set = {(r.doc_id, r.start, r.end, r.match) for r in got}
    want = set()
    for r in docs.select("doc_id", "text").collect():
        for m in _re.finditer(pat, r.text or ""):
            want.add((r.doc_id, m.start(), m.end(), m.group()))
    assert got_set == want and want, (len(got_set), len(want))
