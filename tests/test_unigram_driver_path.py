"""Optimization round 10: unigram-LM training moved to driver-side
model state (bounded lexicon collect + exact-Python seed/EM loop),
mirroring the BPE/WordPiece move (test_tokenizer_driver_path.py).
These tests pin bit-equality of the new path against the original
distributed EM rounds (kept verbatim below), on the real sf0.001
corpus — vocabulary, cost map, segments and the corpus apply path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.unigram_lm import (
    _INF,
    _assert_word_len,
    _collect_costs,
    _costed,
    _cost_map_lit,
    _bwd_expr,
    _fwd_expr,
    _lexicon,
    _occurrences,
    _segment,
    unigram_lm_train,
    unigram_tokenize_docs,
)

SF_DIR = "/root/testdata/sf0.001"


def _distributed_train_costs(
    docs, *, text_col="text", max_words=1000, vocab_size=64,
    max_token_len=4, em_rounds=2,
):
    """The pre-optimization _train_costs body, verbatim."""
    lex = _lexicon(docs, text_col, max_words).localCheckpoint()
    _assert_word_len(lex, "unigram_lm_train")

    occ = _occurrences(lex, max_token_len)
    cand = occ.groupBy("tok").agg(F.sum("freq").alias("cnt"))
    chars = cand.filter(F.length("tok") == 1)
    multi = (
        cand.filter(F.length("tok") > 1)
        .orderBy(F.desc("cnt"), "tok")
        .limit(vocab_size)
    )
    vocab = chars.unionByName(multi).localCheckpoint()

    for _ in range(em_rounds):
        cost_map = _collect_costs(_costed(vocab), "unigram_lm_train")
        m = _cost_map_lit(cost_map)
        lat = lex.withColumn("bwd", _bwd_expr(m, max_token_len)).withColumn(
            "fwd", _fwd_expr(m, max_token_len)
        )
        grid = lat.select(
            "wid", "freq", "n", "fwd", "bwd",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n") - 1)).alias("i"),
        ).select(
            "wid", "freq", "n", "fwd", "bwd", "i",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(
                        F.lit(max_token_len).cast("long"), F.col("n") - F.col("i")
                    ),
                )
            ).alias("len"),
        )
        onp = grid.select(
            "wid", "freq",
            F.expr("substr(wid, CAST(i + 1 AS INT), CAST(len AS INT))").alias("tok"),
            (
                F.element_at("fwd", (F.col("i") + 1).cast("int"))
                + F.coalesce(
                    F.element_at(
                        m,
                        F.expr("substr(wid, CAST(i + 1 AS INT), CAST(len AS INT))"),
                    ),
                    F.lit(_INF).cast("long"),
                )
                + F.element_at("bwd", (F.col("i") + F.col("len") + 1).cast("int"))
            ).alias("_path"),
            F.element_at("bwd", F.lit(1)).alias("_total"),
        ).filter(F.col("_path") == F.col("_total"))
        ncnt = onp.groupBy("tok").agg(F.sum("freq").alias("ncnt"))
        vocab = (
            vocab.join(ncnt, "tok", "left")
            .filter((F.length("tok") == 1) | (F.coalesce("ncnt", F.lit(0)) > 0))
            .select("tok", (F.coalesce("ncnt", F.lit(0)) + F.lit(1)).alias("cnt"))
            .localCheckpoint()
        )

    final_cost = _costed(vocab).localCheckpoint()
    final_map = _collect_costs(final_cost, "unigram_lm_train")
    return lex, final_cost, final_map


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_driver_path_equals_distributed_em(spark, corpus):
    got_v, got_s = unigram_lm_train(
        corpus, max_words=1000, vocab_size=64, em_rounds=2
    )
    lex, final_cost, final_map = _distributed_train_costs(corpus)
    want_v = final_cost.select(
        F.col("tok").alias("token"),
        F.col("cnt").alias("freq"),
        F.col("cost").alias("cost_grid"),
    )
    assert _rows(got_v) == _rows(want_v)
    assert [f.name for f in got_v.schema.fields] == [
        f.name for f in want_v.schema.fields
    ]
    assert [f.dataType for f in got_v.schema.fields] == [
        f.dataType for f in want_v.schema.fields
    ]
    want_s = _segment(lex, final_map, 4)
    assert _rows(got_s) == _rows(want_s)
    assert [f.dataType for f in got_s.schema.fields] == [
        f.dataType for f in want_s.schema.fields
    ]


def test_driver_path_tokenize_docs_unchanged(spark, corpus):
    docs = corpus.limit(40)
    got = unigram_tokenize_docs(docs, max_words=1000, vocab_size=64, em_rounds=2)

    # pre-optimization apply path, verbatim, fed by the distributed costs
    _lex, _fc, final_map = _distributed_train_costs(docs)
    dw = docs.select(
        F.col("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
        ).alias("wpos", "wid"),
    )
    allw = (
        dw.select("wid")
        .distinct()
        .select(
            "wid",
            F.lit(1).cast("long").alias("freq"),
            F.length("wid").cast("long").alias("n"),
        )
        .localCheckpoint()
    )
    chars_rows = (
        allw.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("n").cast("int")),
                    lambda i: F.col("wid").substr(i, F.lit(1)),
                )
            ).alias("tok")
        )
        .distinct()
        .collect()
    )
    unk_cost = max(final_map.values()) + 1_000_000
    apply_map = dict(final_map)
    for r in chars_rows:
        apply_map.setdefault(r["tok"], unk_cost)
    segs = _segment(allw, apply_map, 4)
    want = dw.join(segs.select("wid", "pos", "sym"), "wid").select(
        "doc_id", F.col("wpos").cast("int").alias("wpos"), "pos", "sym"
    )
    assert _rows(got) == _rows(want)


def test_driver_path_word_len_guard(spark):
    docs = spark.createDataFrame(
        [(0, "a" * 17 + " ok words here")], "doc_id LONG, text STRING"
    )
    with pytest.raises(ValueError, match="DOUBLING_ROUNDS"):
        unigram_lm_train(docs, max_words=1000, vocab_size=64, em_rounds=1)
