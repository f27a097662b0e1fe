"""Unigram-LM tokenizer training (operators/unigram_lm.py): coverage
guarantee, segmentation validity, determinism, and the loud closure
bound."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.unigram_lm import (
    DOUBLING_ROUNDS,
    MAX_WORD_LEN,
    unigram_lm_train,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def trained(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab, segments = unigram_lm_train(docs, vocab_size=64, em_rounds=2)
    return vocab.collect(), segments.collect()


def test_every_char_stays_in_vocab(spark, trained):
    """Coverage guarantee: every single character of the lexicon is in
    the final vocabulary regardless of lattice pruning."""
    vocab_rows, seg_rows = trained
    toks = {r["token"] for r in vocab_rows}
    chars_in_words = {c for r in seg_rows for c in r["wid"]}
    assert chars_in_words <= toks


def test_segments_partition_each_word_exactly(trained):
    """The chosen segmentation must tile each word: sorted segments
    concatenate back to the word with contiguous positions."""
    _, seg_rows = trained
    by_word: dict[str, list] = {}
    for r in seg_rows:
        by_word.setdefault(r["wid"], []).append(r)
    assert by_word  # non-empty corpus
    for wid, rows in by_word.items():
        rows.sort(key=lambda r: r["pos"])
        at = 0
        for r in rows:
            assert r["pos"] == at
            at += len(r["sym"])
        assert at == len(wid)
        assert "".join(r["sym"] for r in rows) == wid


def test_segmentation_is_minimum_cost(trained):
    """Each word's chosen segmentation must achieve the minimum total
    cost over ALL segmentations by vocab tokens (checked by explicit
    DP per word — small lexicon)."""
    vocab_rows, seg_rows = trained
    cost = {r["token"]: r["cost_grid"] for r in vocab_rows}
    by_word: dict[str, list] = {}
    for r in seg_rows:
        by_word.setdefault(r["wid"], []).append(r)
    for wid, rows in by_word.items():
        n = len(wid)
        dp = [0] + [None] * n
        for j in range(1, n + 1):
            best = None
            for i in range(max(0, j - 8), j):
                tok = wid[i:j]
                if dp[i] is not None and tok in cost:
                    c = dp[i] + cost[tok]
                    best = c if best is None else min(best, c)
            dp[j] = best
        chosen = sum(cost[r["sym"]] for r in rows)
        assert dp[n] is not None and chosen == dp[n], wid


def test_higher_count_never_costs_more(trained):
    vocab_rows, _ = trained
    rows = sorted(vocab_rows, key=lambda r: -r["freq"])
    for a, b in zip(rows, rows[1:]):
        assert a["cost_grid"] <= b["cost_grid"]


def test_long_word_fails_loudly(spark):
    """A lexicon word longer than 2^DOUBLING_ROUNDS chars must raise
    (the fixed-depth closure would silently under-converge otherwise)."""
    assert MAX_WORD_LEN == 1 << DOUBLING_ROUNDS
    docs = spark.createDataFrame(
        [(1, "supercalifragilisticexpialidocious word")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="pinned closure depth"):
        unigram_lm_train(docs)


def test_deterministic_across_runs(spark, trained):
    vocab_rows, _ = trained
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab2, _ = unigram_lm_train(docs, vocab_size=64, em_rounds=2)
    again = {(r["token"], r["freq"], r["cost_grid"]) for r in vocab2.collect()}
    assert again == {(r["token"], r["freq"], r["cost_grid"]) for r in vocab_rows}


def test_tokenize_docs_reassembles_corpus(spark):
    """The corpus token stream must rebuild every document's word
    sequence exactly (apply path = training segmentation semantics)."""
    from name_match_ml_spark.operators.unigram_lm import unigram_tokenize_docs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    tok = unigram_tokenize_docs(docs, vocab_size=64, em_rounds=2)
    rebuilt = (
        tok.groupBy("doc_id", "wpos")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(F.struct("pos", "sym"))).getField("sym"),
            ).alias("w")
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(F.collect_list(F.struct("wpos", "w"))).getField("w"),
            ).alias("re")
        )
    )
    orig = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("want"),
    )
    bad = rebuilt.join(orig, "doc_id").filter(F.col("re") != F.col("want")).count()
    assert bad == 0
