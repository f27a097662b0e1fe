"""Round-7 regression tests for the five ADVICE r6 edge cases: empty-doc
char entropy, sub-n-gram language-ID sentinels, k-center overshoot,
int64-grid fuzzy decontamination, and UNK single-char tokenizer coverage."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_char_entropy_empty_doc_yields_no_row(spark):
    """Spark's sequence(1, 0) defaults to step -1 and would emit phantom
    positions [1, 0]; the guard must drop empty docs entirely (matching
    DuckDB's empty range(1, len+1))."""
    from name_match_ml_spark.functions.text import char_entropy_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "aab")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in char_entropy_scores(docs).collect()}
    assert set(got) == {2}
    assert got[2]["n_chars"] == 3 and got[2]["n_distinct"] == 2


def test_charngram_langid_short_doc_gets_sentinel(spark):
    """Docs shorter than n chars have no trigram profile: they must appear
    with (pred_lang='', dist=-1, correct=false), not vanish."""
    from name_match_ml_spark.functions.text import charngram_langid

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "ab", "en"),  # < 3 chars: no trigrams
            (3, "", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r for r in charngram_langid(docs).collect()}
    assert set(got) == {1, 2, 3}
    for short_id in (2, 3):
        r = got[short_id]
        assert r["pred_lang"] == "" and r["dist"] == -1 and r["correct"] is False
    assert got[1]["pred_lang"] == "en" and got[1]["correct"] is True


def test_kcenter_select_k_exceeding_corpus_stops_early(spark):
    """k > |corpus| returns every vector as a center (no NoneType crash)."""
    from name_match_ml_spark.operators.simsearch import kcenter_select

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_select(corpus, k=10).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2, 3]
    assert sorted(r["pick"] for r in out) == [1, 2, 3]


@pytest.mark.slow
def test_fuzzy_decontaminate_grid_is_exact_int64(spark):
    """best_jaccard_grid = (|I| * 1e6) div |U| — exact integers, and the
    threshold test is the exact rational comparison."""
    from name_match_ml_spark.operators.cleaning import fuzzy_decontaminate

    # bench doc: shingles {a b, b c}; corpus doc 1: {a b, b c, c d}
    # intersection 2, union 3 -> jaccard 2/3 -> grid 666666
    bench = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "a b c d"), (2, "x y z w")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()}
    assert got[1]["contaminated"] and got[1]["best_jaccard_grid"] == 666_666
    assert not got[2]["contaminated"] and got[2]["best_jaccard_grid"] == 0
    # boundary: intersection/union exactly == threshold passes (>=)
    got_eq = {
        r["doc_id"]: r
        for r in fuzzy_decontaminate(
            corpus, bench, threshold=2.0 / 3.0
        ).collect()
    }
    assert got_eq[1]["contaminated"]


def test_unigram_tokenize_unk_char_word_not_dropped(spark):
    """A corpus word containing a character absent from the capped training
    lexicon still segments (via pinned-cost UNK single chars) instead of
    silently vanishing from the output."""
    from name_match_ml_spark.operators.unigram_lm import unigram_tokenize_docs

    # max_words=2 keeps only the two highest-frequency words in the
    # training lexicon; 'qz' appears once so its chars never enter the
    # trained vocabulary.
    docs = spark.createDataFrame(
        [
            (1, "aa bb aa bb aa bb"),
            (2, "qz"),
        ],
        "doc_id long, text string",
    )
    out = unigram_tokenize_docs(docs, max_words=2, vocab_size=4).collect()
    doc2 = sorted(
        ((r["wpos"], r["pos"], r["sym"]) for r in out if r["doc_id"] == 2)
    )
    # 'q' and 'z' are UNK singles: the word segments as q|z at positions 0,1
    assert doc2 == [(0, 0, "q"), (0, 1, "z")]
    # trained words unaffected
    assert {r["sym"] for r in out if r["doc_id"] == 1} == {"aa", "bb"}
