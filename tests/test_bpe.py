"""BPE merge training (operators/bpe.py): the classic Sennrich
walkthrough, run-parity on self-pairs, exhaustion, and the
deterministic lexicon cap.  DuckDB hash-parity of the 8-round unrolled
oracle is covered by tools/verify_queries.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from name_match_ml_spark.operators.bpe import bpe_lexicon, bpe_train


def _docs(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id LONG, text STRING")


def _segments(segs):
    rows = segs.collect()
    out: dict[str, list[str]] = {}
    for r in sorted(rows, key=lambda r: (r.wid, r.pos)):
        out.setdefault(r.wid, []).append(r.sym)
    return out


@pytest.mark.slow
def test_sennrich_walkthrough(spark):
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges, segs = bpe_train(_docs(spark, corpus), n_merges=4)
    got = [(r.round, r.sym_a, r.sym_b, r.pair_count)
           for r in merges.orderBy("round").collect()]
    # es(9) -> est(9) -> lo(7) -> low(7): the canonical order with
    # lexicographic tie-breaks
    assert got == [(0, "e", "s", 9), (1, "es", "t", 9),
                   (2, "l", "o", 7), (3, "lo", "w", 7)]
    seg = _segments(segs)
    assert seg["low"] == ["low"]
    assert seg["newest"] == ["n", "e", "w", "est"]
    assert seg["widest"] == ["w", "i", "d", "est"]


def test_self_pair_run_parity(spark):
    # "aaaa"x3 + "aaa"x2: pair (a,a) counts 3*3 + 2*2 = 13; merging
    # left-to-right gives aaaa -> (aa)(aa), aaa -> (aa)a
    merges, segs = bpe_train(_docs(spark, "aaaa aaaa aaaa aaa aaa"), n_merges=1)
    m = merges.collect()[0]
    assert (m.sym_a, m.sym_b, m.pair_count) == ("a", "a", 13)
    seg = _segments(segs)
    assert seg["aaaa"] == ["aa", "aa"]
    assert seg["aaa"] == ["aa", "a"]


def test_exhaustion_stops_merge_table(spark):
    # single 2-char word: round 0 merges it; no pairs remain
    merges, segs = bpe_train(_docs(spark, "ab ab"), n_merges=4)
    got = merges.collect()
    assert len(got) == 1 and (got[0].sym_a, got[0].sym_b) == ("a", "b")


def test_lexicon_cap_deterministic(spark):
    corpus = "cc cc cc bb bb aa"
    lex2 = bpe_lexicon(_docs(spark, corpus), max_words=2)
    words = {r.wid for r in lex2.select("wid").distinct().collect()}
    # freq desc then wid asc: cc(3), bb(2) — aa cut
    assert words == {"cc", "bb"}


def test_merge_table_is_reusable_order(spark):
    """Merge counts are non-increasing only within equal-pair regimes is
    NOT guaranteed (later merges can create frequent pairs), but every
    round's winner must have count >= 1 and rounds must be contiguous."""
    corpus = " ".join(["abcd"] * 4 + ["abce"] * 3)
    merges, _ = bpe_train(_docs(spark, corpus), n_merges=3)
    rows = merges.orderBy("round").collect()
    assert [r.round for r in rows] == [0, 1, 2]
    assert all(r.pair_count >= 1 for r in rows)


def test_bpe_tokenize_docs_reassembles_and_matches_training(spark):
    """Apply path: the corpus token stream rebuilds every document, and
    for words inside the training lexicon the applied segmentation is
    IDENTICAL to the training segmentation."""
    from pyspark.sql import functions as F

    from name_match_ml_spark.operators.bpe import bpe_tokenize_docs, bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    tok = bpe_tokenize_docs(docs, n_merges=8, max_words=1000)
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
                " ", F.array_sort(F.collect_list(F.struct("wpos", "w"))).getField("w")
            ).alias("re")
        )
    )
    orig = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("want"),
    )
    assert rebuilt.join(orig, "doc_id").filter("re <> want").count() == 0

    _m, segs = bpe_train(docs, n_merges=8, max_words=1000)
    train_seg = {
        (r["wid"], r["pos"]): r["sym"] for r in segs.collect()
    }
    dw_words = {r["wid"] for r in segs.select("wid").distinct().collect()}
    # applied per-word segmentation, read off any single occurrence
    word_of = docs.select(
        F.posexplode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda w: w != "")
        ).alias("wpos", "wid"),
        "doc_id",
    )
    one_occ = word_of.groupBy("wid").agg(
        F.min(F.struct("doc_id", "wpos")).alias("o")
    )
    applied_rows = (
        tok.join(
            one_occ.select(
                "wid", F.col("o.doc_id").alias("doc_id"), F.col("o.wpos").alias("wpos")
            ),
            ["doc_id", "wpos"],
        )
        .select("wid", "pos", "sym")
        .collect()
    )
    applied = {(r["wid"], r["pos"]): r["sym"] for r in applied_rows if r["wid"] in dw_words}
    for key, sym in applied.items():
        assert train_seg.get(key) == sym, key
