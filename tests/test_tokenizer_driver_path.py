"""Optimization round 10: BPE/WordPiece training moved to driver-side
model state (bounded lexicon collect + exact-Python merge loop) and the
corpus replay collapsed to one chained-fold projection.  These tests pin
bit-equality of the new paths against the original distributed rounds
(kept in-module as the ``max_words=None`` path / ``_apply_winner``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from name_match_ml_spark.operators.bpe import (
    _apply_winner,
    _merge_round,
    bpe_lexicon,
    bpe_train,
    replay_merges_over_docs,
)
from name_match_ml_spark.operators.wordpiece import _wp_round, wordpiece_train

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, text):
    return spark.createDataFrame([(0, text)], "doc_id LONG, text STRING")


def _distributed_train(docs, round_fn, n_merges, max_words):
    """The pre-optimization bpe_train/wordpiece_train body, verbatim."""
    seqs = bpe_lexicon(docs, max_words=max_words).localCheckpoint()
    merge_rows = []
    for r in range(n_merges):
        seqs, winner = round_fn(seqs)
        seqs = seqs.localCheckpoint()
        merge_rows.append(winner.select(F.lit(r).alias("round"), "*"))
    merges = merge_rows[0]
    for m in merge_rows[1:]:
        merges = merges.unionByName(m)
    return merges, seqs


def _rows(df, *order):
    return sorted(tuple(r) for r in df.collect())


def test_bpe_driver_path_equals_distributed_rounds(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got_m, got_s = bpe_train(docs, n_merges=8, max_words=1000)
    want_m, want_s = _distributed_train(docs, _merge_round, 8, 1000)
    assert _rows(got_m) == _rows(want_m)
    assert _rows(got_s) == _rows(want_s)
    assert [f.name for f in got_m.schema.fields] == [
        f.name for f in want_m.schema.fields
    ]
    assert [f.dataType for f in got_s.schema.fields] == [
        f.dataType for f in want_s.schema.fields
    ]


def test_wordpiece_driver_path_equals_distributed_rounds(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got_m, got_s = wordpiece_train(docs, n_merges=8, max_words=1000)
    want_m, want_s = _distributed_train(docs, _wp_round, 8, 1000)
    # score_grid included: pins the libm-ln grid against the JVM-ln grid
    assert _rows(got_m) == _rows(want_m)
    assert _rows(got_s) == _rows(want_s)


def test_fold_replay_equals_windowed_replay(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    merges, _ = bpe_train(docs, n_merges=8, max_words=1000)
    got = replay_merges_over_docs(docs, merges, n_rounds=8)

    # pre-optimization replay body, verbatim (windowed _apply_winner)
    learned = {r["round"]: (r["sym_a"], r["sym_b"]) for r in merges.collect()}
    dw = docs.select(
        F.col("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda w: w != "")
        ).alias("wpos", "wid"),
    )
    allw = dw.select("wid").distinct().select(
        "wid", F.lit(1).cast("long").alias("freq")
    )
    from name_match_ml_spark.operators.bpe import _chars

    seqs = allw.select(
        "wid", "freq", F.posexplode(_chars(F.col("wid"))).alias("pos", "sym")
    ).localCheckpoint()
    for r in range(8):
        if r not in learned:
            seqs = seqs.limit(0)
            break
        winner = spark.createDataFrame([learned[r]], "sym_a string, sym_b string")
        seqs = _apply_winner(seqs, winner).localCheckpoint()
    want = dw.join(seqs.select("wid", "pos", "sym"), "wid").select(
        "doc_id", F.col("wpos").cast("int").alias("wpos"), "pos", "sym"
    )
    assert _rows(got) == _rows(want)


def test_driver_path_sennrich_walkthrough(spark):
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    merges, segs = bpe_train(_docs(spark, corpus), n_merges=4, max_words=1000)
    got = [
        (r.round, r.sym_a, r.sym_b, r.pair_count)
        for r in merges.orderBy("round").collect()
    ]
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "l", "o", 7),
        (3, "lo", "w", 7),
    ]


def test_driver_path_self_pair_run_parity(spark):
    merges, segs = bpe_train(
        _docs(spark, "aaaa aaaa aaaa aaa aaa"), n_merges=1, max_words=1000
    )
    m = merges.collect()[0]
    assert (m.sym_a, m.sym_b, m.pair_count) == ("a", "a", 13)
    seg: dict[str, list[str]] = {}
    for r in sorted(segs.collect(), key=lambda r: (r.wid, r.pos)):
        seg.setdefault(r.wid, []).append(r.sym)
    assert seg["aaaa"] == ["aa", "aa"]
    assert seg["aaa"] == ["aa", "a"]


def test_driver_path_exhaustion(spark):
    merges, segs = bpe_train(_docs(spark, "ab ab"), n_merges=4, max_words=1000)
    got = merges.collect()
    assert len(got) == 1 and (got[0].sym_a, got[0].sym_b) == ("a", "b")
    assert segs.count() == 0
    # application mirrors exhaustion: the token stream is empty
    tok = replay_merges_over_docs(_docs(spark, "ab ab"), merges, n_rounds=4)
    assert tok.count() == 0
