"""Distributed WordPiece merge training [EXT]: the THIRD production
tokenizer family beside BPE (:mod:`.bpe`) and the unigram LM
(:mod:`.unigram_lm`).

WordPiece (Schuster & Nakajima 2012; the BERT tokenizer) is BPE with a
LIKELIHOOD merge criterion: instead of the most frequent adjacent pair,
each round merges the pair maximizing

    score(a, b) = count(ab) / (count(a) * count(b))

— the pair whose merge most increases a unigram LM's corpus likelihood.
Everything else (lexicon formulation, left-to-right run-parity
application, exhaustion semantics, the 100 TB vocabulary-bounded
iteration property) is shared with :mod:`.bpe` and imported from it.

The score is compared on the 1e6 fixed-point log grid,
``floor((ln pc - ln ca - ln cb) * 1e6)`` int64 — ratios of counts would
overflow int64 under cross-multiplication at corpus scale, while the
log grid is bounded and engine-replayable (the repo's accepted
IEEE-double ``ln`` device, shared with :mod:`.unigram_lm` and
:mod:`.dsir`).  Ties break by ``(sym_a, sym_b)`` lexicographically.

Per round this adds ONE vocabulary-bounded aggregate (symbol counts)
and two vocabulary-bounded hash joins over the BPE round's plan — the
iterative part still never touches corpus-sized data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bpe import (
    _MAX_DRIVER_LEXICON,
    _apply_winner,
    _collect_lexicon,
    _py_merge_train,
    _segments_df,
    bpe_lexicon,
    replay_merges_over_docs,
)

__all__ = ["wordpiece_train", "wordpiece_tokenize_docs"]

_GRID = 1_000_000


def _wp_winner(pair_counts: dict, sym_counts: dict) -> tuple[str, str, int, int]:
    """Likelihood winner on the 1e6 log grid — ``floor((ln pc − ln ca −
    ln cb)·1e6)`` with libm ``log`` (the same IEEE-double ln the DuckDB
    oracle evaluates; the JVM path agreed with it bit-for-bit, pinned by
    the engine-equivalence pytest), ties ``(sym_a, sym_b)`` ascending."""
    def grid(p: tuple[str, str]) -> int:
        pc = pair_counts[p]
        return math.floor(
            (math.log(pc) - math.log(sym_counts[p[0]]) - math.log(sym_counts[p[1]]))
            * _GRID
        )

    (a, b) = min(pair_counts, key=lambda p: (-grid(p), p[0], p[1]))
    return a, b, pair_counts[(a, b)], grid((a, b))


def _wp_round(seqs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One WordPiece round: ``(merged_seqs, winner)`` with winner a
    0/1-row ``(sym_a, sym_b, pair_count, score_grid)`` DataFrame."""
    w = Window.partitionBy("wid").orderBy("pos")
    paired = seqs.select(
        "wid", "freq", "pos", "sym", F.lead("sym").over(w).alias("_nxt")
    )
    counts = (
        paired.filter(F.col("_nxt").isNotNull())
        .groupBy(F.col("sym").alias("sym_a"), F.col("_nxt").alias("sym_b"))
        .agg(F.sum("freq").alias("pair_count"))
    )
    scnt = seqs.groupBy("sym").agg(F.sum("freq").alias("_scnt"))
    scored = (
        counts.join(
            scnt.select(F.col("sym").alias("sym_a"), F.col("_scnt").alias("_ca")),
            "sym_a",
        )
        .join(
            scnt.select(F.col("sym").alias("sym_b"), F.col("_scnt").alias("_cb")),
            "sym_b",
        )
        .select(
            "sym_a",
            "sym_b",
            "pair_count",
            F.floor(
                (F.log("pair_count") - F.log("_ca") - F.log("_cb")) * _GRID
            )
            .cast("long")
            .alias("score_grid"),
        )
    )
    winner = scored.orderBy(F.desc("score_grid"), "sym_a", "sym_b").limit(1)
    return _apply_winner(seqs, winner), winner


def wordpiece_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 8,
    max_words: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` WordPiece merges; returns ``(merges,
    segments)`` with ``merges = (round, sym_a, sym_b, pair_count,
    score_grid)`` — the likelihood-ordered merge table — and
    ``segments`` the final symbol table (cf. :func:`.bpe.bpe_train`)."""
    if max_words is not None and max_words <= _MAX_DRIVER_LEXICON:
        # Bounded lexicon → driver-side model-state training (see
        # bpe.bpe_train — identical rationale; only the winner scorer
        # differs).
        spark = docs.sparkSession
        lex = _collect_lexicon(docs, text_col, max_words)
        merge_rows, segments = _py_merge_train(lex, n_merges, _wp_winner)
        merges = spark.createDataFrame(
            merge_rows,
            "round INT, sym_a STRING, sym_b STRING, pair_count BIGINT, "
            "score_grid BIGINT",
        )
        return merges, _segments_df(spark, segments)
    seqs = bpe_lexicon(docs, text_col=text_col, max_words=max_words).localCheckpoint()
    merge_rows = []
    for r in range(n_merges):
        seqs, winner = _wp_round(seqs)
        seqs = seqs.localCheckpoint()
        merge_rows.append(winner.select(F.lit(r).alias("round"), "*"))
    merges = merge_rows[0]
    for m in merge_rows[1:]:
        merges = merges.unionByName(m)
    return merges, seqs


def wordpiece_tokenize_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 8,
    max_words: int | None = 1000,
) -> DataFrame:
    """Apply trained WordPiece merges to the corpus — identical replay
    semantics to :func:`.bpe.bpe_tokenize_docs` (the merge-application
    rule does not depend on how the merge list was scored)."""
    merges, _segs = wordpiece_train(
        docs, text_col=text_col, n_merges=n_merges, max_words=max_words
    )
    return replay_merges_over_docs(
        docs, merges, n_rounds=n_merges, text_col=text_col, id_col=id_col
    )
