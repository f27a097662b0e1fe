"""Unigram-LM (SentencePiece-style) tokenizer training [EXT] — the
second of the two tokenizer families in production use, beside
:mod:`.bpe` (VERDICT r5 #4).

Follows the unigram language model of Kudo 2018 ("Subword
Regularization"), restated so every step is deterministic,
integer-dominant, and bit-replayable in a DuckDB oracle:

* **Lexicon formulation** (same scale device as BPE): the corpus is
  scanned ONCE for ``(word, freq)``; everything after works on the
  vocabulary-bounded lexicon, so training cost is independent of corpus
  bytes — the property that makes tokenizer training feasible at
  100 TB.
* **Seed vocabulary**: all substrings up to ``max_token_len`` chars,
  counted by occurrence mass (Σ word freq per occurrence); the top
  ``vocab_size`` multi-char candidates by (count desc, token asc) plus
  ALL single characters (the coverage guarantee — every word stays
  segmentable).
* **Fixed-point costs**: ``cost(t) = floor(-ln(cnt/total)·1e6)`` on an
  int64 grid.  The ln itself is the one IEEE double op (same device as
  ``unigram_logprob``/``tfidf_top_terms``); everything downstream —
  the DP, the comparisons, the counts — is exact int64.
* **Hard-EM with lattice counts**: each round re-estimates a token's
  count as the freq-mass of its occurrences lying on SOME minimum-cost
  segmentation (``forward + edge + backward == total``) — the
  deterministic, tie-free analog of Viterbi counts (no argmin path
  tie-breaking needed).  Multi-char tokens that fall off every optimal
  lattice are pruned; survivors get add-one smoothing.
* **Min-plus closure instead of a sequential Viterbi loop**: per-word
  shortest segmentation costs are computed by repeated squaring of the
  (position → position) edge relation — ``DOUBLING_ROUNDS`` rounds
  cover any path of up to ``2^D`` edges, the distributed answer to an
  inherently sequential DP (same round-doubling idea as the
  large-star/small-star CC in :mod:`.graph`).  Words longer than
  ``2^D`` chars raise loudly (the k-core lesson: never silently
  under-converge against a fixed-depth oracle).
* **Final segmentation**: from each position, among suffix-optimal
  edges (``cost + d(j,n) == d(i,n)``) the SHORTEST token (min j) is
  chosen — a total, deterministic rule — and the chosen path is
  recovered with a boolean-semiring closure over the chosen edges.

Reference corpus note: the reference repo (main.py) has no tokenizer
machinery; this extends the LLM-pipeline operator family.  The oracle
(``suite._unigram_oracle_sql``) replays every round as generated
unrolled CTEs; round counts are pinned constants shared between both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "unigram_lm_train",
    "unigram_tokenize_docs",
    "DOUBLING_ROUNDS",
    "MAX_WORD_LEN",
]

# Pinned and shared with the oracle generator: the min-plus closure
# covers paths of up to 2^DOUBLING_ROUNDS single-char edges, i.e. words
# of up to MAX_WORD_LEN characters. Longer words raise.
DOUBLING_ROUNDS = 4
MAX_WORD_LEN = 1 << DOUBLING_ROUNDS


def _lexicon(docs: DataFrame, text_col: str, max_words: int) -> DataFrame:
    """``(wid, freq, n)`` — lowercase whitespace word lexicon with corpus
    frequency and char length, capped at the top ``max_words`` by
    (freq desc, word asc)."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
        ).alias("wid")
    )
    lex = words.groupBy("wid").agg(F.count(F.lit(1)).alias("freq"))
    lex = lex.orderBy(F.desc("freq"), "wid").limit(max_words)
    return lex.select("wid", "freq", F.length("wid").cast("long").alias("n"))


def _occurrences(lex: DataFrame, max_token_len: int) -> DataFrame:
    """``(wid, freq, n, i, j, tok)`` — every substring occurrence of
    length 1..``max_token_len``: tok spans char positions [i, j)."""
    pos = lex.select(
        "wid", "freq", "n",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("n") - 1)).alias("i"),
    )
    spans = pos.select(
        "wid", "freq", "n", "i",
        F.explode(
            F.sequence(
                F.lit(1).cast("long"),
                F.least(F.lit(max_token_len).cast("long"), F.col("n") - F.col("i")),
            )
        ).alias("len"),
    )
    return spans.select(
        "wid", "freq", "n", "i",
        (F.col("i") + F.col("len")).alias("j"),
        F.expr("substr(wid, CAST(i + 1 AS INT), CAST(len AS INT))").alias("tok"),
    )


def _costed(vocab: DataFrame) -> DataFrame:
    """``(tok, cnt, cost)`` — int64 grid costs floor(-ln(cnt/total)·1e6).
    The 1-row total is an allowlisted broadcast (like every corpus-count
    join in functions/text.py)."""
    tot = vocab.agg(F.sum("cnt").alias("tot"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        "cnt",
        F.floor(
            (-F.log(F.col("cnt").cast("double") / F.col("tot").cast("double")))
            * F.lit(1000000.0)
        ).cast("long").alias("cost"),
    )


def _min_plus_closure(edges: DataFrame, diag: DataFrame, rounds: int) -> DataFrame:
    """All-pairs min segmentation cost d(i, j) per word via repeated
    squaring, seeded with token edges + zero self-loops; after
    ``rounds`` squarings d covers every path of ≤ 2^rounds edges."""
    d = (
        edges.select("wid", "i", "j", "cost")
        .unionByName(diag)
        .groupBy("wid", "i", "j")
        .agg(F.min("cost").alias("cost"))
        .localCheckpoint()
    )
    for _ in range(rounds):
        d = (
            d.alias("a")
            .join(
                d.alias("b"),
                (F.col("a.wid") == F.col("b.wid")) & (F.col("a.j") == F.col("b.i")),
            )
            .groupBy(
                F.col("a.wid").alias("wid"),
                F.col("a.i").alias("i"),
                F.col("b.j").alias("j"),
            )
            .agg(F.min(F.col("a.cost") + F.col("b.cost")).alias("cost"))
            .localCheckpoint()
        )
    return d


def _assert_word_len(words_df: DataFrame, who: str) -> None:
    longest = words_df.agg(F.max("n")).first()[0] or 0
    if longest > MAX_WORD_LEN:
        raise ValueError(
            f"{who}: longest word has {longest} chars but the "
            f"pinned closure depth DOUBLING_ROUNDS={DOUBLING_ROUNDS} only covers "
            f"words up to {MAX_WORD_LEN}; raise DOUBLING_ROUNDS (and regenerate "
            f"the oracle) rather than silently under-converging."
        )


def _diag(words_df: DataFrame) -> DataFrame:
    return words_df.select(
        "wid", F.explode(F.sequence(F.lit(0).cast("long"), F.col("n"))).alias("i")
    ).select("wid", "i", F.col("i").alias("j"), F.lit(0).cast("long").alias("cost"))


def _segment(words_df: DataFrame, costed: DataFrame, max_token_len: int) -> DataFrame:
    """Chosen minimum-cost segmentation ``(wid, freq, pos, sym)`` of each
    ``(wid, freq, n)`` word under ``costed = (tok, cost)``: min-plus
    closure → suffix-optimal edges → shortest-token choice →
    boolean-semiring path recovery."""
    occ = _occurrences(words_df, max_token_len)
    diag = _diag(words_df)
    edges = occ.join(costed.select("tok", "cost"), "tok")
    d = _min_plus_closure(edges, diag, DOUBLING_ROUNDS)
    # suffix-optimal edges: cost(i,j) + d(j,n) == d(i,n)
    dsn = d.alias("d").join(words_df.select("wid", "n").alias("l"), "wid").filter(
        F.col("d.j") == F.col("l.n")
    ).select("wid", F.col("d.i").alias("si"), F.col("d.cost").alias("scost"))
    di = dsn.select("wid", F.col("si").alias("i"), F.col("scost").alias("ci"))
    dj = dsn.select("wid", F.col("si").alias("j"), F.col("scost").alias("cj"))
    sopt = (
        edges.join(di, ["wid", "i"])
        .join(dj, ["wid", "j"])
        .filter(F.col("cost") + F.col("cj") == F.col("ci"))
        .select("wid", "freq", "i", "j", "tok")
    )
    nxt = sopt.groupBy("wid", "i").agg(F.min("j").alias("j"))
    chos = sopt.join(nxt, ["wid", "i", "j"]).localCheckpoint()
    # boolean-semiring closure over the chosen (out-degree ≤ 1) edges:
    # path nodes = everything reachable from position 0
    t = (
        chos.select("wid", "i", "j")
        .unionByName(diag.select("wid", "i", "j"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(DOUBLING_ROUNDS):
        t = (
            t.alias("a")
            .join(
                t.alias("b"),
                (F.col("a.wid") == F.col("b.wid")) & (F.col("a.j") == F.col("b.i")),
            )
            .select(
                F.col("a.wid").alias("wid"),
                F.col("a.i").alias("i"),
                F.col("b.j").alias("j"),
            )
            .distinct()
            .localCheckpoint()
        )
    path_nodes = t.filter(F.col("i") == 0).select("wid", F.col("j").alias("i"))
    return chos.join(path_nodes, ["wid", "i"]).select(
        "wid", "freq", F.col("i").cast("int").alias("pos"), F.col("tok").alias("sym")
    )


def unigram_lm_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    max_words: int = 1000,
    vocab_size: int = 64,
    max_token_len: int = 4,
    em_rounds: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Train a unigram-LM tokenizer; returns ``(vocab, segments)``.

    ``vocab``: ``(token, freq, cost_grid)`` — the final smoothed token
    counts and the int64 costs they induce (THE tokenizer artifact:
    applying the tokenizer to any text is the same closure DP under
    these costs).  ``segments``: ``(wid, freq, pos, sym)`` — each
    lexicon word's chosen minimum-cost segmentation under the final
    costs (shortest-token-first among suffix-optimal edges).
    """
    lex, final_cost = _train_costs(
        docs,
        text_col=text_col,
        max_words=max_words,
        vocab_size=vocab_size,
        max_token_len=max_token_len,
        em_rounds=em_rounds,
    )
    segments = _segment(lex, final_cost, max_token_len)
    vocab_out = final_cost.select(
        F.col("tok").alias("token"),
        F.col("cnt").alias("freq"),
        F.col("cost").alias("cost_grid"),
    )
    return vocab_out, segments


def _train_costs(
    docs: DataFrame,
    *,
    text_col: str,
    max_words: int,
    vocab_size: int,
    max_token_len: int,
    em_rounds: int,
) -> tuple[DataFrame, DataFrame]:
    """The EM training chain; returns ``(lex, final_cost)`` with
    ``final_cost = (tok, cnt, cost)`` checkpointed."""
    lex = _lexicon(docs, text_col, max_words).localCheckpoint()
    _assert_word_len(lex, "unigram_lm_train")
    occ = _occurrences(lex, max_token_len).localCheckpoint()
    diag = _diag(lex)

    cand = occ.groupBy("tok").agg(F.sum("freq").alias("cnt"))
    chars = cand.filter(F.length("tok") == 1)
    multi = (
        cand.filter(F.length("tok") > 1)
        .orderBy(F.desc("cnt"), "tok")
        .limit(vocab_size)
    )
    vocab = chars.unionByName(multi).localCheckpoint()

    def _round_lattice(costed: DataFrame):
        """(edges, d, on-path occurrence stream) under current costs."""
        edges = occ.join(costed.select("tok", "cost"), "tok")
        d = _min_plus_closure(edges, diag, DOUBLING_ROUNDS)
        fwd = d.filter(F.col("i") == 0).select(
            "wid", F.col("j").alias("fe"), F.col("cost").alias("fcost")
        )
        bwd = d.select(
            "wid",
            F.col("i").alias("be"),
            F.col("j").alias("bn"),
            F.col("cost").alias("bcost"),
        )
        total = (
            d.join(lex.select("wid", "n"), "wid")
            .filter((F.col("i") == 0) & (F.col("j") == F.col("n")))
            .select("wid", F.col("cost").alias("wtotal"))
        )
        onp = (
            edges.join(fwd, (edges["wid"] == fwd["wid"]) & (edges["i"] == fwd["fe"]))
            .drop(fwd["wid"])
            .join(
                bwd,
                (edges["wid"] == bwd["wid"])
                & (edges["j"] == bwd["be"])
                & (edges["n"] == bwd["bn"]),
            )
            .drop(bwd["wid"])
            .join(total, "wid")
            .filter(F.col("fcost") + F.col("cost") + F.col("bcost") == F.col("wtotal"))
        )
        return edges, d, onp

    for _ in range(em_rounds):
        costed = _costed(vocab)
        _edges, _d, onp = _round_lattice(costed)
        ncnt = onp.groupBy("tok").agg(F.sum("freq").alias("ncnt"))
        vocab = (
            vocab.join(ncnt, "tok", "left")
            .filter((F.length("tok") == 1) | (F.coalesce("ncnt", F.lit(0)) > 0))
            .select("tok", (F.coalesce("ncnt", F.lit(0)) + F.lit(1)).alias("cnt"))
            .localCheckpoint()
        )

    return lex, _costed(vocab).localCheckpoint()


def unigram_tokenize_docs(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_words: int = 1000,
    vocab_size: int = 64,
    max_token_len: int = 4,
    em_rounds: int = 2,
) -> DataFrame:
    """Apply the trained unigram-LM tokenizer to the CORPUS: one row per
    emitted token, ``(doc_id, wpos, pos, sym)`` with ``wpos`` the word's
    0-based position in the document and ``pos`` the token's char offset
    inside the word.

    The apply path that makes the tokenizer usable downstream of
    training (the unigram twin of "replaying BPE merges"): the DISTINCT
    corpus word table is segmented ONCE under the final learned costs —
    including words outside the capped training lexicon — and documents
    join their words against that per-word segmentation.  Single-char
    coverage at apply time is TOTAL: corpus characters absent from the
    trained vocabulary (possible when a char occurs only in words ranked
    below the ``max_words`` training-lexicon cap) are unioned into the
    cost table as UNK single-char tokens at a pinned cost of
    ``max(trained cost) + 1_000_000`` — strictly worse than any trained
    token, so trained segmentations are unchanged, but no word is ever
    silently dropped by the segmentation join (ADVICE r6 #2).
    At 100 TB the per-word table is the vocabulary-bounded artifact you
    materialize; the corpus-sized work is one explode + one hash join.
    """
    _lex, final_cost = _train_costs(
        docs,
        text_col=text_col,
        max_words=max_words,
        vocab_size=vocab_size,
        max_token_len=max_token_len,
        em_rounds=em_rounds,
    )
    dw = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != "")
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
    _assert_word_len(allw, "unigram_tokenize_docs")
    # UNK coverage: apply-time single chars missing from the trained
    # vocabulary, at a pinned cost above every trained token (1-row max
    # broadcast — the allowlisted corpus-stat pattern).
    chars_apply = (
        allw.select(
            "wid",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n") - 1)).alias("i"),
        )
        .select(F.expr("substr(wid, CAST(i + 1 AS INT), 1)").alias("tok"))
        .distinct()
    )
    missing = chars_apply.join(final_cost.select("tok"), "tok", "left_anti")
    maxc = final_cost.agg((F.max("cost") + F.lit(1000000)).alias("unk_cost"))
    unk = missing.crossJoin(F.broadcast(maxc)).select(
        "tok",
        F.lit(0).cast("long").alias("cnt"),
        F.col("unk_cost").cast("long").alias("cost"),
    )
    cost_apply = final_cost.select("tok", "cnt", "cost").unionByName(unk)
    segs = _segment(allw, cost_apply, max_token_len)
    return dw.join(segs.select("wid", "pos", "sym"), "wid").select(
        "doc_id", F.col("wpos").cast("int").alias("wpos"), "pos", "sym"
    )
