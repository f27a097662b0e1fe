"""Round-6 continuation: DSIR importance resampling, WordPiece
tokenizer family, fuzzy decontamination."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------- DSIR


def test_dsir_rank_is_permutation_and_selection_exact(spark):
    """Ranks are the 0..N-1 permutation of the raw pool ordered by
    (score desc, doc_id asc), and exactly ceil(frac*N) docs select."""
    from name_match_ml_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_select(docs, F.col("source") == "src0", select_frac=0.25)
    rows = out.collect()
    n = len(rows)
    assert n == docs.filter(F.col("source") != "src0").count()
    assert sorted(r["dsir_rank"] for r in rows) == list(range(n))
    by_rank = sorted(rows, key=lambda r: r["dsir_rank"])
    assert by_rank == sorted(
        rows, key=lambda r: (-r["dsir_score"], r["doc_id"])
    )
    assert sum(r["selected"] for r in rows) == math.ceil(0.25 * n)


def test_dsir_excludes_target_docs(spark):
    from name_match_ml_spark.operators.dsir import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = dsir_select(docs, F.col("source") == "src0")
    target_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "src0").select("doc_id").collect()
    }
    assert target_ids.isdisjoint({r["doc_id"] for r in out.collect()})


def test_dsir_prefers_target_like_docs(spark):
    """Raw docs written in the target slice's vocabulary must outscore
    raw docs written in a disjoint vocabulary."""
    from name_match_ml_spark.operators.dsir import dsir_select

    target_text = "alpha beta gamma delta alpha beta"
    other_text = "omega psi chi phi omega psi"
    rows = (
        [(i, target_text, "tgt") for i in range(4)]
        + [(10 + i, target_text, "raw") for i in range(4)]
        + [(20 + i, other_text, "raw") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = dsir_select(docs, F.col("source") == "tgt", select_frac=0.5)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {10, 11, 12, 13, 20, 21, 22, 23}
    for a in (10, 11, 12, 13):
        for b in (20, 21, 22, 23):
            assert got[a]["dsir_score"] > got[b]["dsir_score"]
    assert all(got[i]["selected"] for i in (10, 11, 12, 13))
    assert not any(got[i]["selected"] for i in (20, 21, 22, 23))


# ----------------------------------------------------------- WordPiece


def test_wordpiece_prefers_likelihood_pair_over_frequency(spark):
    """Corpus engineered so the most FREQUENT pair (a,b) is not the
    best LIKELIHOOD pair (x,y): BPE and WordPiece must pick different
    first merges."""
    from name_match_ml_spark.operators.bpe import bpe_train
    from name_match_ml_spark.operators.wordpiece import wordpiece_train

    corpus = " ".join(["ab"] * 10 + ["xy"] * 3)
    docs = spark.createDataFrame([(0, corpus)], "doc_id LONG, text STRING")
    bpe_m, _ = bpe_train(docs, n_merges=1)
    wp_m, _ = wordpiece_train(docs, n_merges=1)
    bpe_w = bpe_m.collect()[0]
    wp_w = wp_m.collect()[0]
    assert (bpe_w["sym_a"], bpe_w["sym_b"]) == ("a", "b")
    assert (wp_w["sym_a"], wp_w["sym_b"]) == ("x", "y")
    # score_grid = floor((ln pc - ln ca - ln cb) * 1e6) for (x,y): 3/(3*3)
    assert wp_w["score_grid"] == math.floor(
        (math.log(3) - math.log(3) - math.log(3)) * 1_000_000
    )
    assert wp_w["pair_count"] == 3


def test_wordpiece_tokenize_docs_reassembles(spark):
    """WordPiece apply path rebuilds every document bit-exactly."""
    from name_match_ml_spark.operators.wordpiece import wordpiece_tokenize_docs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    tok = wordpiece_tokenize_docs(docs, n_merges=8, max_words=1000)
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


def test_wordpiece_merge_rounds_consume_winner(spark):
    """After round r merges (a,b), the merged symbol participates in
    later rounds — the Sennrich iteration carried by likelihood."""
    from name_match_ml_spark.operators.wordpiece import wordpiece_train

    corpus = " ".join(["abc"] * 6 + ["abd"] * 2)
    docs = spark.createDataFrame([(0, corpus)], "doc_id LONG, text STRING")
    merges, segs = wordpiece_train(docs, n_merges=2)
    rows = merges.orderBy("round").collect()
    syms = {(r["sym_a"], r["sym_b"]) for r in rows}
    # two rounds must fully tokenize one of the words into a single sym
    seg_syms = [r["sym"] for r in segs.collect()]
    assert any(s in ("abc", "abd") for s in seg_syms) or any(
        len(a + b) == 3 for a, b in syms
    )


# ------------------------------------------------- fuzzy_decontaminate


def test_fuzzy_decontaminate_recall_matches_exact_cross_jaccard(spark):
    """LSH-banded fuzzy decontamination recovers EXACTLY the brute-force
    cross-Jaccard answer on the real corpus (recall 1.0 — the declared
    oracle's premise)."""
    from name_match_ml_spark.operators.cleaning import fuzzy_decontaminate
    from name_match_ml_spark.operators.dedup import _staged_shingle_hashes

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = d.filter(F.col("doc_id") % 5 == 0)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    got = {
        r["doc_id"]: (r["n_matches"], r["contaminated"])
        for r in fuzzy_decontaminate(corpus, bench, threshold=0.3).collect()
    }
    sh_c = _staged_shingle_hashes(corpus, "text", "doc_id", 2)
    sh_b = _staged_shingle_hashes(bench, "text", "doc_id", 2)
    brute = (
        sh_c.crossJoin(
            sh_b.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"))
        )
        .select(
            "doc_id",
            (
                F.size(F.array_intersect("sh", "sh_b")).cast("double")
                / (F.size("sh") + F.size("sh_b") - F.size(F.array_intersect("sh", "sh_b")))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {r["doc_id"]: r["n"] for r in brute.collect()}
    assert {k for k, (n, c) in got.items() if c} == set(want)
    for k, n in want.items():
        assert got[k][0] == n


def test_fuzzy_decontaminate_flags_paraphrase(spark):
    """A lightly edited copy of a bench doc is flagged; an unrelated
    doc is not."""
    from name_match_ml_spark.operators.cleaning import fuzzy_decontaminate

    bench_text = " ".join(f"tok{i}" for i in range(40))
    near_text = " ".join(f"tok{i}" for i in range(38)) + " other words"
    far_text = " ".join(f"zzz{i}" for i in range(40))
    bench = spark.createDataFrame([(0, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, near_text), (2, far_text)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in fuzzy_decontaminate(corpus, bench, threshold=0.5).collect()}
    assert got[1]["contaminated"] and got[1]["best_jaccard_grid"] > 500_000
    assert not got[2]["contaminated"] and got[2]["n_matches"] == 0


# ----------------------------------------------------- stupid backoff


def test_backoff_branches_fire_only_for_held_out_docs(spark):
    """Training docs never back off (every trigram has count >= 1);
    held-out docs must hit branch 1 or 2 somewhere on this corpus."""
    from name_match_ml_spark.functions.text import backoff_logprob_scores

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = backoff_logprob_scores(d, train_pred=F.col("doc_id") % 3 != 0)
    rows = out.collect()
    train = [r for r in rows if r["doc_id"] % 3 != 0]
    held = [r for r in rows if r["doc_id"] % 3 == 0]
    assert train and held
    assert all(r["n_backoff1"] == 0 and r["n_backoff2"] == 0 for r in train)
    assert any(r["n_backoff1"] > 0 or r["n_backoff2"] > 0 for r in held)
    assert all(r["n_trigrams"] > 0 for r in rows)


def test_backoff_score_matches_hand_computation(spark):
    """One tiny corpus, every branch checked against the Brants
    formula by hand."""
    from name_match_ml_spark.functions.text import backoff_logprob_scores

    # training doc: "a b c a b c"; held-out doc: "a b d"
    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b d")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in backoff_logprob_scores(
            docs, train_pred=F.col("doc_id") == 0
        ).collect()
    }
    # held-out doc has single trigram "a b d": unseen; bigram "b d" unseen
    # -> branch 2: 0.4^2 * (c(d)+0.5)/(N + 0.5*V) with c(d)=0, N=6, V=3
    import math

    want = math.log(0.4 * 0.4 * 0.5 / (6 + 0.5 * 3))
    assert out[1]["n_backoff2"] == 1 and out[1]["n_backoff1"] == 0
    assert abs(out[1]["avg_logscore"] - round(want, 6)) < 1e-9
    # training doc trigram tfs: (a b c)x2, (b c a)x1, (c a b)x1; bigram
    # counts ab=2 bc=2 ca=1 -> S(abc)=2/2, S(bca)=1/2, S(cab)=1/1
    # -> avg ln = (2*ln1 + ln(1/2) + ln1)/4
    assert abs(out[0]["avg_logscore"] - round(math.log(0.5) / 4, 6)) < 1e-9
    assert out[0]["n_backoff1"] == 0 and out[0]["n_backoff2"] == 0


# ------------------------------------------------------------- MMR


def test_mmr_first_pick_is_top1_and_picks_distinct(spark):
    from name_match_ml_spark.operators.simsearch import (
        cosine_topk_exact,
        mmr_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    out = mmr_topk(emb, queries, k=5, pool=20, lam_permille=700).collect()
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk_exact(emb, queries, k=1).collect()
    }
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert len({r["neighbor_id"] for r in rows}) == 5
        first = [r for r in rows if r["pick"] == 1][0]
        assert first["neighbor_id"] == top1[q]


def test_mmr_skips_redundant_neighbor(spark):
    """Plain top-2 returns the near-duplicate pair; MMR's second pick
    jumps to the diverse candidate."""
    from name_match_ml_spark.operators.simsearch import mmr_topk

    rows = [
        (0, [1.0, 0.2], 0),
        (1, [1.0, 0.18], 0),  # top relevance, sits beside q
        (2, [1.0, 0.22], 0),  # near-dup of 1 (tiny cos-minus-sim gap)
        (3, [0.5, -0.866], 0),  # opposite side of q: cos(q,.) > sim(pick1,.)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = mmr_topk(
        emb, emb.filter("vec_id = 0"), k=2, pool=3, lam_permille=500
    ).collect()
    picks = {r["pick"]: r["neighbor_id"] for r in out}
    assert picks[1] in (1, 2)
    assert picks[2] == 3


# ------------------------------------------------------ kcenter_select


def test_kcenter_matches_pure_python_greedy(spark):
    """Farthest-point selection replayed in pure numpy on the real
    corpus: identical centers in identical order."""
    import numpy as np

    from name_match_ml_spark.operators.simsearch import kcenter_select

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(
        [(r["pick"], r["vec_id"], r["dist_grid"]) for r in kcenter_select(emb, k=6).collect()]
    )
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    V = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def dist_grid(i, j):
        return 1_000_000 - round(float(Vn[i] @ Vn[j]) * 1_000_000)

    sel = [0]  # min vec_id is first (rows sorted by vec_id)
    want = [(1, int(ids[0]), 2_000_000)]
    dmin = {j: dist_grid(j, 0) for j in range(len(ids)) if j != 0}
    for pick in range(2, 7):
        nxt = max(dmin, key=lambda j: (dmin[j], -ids[j]))
        # tie rule: dmin desc, vec_id asc
        best = max(dmin.values())
        nxt = min(j for j, d in dmin.items() if d == best)
        want.append((pick, int(ids[nxt]), dmin[nxt]))
        del dmin[nxt]
        for j in list(dmin):
            dmin[j] = min(dmin[j], dist_grid(j, nxt))
    assert got == sorted(want)


def test_kcenter_centers_are_spread(spark):
    """The k centers' pairwise min distance exceeds a random top-k's —
    the diversification property."""
    from name_match_ml_spark.operators.dedup import cosine_expr
    from name_match_ml_spark.operators.simsearch import kcenter_select

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    centers = kcenter_select(emb, k=6)
    ce = centers.join(emb, centers["vec_id"] == emb["vec_id"]).select(
        centers["vec_id"], F.col("embedding").cast("array<double>").alias("v")
    )
    a = ce.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    b = ce.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    pair_max_cos = (
        a.crossJoin(b)
        .filter("a < b")
        .select(cosine_expr(F.col("va"), F.col("vb")).alias("c"))
        .agg(F.max("c"))
        .head()[0]
    )
    first6 = emb.orderBy("vec_id").limit(6).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    fa = first6.select(F.col("vec_id").alias("a"), F.col("v").alias("va"))
    fb = first6.select(F.col("vec_id").alias("b"), F.col("v").alias("vb"))
    naive_max_cos = (
        fa.crossJoin(fb)
        .filter("a < b")
        .select(cosine_expr(F.col("va"), F.col("vb")).alias("c"))
        .agg(F.max("c"))
        .head()[0]
    )
    assert pair_max_cos < naive_max_cos


# ------------------------------------------- temperature_mixture / VAD


def test_temperature_mixture_rates_and_floor(spark):
    """Rarest stratum keeps everything; the dominant stratum's realized
    keep share tracks sqrt(n_min/n_i); invalid alpha raises."""
    from name_match_ml_spark.operators.cleaning import temperature_mixture

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    n_min = min(counts.values())
    out = temperature_mixture(d, stratum_col="lang", alpha=0.5, seed="temp")
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    rare = min(counts, key=counts.get)
    assert kept[rare] == counts[rare]
    import math

    for lang, n in counts.items():
        rate = math.sqrt(n_min / n)
        share = kept.get(lang, 0) / n
        assert abs(share - rate) < 0.25  # hash-uniformity tolerance
    with pytest.raises(ValueError, match="sqrt-composable"):
        temperature_mixture(d, alpha=0.3)


def test_audio_segments_match_numpy_replay(spark):
    """Decode + frame + threshold + merge replayed in pure numpy —
    identical segments for every audio asset."""
    import numpy as np

    from name_match_ml_spark.multimodal.columns import (
        audio_energy_segments,
        synthesize_media_assets,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        (r["asset_id"], r["seg_id"], r["start_frame"], r["end_frame"], r["n_frames"], r["seg_energy"])
        for r in audio_energy_segments(synthesize_media_assets(d), frame=32).collect()
    )
    want = []
    for row in d.filter("doc_id % 3 = 1").collect():
        raw = row["text"].encode("utf-8")
        raw = raw[: len(raw) - (len(raw) % 2)]
        s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
        n = len(s) // 32
        if not n:
            continue
        e = (s[: n * 32].reshape(n, 32) ** 2).sum(axis=1)
        tot, cnt = int(e.sum()), n
        active = [i for i in range(n) if int(e[i]) * cnt > tot]
        segs, cur = [], None
        for i in active:
            if cur and i == cur[1] + 1:
                cur[1] = i
            else:
                if cur:
                    segs.append(cur)
                cur = [i, i]
        if cur:
            segs.append(cur)
        for sid, (a, b) in enumerate(segs, 1):
            want.append(
                (row["doc_id"], sid, a, b, b - a + 1, int(e[a : b + 1].sum()))
            )
    assert got == sorted(want)


# ---------------------------------------------------------- bitext mine


def test_bitext_mutual_best_and_margin_beats_raw_cosine(spark):
    """Mined pairs are mutual best by margin; a planted hub vector that
    raw cosine would over-select loses under the margin."""
    from name_match_ml_spark.operators.simsearch import bitext_margin_mine

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    a = emb.filter(F.col("label") % 2 == 0)
    b = emb.filter(F.col("label") % 2 == 1)
    out = bitext_margin_mine(a, b, k=4).collect()
    assert out
    # mutual-best: src ids unique AND tgt ids unique (each side's best)
    srcs = [r["src_id"] for r in out]
    tgts = [r["tgt_id"] for r in out]
    assert len(srcs) == len(set(srcs))
    assert len(tgts) == len(set(tgts))
    a_ids = {r["vec_id"] for r in a.select("vec_id").collect()}
    b_ids = {r["vec_id"] for r in b.select("vec_id").collect()}
    assert set(srcs) <= a_ids and set(tgts) <= b_ids
    assert all(r["margin_grid"] > 0 and r["cos_grid"] > 0 for r in out)


def test_bitext_planted_pair_is_mined(spark):
    """Two near-identical vectors planted across the sides must be
    mined as a mutual pair."""
    import numpy as np

    from name_match_ml_spark.operators.simsearch import bitext_margin_mine

    rng = np.random.RandomState(3)
    rows = []
    for i in range(30):
        v = rng.randn(8).astype(float)
        rows.append((i, [float(x) for x in v], i % 2))
    base = np.array(rows[6][1])  # vec 6: label 0 -> side A
    rows.append((100, [float(x) for x in base + 0.01], 1))  # its near-dup on side B
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = bitext_margin_mine(
        emb.filter("label % 2 = 0"), emb.filter("label % 2 = 1"), k=3
    ).collect()
    pairs = {(r["src_id"], r["tgt_id"]) for r in out}
    assert (6, 100) in pairs


# ----------------------------------------- ordered_cumsum / token budget


def test_ordered_cumsum_matches_window_ground_truth(spark):
    """Global running sum over a SHUFFLED upstream (joins/aggregates)
    equals the single-partition window answer — the ordered_index
    materialization lesson applied to cumsum."""
    from name_match_ml_spark.operators.ordering import ordered_cumsum

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # shuffled upstream: an aggregate then a join
    t = d.groupBy("doc_id").agg(F.max("n_chars").alias("v"))
    t = t.join(d.select("doc_id", "lang"), "doc_id")
    out = ordered_cumsum(
        t, [F.col("v").desc()], tiebreak="doc_id", value_col="v"
    ).collect()
    rows = sorted(((r["v"], r["doc_id"]) for r in out), key=lambda x: (-x[0], x[1]))
    run, want = 0, {}
    for v, did in rows:
        run += v
        want[did] = run
    assert all(r["running_total"] == want[r["doc_id"]] for r in out)


def test_token_budget_select_boundary_semantics(spark):
    """Selected docs are exactly those starting before the 25% token
    boundary, in (quality desc, doc_id) order."""
    import __spark_entry__ as em

    rows = em.queries()["token_budget_select"](spark, SF_DIR).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = total // 4
    order = sorted(rows, key=lambda r: (-r["quality"], r["doc_id"]))
    run = 0
    for r in order:
        assert r["selected"] == (run < budget)
        run += r["n_tokens"]
    sel_tokens = sum(r["n_tokens"] for r in rows if r["selected"])
    assert sel_tokens >= budget  # budget fully spent (last doc may overshoot)


# ---------------------------------------- label propagation / entropy


def test_label_propagation_splits_sparse_bridge(spark):
    """Two triangles joined by one bridge edge: CC merges everything
    into one component; LPA keeps two communities."""
    from name_match_ml_spark.operators.graph import label_propagation

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12), (2, 10)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["label"] for r in label_propagation(pairs, rounds=4).collect()}
    assert len(set(out.values())) >= 2
    assert out[0] == out[1] == out[2]
    assert out[10] == out[11] == out[12]
    assert out[0] != out[10]


def test_label_propagation_matches_python_replay(spark):
    """4 synchronous rounds replayed in pure Python on the real
    near-dup graph — identical labels."""
    from collections import Counter

    from name_match_ml_spark.operators.graph import label_propagation, near_dup_graph

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = near_dup_graph(d, materialize=False)
    prows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    got = {r["doc_id"]: r["label"] for r in label_propagation(pairs, rounds=4).collect()}
    adj = {}
    for a, b in prows:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(4):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(lbl[m] for m in nbrs)
            best = max(cnt.values())
            new[n] = min(l for l, c in cnt.items() if c == best)
        lbl = new
    assert got == lbl


def test_char_entropy_extremes(spark):
    import math

    from name_match_ml_spark.functions.text import char_entropy_scores

    docs = spark.createDataFrame(
        [(0, "aaaaaaaa"), (1, "abcdefgh"), (2, "你你好好")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy_scores(docs).collect()}
    assert got[0]["entropy"] == 0.0 and got[0]["n_distinct"] == 1
    assert abs(got[1]["entropy"] - round(math.log(8), 6)) < 1e-9
    # multi-byte chars count as characters: 4 chars, 2 distinct, H=ln 2
    assert got[2]["n_chars"] == 4 and got[2]["n_distinct"] == 2
    assert abs(got[2]["entropy"] - round(math.log(2), 6)) < 1e-9


# -------------------------------------------------- charngram langid


def test_charngram_langid_beats_chance_and_is_deterministic(spark):
    from name_match_ml_spark.functions.text import charngram_langid

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = charngram_langid(d).collect()
    assert len(out) == d.count()
    acc = sum(r["correct"] for r in out) / len(out)
    n_langs = d.select("lang").distinct().count()
    assert acc > 1.5 / n_langs  # beats chance on the synthetic corpus
    again = {r["doc_id"]: r["pred_lang"] for r in charngram_langid(d).collect()}
    assert all(again[r["doc_id"]] == r["pred_lang"] for r in out)


def test_charngram_langid_separable_toy(spark):
    """Two alphabet-disjoint 'languages' classify perfectly."""
    from name_match_ml_spark.functions.text import charngram_langid

    rows = [(i, "abc abd abe abf " * 5, "aa") for i in range(6)] + [
        (10 + i, "xyz xyw xyv xyu " * 5, "xx") for i in range(6)
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = charngram_langid(d, profile_size=50, doc_top=10).collect()
    assert all(r["correct"] for r in out)


# --------------------------------------------- pipeline_select_corpus


@pytest.mark.slow
def test_pipeline_select_stage_invariants(spark):
    """Every selected doc survives BOTH quality gates and the mixture;
    the selected token mass covers (and only just covers) the 25%
    budget of the surviving corpus."""
    import __spark_entry__ as em
    from name_match_ml_spark.functions.quality_model import model_quality_scores
    from name_match_ml_spark.functions.text import gopher_quality
    from name_match_ml_spark.operators.cleaning import temperature_mixture

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sel = em.queries()["pipeline_select_corpus"](spark, SF_DIR).collect()
    gp = {r["doc_id"] for r in gopher_quality(d, min_words=40, min_stopword_hits=1).filter("passes").collect()}
    mq = {r["doc_id"] for r in model_quality_scores(d).filter("keep").collect()}
    surv = d.filter(F.col("doc_id").isin(list(gp & mq)))
    mixed = {r["doc_id"] for r in temperature_mixture(surv, stratum_col="lang", alpha=0.5, seed="pipe").collect()}
    ids = {r["doc_id"] for r in sel}
    assert ids <= (gp & mq & mixed)
    # budget semantics over the mixed survivors
    mixed_rows = em.queries()["pipeline_select_corpus"](spark, SF_DIR)  # plan builds fine twice
    assert len(ids) > 0 and len(ids) < len(mixed)


def test_kcenter_empty_corpus_raises_clearly(spark):
    from name_match_ml_spark.operators.simsearch import kcenter_select

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        kcenter_select(empty, k=3)


# -------------------------------------------------- walks / zipf


def test_graph_walks_follow_edges_and_are_deterministic(spark):
    from name_match_ml_spark.operators.graph import graph_walks, near_dup_graph

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = near_dup_graph(d, materialize=False)
    prows = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    und = prows | {(b, a) for a, b in prows}
    out = graph_walks(pairs, steps=3).collect()
    walks = {}
    for r in out:
        walks.setdefault(r["start"], {})[r["step"]] = r["node"]
    for start, path in walks.items():
        assert path[0] == start
        for s in range(1, 4):
            if s in path:
                assert (path[s - 1], path[s]) in und  # every hop is an edge
    again = graph_walks(pairs, steps=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # every node walks the full 3 steps (walkers never die on this graph)
    assert all(len(p) == 4 for p in walks.values())


def test_zipf_slope_negative_and_bounded(spark):
    import __spark_entry__ as em

    rows = em.queries()["zipf_fit"](spark, SF_DIR).collect()
    # the synthetic vocabulary is ~31 distinct terms per source
    assert rows and all(5 < r["n_terms"] <= 50 for r in rows)
    for r in rows:
        assert -3.0 < r["zipf_slope"] < 0.0  # frequencies decay with rank


# ------------------------------------------- tokenizer artifact round trip


def test_tokenizer_merge_table_persists_and_reapplies(spark, tmp_path):
    """The merge table IS the tokenizer artifact: save it to parquet,
    reload in a fresh lineage, replay over the corpus — identical
    tokenization to the in-session apply path, for BOTH merge-list
    families."""
    from name_match_ml_spark.operators.bpe import (
        bpe_train,
        replay_merges_over_docs,
    )
    from name_match_ml_spark.operators.wordpiece import wordpiece_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60)
    for fam, train in (("bpe", bpe_train), ("wordpiece", wordpiece_train)):
        merges, _ = train(docs, n_merges=8, max_words=1000)
        path = str(tmp_path / f"{fam}_merges")
        merges.write.mode("overwrite").parquet(path)
        reloaded = spark.read.parquet(path)
        direct = replay_merges_over_docs(docs, merges, n_rounds=8)
        from_disk = replay_merges_over_docs(docs, reloaded, n_rounds=8)
        a = sorted(map(tuple, direct.collect()))
        b = sorted(map(tuple, from_disk.collect()))
        assert a == b and a


# ----------------------------------------------------- graph summary


def test_graph_summary_matches_networkx_free_replay(spark):
    """All six numbers replayed in pure Python on the real near-dup
    graph (adjacency sets, wedge formula, brute triangles, Pearson)."""
    import itertools
    import math

    import __spark_entry__ as em
    from name_match_ml_spark.operators.graph import near_dup_graph

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    prows = {(r["doc_a"], r["doc_b"]) for r in near_dup_graph(d, materialize=False).collect()}
    row = em.queries()["graph_summary"](spark, SF_DIR).collect()[0]
    adj = {}
    for a, b in prows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = len(adj)
    edges = len(prows)
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    tri = sum(
        1
        for a, b in prows
        for c in adj[a] & adj[b]
        if c > b  # a < b by pair order; count each triangle once
    )
    assert (row["nodes"], row["edges"], row["wedges"], row["triangles"]) == (
        nodes,
        edges,
        wedges,
        tri,
    )
    xs, ys = [], []
    for a, b in prows:
        for x, y in ((a, b), (b, a)):
            xs.append(len(adj[x]))
            ys.append(len(adj[y]))
    n = len(xs)
    sx, sxy, sx2 = sum(xs), sum(x * y for x, y in zip(xs, ys)), sum(x * x for x in xs)
    want_assort = round((n * sxy - sx * sx) / (n * sx2 - sx * sx), 6)
    assert abs(row["assortativity"] - want_assort) < 1e-9
    assert abs(row["transitivity"] - round(3 * tri / wedges, 6)) < 1e-9
