"""Corpus-cleaning operator tests (operators/cleaning.py [EXT]):
decontamination, repetition stats, mixture sampling — small synthetic
corpora with driver-side oracles; DuckDB hash-parity is covered by the
declared-query harness (tools/verify_queries.py)."""

from __future__ import annotations

import hashlib

import pytest

from name_match_ml_spark.operators.cleaning import (
    decontaminate_ngrams,
    mixture_sample,
    repetition_stats,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "completely unrelated text about spark shuffles and joins here"),
        (2, "a quick brown fox jumps over nothing else at all today"),
        (3, "tiny"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "we saw the quick brown fox jumps over a fence")],
        ["doc_id", "text"],
    )


def test_decontaminate_flags_overlap(corpus, bench_docs):
    out = {r.doc_id: r for r in decontaminate_ngrams(corpus, bench_docs, n=5).collect()}
    assert len(out) == 4  # one row per corpus doc, clean ones included
    # doc 0 and 2 share the 5-gram "quick brown fox jumps over"
    assert out[0].contaminated and out[0].n_hits >= 1
    assert out[2].contaminated
    assert not out[1].contaminated and out[1].n_hits == 0
    assert not out[3].contaminated  # shorter than n words -> no grams


def test_decontaminate_hash_fns_agree(corpus, bench_docs):
    a = sorted(map(tuple, decontaminate_ngrams(corpus, bench_docs, n=5).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate_ngrams(corpus, bench_docs, n=5, hash_fn="md5_60").collect(),
        )
    )
    assert a == b


def test_repetition_stats_exact(spark):
    rows = [
        (0, "a b a b a b"),  # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
        (1, "all words unique in this one"),
        (2, "x"),  # shorter than n -> 0 grams, ratio 0, kept
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_stats(docs, n=2, max_ratio=0.5).collect()}
    assert (out[0].total_ngrams, out[0].distinct_ngrams) == (5, 2)
    assert out[0].rep_ratio == pytest.approx(0.6)
    assert not out[0].keep
    assert out[1].rep_ratio == 0.0 and out[1].keep
    assert out[2].total_ngrams == 0 and out[2].rep_ratio == 0.0 and out[2].keep


def test_mixture_sample_rates_and_determinism(spark):
    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(2000)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])

    none_en = mixture_sample(docs, {"en": 0.0}, seed="s1").collect()
    assert all(r.lang == "fr" for r in none_en) and len(none_en) == 1000

    half = mixture_sample(docs, {"en": 0.5, "fr": 0.5}, seed="s1")
    got1 = sorted(r.doc_id for r in half.collect())
    got2 = sorted(r.doc_id for r in half.collect())
    assert got1 == got2  # deterministic: no RNG state, pure hash of (seed, id)
    assert 800 < len(got1) < 1200  # ~50% of 2000

    # decisions match the documented pure function exactly
    def kept(doc_id: int) -> bool:
        h = int(hashlib.md5(f"s1:{doc_id}".encode()).hexdigest()[:15], 16)
        return h < int(0.5 * (1 << 60))

    assert set(got1) == {i for i in range(2000) if kept(i)}

    other_seed = sorted(r.doc_id for r in mixture_sample(docs, {"en": 0.5, "fr": 0.5}, seed="s2").collect())
    assert other_seed != got1  # independent draw per seed


@pytest.mark.slow
def test_pack_documents_budget_and_determinism(spark):
    from name_match_ml_spark.operators.packing import pack_documents

    rows = [(i, " ".join(f"w{j}" for j in range(10 + (i * 7) % 50))) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_documents(docs, budget=64, n_buckets=8)
    rows1 = sorted(map(tuple, out.collect()))
    rows2 = sorted(map(tuple, pack_documents(docs, budget=64, n_buckets=8).collect()))
    assert rows1 == rows2  # pure function of the corpus

    import collections

    by_pack = collections.defaultdict(list)
    for doc_id, bucket, n_tokens, pack_seq in rows1:
        by_pack[(bucket, pack_seq)].append((doc_id, n_tokens))
    assert len(rows1) == 200
    for (bucket, seq), members in by_pack.items():
        total = sum(n for _, n in members)
        # a pack only exceeds the budget when it is a single oversized doc
        assert total <= 64 or len(members) == 1
    # greedy tightness: consecutive packs in a bucket couldn't be merged
    buckets = collections.defaultdict(dict)
    for (bucket, seq), members in by_pack.items():
        buckets[bucket][seq] = sum(n for _, n in members)
    for bucket, packs in buckets.items():
        for seq in range(len(packs) - 1):
            # the doc that OPENED pack seq+1 (min doc_id: fill order) must
            # not have fit into pack seq, else greedy wouldn't have closed it
            first_of_next = min(by_pack[(bucket, seq + 1)])[1]
            assert packs[seq] + first_of_next > 64, (bucket, seq)


def test_leak_safe_split_keeps_clusters_together(spark):
    from name_match_ml_spark.operators.cleaning import leak_safe_split

    docs = spark.createDataFrame([(i,) for i in range(300)], ["doc_id"])
    # docs i and i+100 are near-dups for i < 100; 200..299 are singletons
    pairs = spark.createDataFrame(
        [(i, i + 100) for i in range(100)], ["doc_a", "doc_b"]
    )
    out = {r.doc_id: r for r in leak_safe_split(docs, pairs).collect()}
    assert len(out) == 300
    for i in range(100):
        # the whole cluster shares one group and therefore one split
        assert out[i].group_id == out[i + 100].group_id == i
        assert out[i].split == out[i + 100].split
    counts = {}
    for r in out.values():
        counts[r.split] = counts.get(r.split, 0) + 1
    # 200 groups at 90/5/5: train dominates, every split name is valid
    assert counts.get("train", 0) > 150
    assert set(counts) <= {"train", "val", "test"}


def test_select_keepers_quality_policy(spark):
    from name_match_ml_spark.operators.cleaning import select_keepers

    docs = spark.createDataFrame(
        [(0, 10), (1, 30), (2, 30), (3, 5), (9, 7)],
        ["doc_id", "n_chars"],
    )
    # cluster {0,1,2,3}; 9 is a singleton
    pairs = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], ["doc_a", "doc_b"])
    out = {r.doc_id: r for r in select_keepers(docs, pairs).collect()}
    assert len(out) == 5
    # max quality 30 is tied between 1 and 2 -> min doc_id wins
    assert out[1].is_keeper and not out[2].is_keeper
    assert not out[0].is_keeper and not out[3].is_keeper
    assert all(out[i].cluster_id == 0 for i in (0, 1, 2, 3))
    # singleton keeps itself in its own cluster
    assert out[9].is_keeper and out[9].cluster_id == 9


def test_cleaning_ops_total_on_null_and_empty_text(spark):
    """Null/empty text must flow through every cleaning operator (a real
    corpus has both); packing previously crashed on null -> NaN tokens."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from name_match_ml_spark.operators.packing import pack_documents

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    docs = spark.createDataFrame([(0, None), (1, "a b c d e f"), (2, "")], schema)

    rep = {r.doc_id: r for r in repetition_stats(docs, n=2).collect()}
    assert rep[0].total_ngrams == 0 and rep[0].keep
    assert rep[2].total_ngrams == 0 and rep[2].keep

    dec = {r.doc_id: r for r in decontaminate_ngrams(docs, docs.filter("doc_id = 1"), n=3).collect()}
    assert not dec[0].contaminated and not dec[2].contaminated and dec[1].contaminated

    packed = {r.doc_id: r for r in pack_documents(docs, budget=4, n_buckets=2).collect()}
    assert len(packed) == 3 and packed[0].n_tokens == 0 and packed[2].n_tokens == 0


def test_split_thresholds_exact_fractions():
    """Operator and oracle must read the SAME cumulative thresholds —
    exact-fraction accumulation, never doubles (0.9 + 0.05 in floats is
    0.9500000000000001 -> a 128-hash-value window of disagreement)."""
    from fractions import Fraction

    from name_match_ml_spark.operators.cleaning import split_thresholds
    from name_match_ml_spark.suite import ORACLE_SQL

    t = split_thresholds((("train", 0.9), ("val", 0.05), ("test", 0.05)))
    assert t == (
        ("train", int(Fraction(9, 10) * (1 << 60))),
        ("val", int(Fraction(19, 20) * (1 << 60))),
    )
    # the float-accumulated value the r3 operator used is NOT what we emit
    assert t[1][1] != int((0.9 + 0.05) * (1 << 60))
    # and the declared DuckDB oracle embeds these exact integers
    assert str(t[0][1]) in ORACLE_SQL["leak_safe_split"]
    assert str(t[1][1]) in ORACLE_SQL["leak_safe_split"]


def test_cleaning_accepts_staged_clusters(spark):
    """leak_safe_split/select_keepers with a pre-resolved cluster map
    must agree exactly with the compute-it-yourself path."""
    from name_match_ml_spark.operators.cleaning import leak_safe_split, select_keepers
    from name_match_ml_spark.operators.graph import connected_components

    docs = spark.createDataFrame([(i, 10 + i % 3) for i in range(50)], ["doc_id", "n_chars"])
    pairs = spark.createDataFrame([(i, i + 25) for i in range(20)], ["doc_a", "doc_b"])
    clusters = connected_components(pairs)

    via_pairs = sorted(map(tuple, leak_safe_split(docs, pairs).collect()))
    via_map = sorted(map(tuple, leak_safe_split(docs, clusters=clusters).collect()))
    assert via_pairs == via_map

    kp = sorted(map(tuple, select_keepers(docs, pairs, quality_col="n_chars").collect()))
    km = sorted(map(tuple, select_keepers(docs, clusters=clusters, quality_col="n_chars").collect()))
    assert kp == km

    with pytest.raises(ValueError):
        leak_safe_split(docs)
    with pytest.raises(ValueError):
        select_keepers(docs)


def test_pack_documents_derives_bucket_count(spark):
    """n_buckets=None sizes buckets from the corpus row estimate so one
    applyInPandas group can never be O(corpus) at scale."""
    import collections

    from name_match_ml_spark.operators.packing import pack_documents

    rows = [(i, " ".join(f"w{j}" for j in range(10 + (i * 7) % 50))) for i in range(200)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    # 200 rows / 5 per bucket -> ceil = 40 buckets (> the 32 floor)
    out = pack_documents(docs, budget=64, target_docs_per_bucket=5)
    got = sorted(map(tuple, out.collect()))
    assert len(got) == 200
    assert {b for _, b, _, _ in got} <= set(range(40))
    assert max(b for _, b, _, _ in got) >= 32  # floor exceeded: derivation ran
    # derived run is still a pure function of the corpus
    again = sorted(map(tuple, pack_documents(docs, budget=64, target_docs_per_bucket=5).collect()))
    assert got == again
    # budget invariant unchanged under derived bucketing
    fills = collections.defaultdict(list)
    for doc_id, bucket, n_tokens, pack_seq in got:
        fills[(bucket, pack_seq)].append(n_tokens)
    for members in fills.values():
        assert sum(members) <= 64 or len(members) == 1


def test_unimax_water_filling_invariants(spark):
    """Budget conservation (sum alloc <= B, deficit < n), cap respected,
    small strata fund fully before large ones, and the degenerate
    regimes (budget >= sum caps -> everyone at cap; tiny budget ->
    uniform level) both hold."""
    from name_match_ml_spark.operators.cleaning import unimax_mixture

    rows = []
    did = 0
    for lang, n_docs, words in [("aa", 2, 10), ("bb", 4, 10), ("cc", 20, 10)]:
        for _ in range(n_docs):
            rows.append((did, " ".join(["w"] * words), lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # total = 260 tokens; caps (E=2): aa 40, bb 80, cc 400
    out = {
        r["stratum"]: r
        for r in unimax_mixture(
            docs, epoch_cap=2, budget_permille=1000
        ).collect()  # B = 260
    }
    assert out["aa"]["alloc_tokens"] == 40  # funded at cap
    assert out["bb"]["alloc_tokens"] == 80  # funded at cap
    assert out["cc"]["alloc_tokens"] == 140  # leftover level
    assert out["aa"]["epochs_grid"] == 2_000_000
    total_alloc = sum(r["alloc_tokens"] for r in out.values())
    assert total_alloc <= 260 and 260 - total_alloc < 3
    # budget >= sum caps: everyone at cap
    big = {
        r["stratum"]: r["alloc_tokens"]
        for r in unimax_mixture(docs, epoch_cap=2, budget_permille=9000).collect()
    }
    assert big == {"aa": 40, "bb": 80, "cc": 400}
    # tiny budget below n * min cap: uniform level, nobody funded
    tiny = {
        r["stratum"]: r["alloc_tokens"]
        for r in unimax_mixture(docs, epoch_cap=2, budget_permille=100).collect()
    }
    assert tiny == {"aa": 8, "bb": 8, "cc": 8}  # 26 DIV 3


def test_unimax_validation(spark):
    import pytest

    from name_match_ml_spark.operators.cleaning import unimax_mixture

    docs = spark.createDataFrame([(0, "a", "x")], "doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        unimax_mixture(docs, epoch_cap=0)


def test_decontaminate_spans_surgical(spark):
    """Only the overlapping span is cut (not the whole doc); clean docs
    pass through intact; a doc that IS an eval doc is fully emptied;
    overlapping hits union their positions."""
    from name_match_ml_spark.operators.cleaning import decontaminate_spans

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "intro words alpha beta gamma delta closing words here"),
            (2, "totally clean document with no overlap at all"),
            (3, "alpha beta gamma delta"),  # the eval text verbatim
            (4, "x alpha beta gamma delta epsilon alpha beta gamma delta y"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in decontaminate_spans(corpus, bench, n=4).collect()
    }
    assert got[1]["n_removed"] == 4
    assert got[1]["text"] == "intro words closing words here"
    assert got[2]["n_removed"] == 0
    assert got[2]["text"] == "totally clean document with no overlap at all"
    assert got[3]["n_removed"] == 4 and got[3]["text"] == ""
    # two disjoint hits in doc 4: both spans cut, surroundings kept
    assert got[4]["n_removed"] == 8
    assert got[4]["text"] == "x epsilon y"


def test_pack_attention_spans_partition_packs(spark):
    """Spans inside each pack tile it exactly: start at 0, contiguous,
    non-overlapping, ordered by doc_id, end at pack length - 1."""
    from name_match_ml_spark.operators.packing import (
        pack_attention_spans,
        pack_documents,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    spans = pack_attention_spans(docs, budget=20, n_buckets=4).collect()
    packs: dict[tuple, list] = {}
    for r in spans:
        packs.setdefault((r["bucket"], r["pack_seq"]), []).append(r)
    assert packs
    lens = {
        (r["doc_id"]): r["n_tokens"]
        for r in pack_documents(docs, budget=20, n_buckets=4).collect()
    }
    for members in packs.values():
        members.sort(key=lambda r: r["doc_id"])
        expect_start = 0
        for r in members:
            assert r["start_tok"] == expect_start
            assert r["end_tok"] - r["start_tok"] + 1 == lens[r["doc_id"]]
            expect_start = r["end_tok"] + 1
        assert expect_start <= 20 or len(members) == 1  # oversize doc alone


def test_eval_contamination_report_reverse_consistency(spark):
    """The reverse report agrees with the forward flag: an eval item is
    burned iff some corpus doc is contaminated by it; counts pin the
    toy geometry."""
    from name_match_ml_spark.operators.cleaning import (
        decontaminate_ngrams,
        eval_contamination_report,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta"), (101, "never seen words here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "x alpha beta gamma delta y"),
            (2, "alpha beta gamma delta"),
            (3, "clean other text entirely"),
        ],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: r
        for r in eval_contamination_report(corpus, bench, n=4).collect()
    }
    assert rep[100]["burned"] and rep[100]["n_corpus_docs"] == 2
    assert rep[100]["n_shared_grams"] == 1
    assert not rep[101]["burned"] and rep[101]["n_corpus_docs"] == 0
    fwd = {
        r["doc_id"]: r["contaminated"]
        for r in decontaminate_ngrams(corpus, bench, n=4).collect()
    }
    assert fwd == {1: True, 2: True, 3: False}
