"""Property-based tests (hypothesis) for operators with algebraic
invariants — the complement to the oracle tests, which only check the
corpus-shaped inputs (SURVEY.md §5)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=0, max_size=130
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(tokens=words, chunk_size=st.integers(3, 12), stride=st.integers(1, 12))
@pytest.mark.slow
def test_chunking_invariants(spark, tokens, chunk_size, stride):
    from name_match_ml_spark.functions.text import chunk_documents

    stride = min(stride, chunk_size)
    docs = spark.createDataFrame([(1, " ".join(tokens))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(
            docs, chunk_size=chunk_size, stride=stride
        ).collect(),
        key=lambda r: r.chunk_id,
    )
    n = len(tokens)
    assert rows, "every doc yields at least one chunk (possibly empty)"
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    rebuilt = [None] * n
    for r in rows:
        ck = r.chunk_text.split(" ") if r.chunk_text else []
        assert r.n_tokens == len(ck) <= chunk_size
        start = r.chunk_id * stride
        # chunk i holds tokens[start : start+chunk_size]
        assert ck == tokens[start : start + chunk_size]
        for j, t in enumerate(ck):
            rebuilt[start + j] = t
    # coverage: every token appears in >= 1 chunk at its own position
    assert rebuilt == tokens
    # all chunks except the last are full
    for r in rows[:-1]:
        assert r.n_tokens == chunk_size


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slow
def test_connected_components_vs_union_find(spark, edges):
    from name_match_ml_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == _uf_components(edges)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
@pytest.mark.slow
def test_two_phase_components_vs_union_find(spark, edges):
    """Large-star/small-star resolves to the identical unique fixpoint."""
    from name_match_ml_spark.operators import graph

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.id: r.cluster_id
        for r in graph.connected_components(pairs, algorithm="star").collect()
    }
    assert got == _uf_components(edges)


@pytest.mark.slow
def test_long_chain_converges_in_log_rounds(spark):
    """A diameter-2000 path graph — the adversarial case for min-label
    propagation (needs 2000 rounds) — must resolve in O(log n) rounds via
    the auto label→star fallback and match the union-find oracle
    (VERDICT r2 next-round #3)."""
    from name_match_ml_spark.operators import graph

    n = 2001
    edges = [(i, i + 1) for i in range(n - 1)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.id: r.cluster_id
        for r in graph.connected_components(pairs, max_iter=40).collect()
    }
    assert got == {i: 0 for i in range(n)}
    # 6 label rounds (auto's budget) + ~log2(2000) star rounds; 30 ≪ 2000
    assert graph.last_rounds <= 30, graph.last_rounds


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=20),
        min_size=1,
        max_size=15,
    ),
    budget=st.integers(2, 30),
)
def test_packing_invariants(spark, texts, budget):
    """Every doc assigned exactly once; packs never exceed the budget
    except as singletons; greedy can't be improved by merging adjacent
    packs."""
    from name_match_ml_spark.operators.packing import pack_documents

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = pack_documents(docs, budget=budget, n_buckets=3).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(texts)))
    packs: dict[tuple, list] = {}
    for r in rows:
        packs.setdefault((r.bucket, r.pack_seq), []).append(r)
    for members in packs.values():
        total = sum(r.n_tokens for r in members)
        assert total <= budget or len(members) == 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rate=st.floats(0.0, 1.0), seed=st.sampled_from(["a", "b", "c"]))
def test_mixture_sample_monotone_in_rate(spark, rate, seed):
    """Raising the rate can only ADD documents (nested samples): the
    decision is hash < threshold, so samples at r1 <= r2 are subsets."""
    from name_match_ml_spark.operators.cleaning import mixture_sample

    docs = spark.createDataFrame([(i, "x") for i in range(400)], ["doc_id", "lang"])
    lo = {r.doc_id for r in mixture_sample(docs, {"x": rate / 2}, seed=seed).collect()}
    hi = {r.doc_id for r in mixture_sample(docs, {"x": rate}, seed=seed).collect()}
    assert lo <= hi
    full = {r.doc_id for r in mixture_sample(docs, {"x": 1.0}, seed=seed).collect()}
    assert full == set(range(400))


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=5, max_size=15),
        min_size=2,
        max_size=8,
    )
)
def test_decontaminate_self_is_total(spark, texts):
    """Decontaminating a corpus against ITSELF flags every doc with at
    least one n-gram (its grams trivially overlap), and docs shorter
    than n are never flagged."""
    from name_match_ml_spark.operators.cleaning import decontaminate_ngrams

    n = 3
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in decontaminate_ngrams(docs, docs, n=n).collect()}
    for i, t in enumerate(texts):
        if len(t) >= n:
            assert out[i].contaminated, (i, t)
        else:
            assert not out[i].contaminated


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    ),
    span_words=st.integers(2, 8),
)
@pytest.mark.slow
def test_span_dedup_invariants(spark, texts, span_words):
    """Global span dedup: kept spans across the corpus are exactly the
    DISTINCT spans (one winner each), totals match per-doc span counts,
    and rebuilt text is a subsequence concatenation of kept spans."""
    from name_match_ml_spark.operators.cleaning import span_dedup

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in span_dedup(docs, span_words=span_words).collect()}
    spans_by_doc = {}
    for i, t in enumerate(texts):
        spans_by_doc[i] = [
            " ".join(t[j : j + span_words]) for j in range(0, len(t), span_words)
        ]
    all_spans = [s for ss in spans_by_doc.values() for s in ss]
    assert sum(r.n_kept for r in out.values()) == len(set(all_spans))
    for i in range(len(texts)):
        assert out[i].n_spans == len(spans_by_doc[i])
        kept_text = out[i].text.split(" ") if out[i].text else []
        # rebuilt text is the in-order concat of a subset of the doc's spans
        doc_span_words = [s.split(" ") for s in spans_by_doc[i]]
        k = 0
        for sw in doc_span_words:
            if kept_text[k : k + len(sw)] == sw:
                k += len(sw)
        assert k == len(kept_text), (i, out[i].text)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    run_len=st.integers(5, 40),
    w=st.integers(2, 6),
    pad_a=st.integers(0, 6),
    pad_b=st.integers(0, 6),
)
@pytest.mark.slow
def test_winnow_substring_detection_and_bound(spark, run_len, w, pad_a, pad_b):
    """Winnowed substring detection: any shared run of >= seed_n + w - 1
    words is detected, and the reported length is a lower bound within
    2(w-1) of the truth."""
    from name_match_ml_spark.operators.dedup import shared_substring_pairs

    seed_n = 5
    run = " ".join(f"r{i}" for i in range(run_len))
    a = " ".join(f"a{i}" for i in range(pad_a)) + (" " if pad_a else "") + run
    b = run + ("" if not pad_b else " " + " ".join(f"b{i}" for i in range(pad_b)))
    docs = spark.createDataFrame([(0, a), (1, b)], ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.max_shared_words
        for r in shared_substring_pairs(
            docs, seed_n=seed_n, min_words=seed_n, winnow_window=w
        ).collect()
    }
    if run_len >= seed_n + w - 1:
        assert (0, 1) in got
        assert run_len - 2 * (w - 1) <= got[(0, 1)] <= run_len


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=2, max_size=32
    )
)
def test_quantize_roundtrip_error_bound(spark, vec):
    """int8 quantization reconstructs within scale/254 per component
    (half a code step), and codes stay in [-127, 127]."""
    from name_match_ml_spark.operators.simsearch import quantize_embeddings

    df = spark.createDataFrame([(0, vec)], ["vec_id", "embedding"])
    r = quantize_embeddings(df).collect()[0]
    assert all(-127 <= q <= 127 for q in r.q)
    for x, q in zip(vec, r.q):
        assert abs(x - q * r.scale / 127.0) <= r.scale / 254.0 + 1e-9


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(k=st.integers(1, 50), seed=st.sampled_from(["s1", "s2"]))
@pytest.mark.slow
def test_weighted_sample_nested_in_k(spark, k, seed):
    """Top-k samples nest: the k-sample is a prefix of the (k+m)-sample
    under the same seed (priorities are fixed per doc)."""
    from name_match_ml_spark.operators.cleaning import weighted_sample

    docs = spark.createDataFrame(
        [(i, (i % 9) + 1) for i in range(120)], ["doc_id", "w"]
    )
    small = {r.doc_id for r in weighted_sample(docs, k, weight_col="w", seed=seed).collect()}
    big = {r.doc_id for r in weighted_sample(docs, k + 20, weight_col="w", seed=seed).collect()}
    assert len(small) == k and small <= big
